"""URL canonicalization semantics (operators/urlnorm.py)."""

from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.urlnorm import (
    canonical_url,
    dedup_by_canonical_url,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url(F.col("url"))
                                   .alias("c")).collect()]


def test_case_port_fragment_tracking_and_order(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.ORG:443/Path/X?b=2&utm_source=tw&a=1#frag",
        "http://ex.org:80/p",
        "http://ex.org:8080/p",            # non-default port kept
        "https://ex.org",                  # empty path -> /
        "https://ex.org?z=1&y=2",          # query straight after host
        "https://ex.org/p?utm_campaign=x", # all-tracking query drops ?
        "https://user:pw@EX.org/p",        # userinfo kept, host lowered
        "https://ex.org/p?gclid=1&fbclid=2&keep=3",
    ])
    assert got == [
        "https://www.example.org/Path/X?a=1&b=2",
        "http://ex.org/p",
        "http://ex.org:8080/p",
        "https://ex.org/",
        "https://ex.org/?y=2&z=1",
        "https://ex.org/p",
        "https://user:pw@ex.org/p",
        "https://ex.org/p?keep=3",
    ]


def test_path_case_and_param_values_preserved(spark):
    # path stays case-sensitive; values (incl. '=' inside) untouched;
    # param sort is byte-wise ('2' < '='), not name-wise
    got = _canon(spark, ["https://e.org/CaseSensitive?q=A%3Db&q2==x"])
    assert got == ["https://e.org/CaseSensitive?q2==x&q=A%3Db"]


def test_ipv6_and_malformed_ports_never_merge_hosts(spark):
    """Review r04b: IPv6 literals keep their brackets (inner colons are
    not a port separator) and a non-numeric port is preserved — two
    different servers must never collapse to one canonical key."""
    got = _canon(spark, [
        "https://[2001:db8::1]/x",
        "https://[2001:db8::2]/x",
        "https://[2001:DB8::1]:443/x",   # default port still drops
        "https://[2001:db8::1]:8080/x",  # explicit port kept
        "https://ex.org:banana/p",       # junk port preserved verbatim
        "https://ex.org/p",
    ])
    assert got == [
        "https://[2001:db8::1]/x",
        "https://[2001:db8::2]/x",
        "https://[2001:db8::1]/x",
        "https://[2001:db8::1]:8080/x",
        "https://ex.org:banana/p",
        "https://ex.org/p",
    ]
    assert len(set(got)) == 5  # only the true duplicates merged


def test_dedup_collapses_variants(spark):
    pages = spark.createDataFrame(
        [("https://EX.org:443/a?b=1&a=2&utm_source=x#f",),
         ("https://ex.org/a?a=2&b=1",),
         ("https://ex.org/other",)], "url string")
    rows = {r.canon_url: (r.keep_url, r.n_variants)
            for r in dedup_by_canonical_url(pages).collect()}
    assert rows["https://ex.org/a?a=2&b=1"] == (
        "https://EX.org:443/a?b=1&a=2&utm_source=x#f", 2)
    assert rows["https://ex.org/other"][1] == 1


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for a diverse corpus —
    a non-idempotent canonicalizer would rewrite keys every time a
    store is re-processed."""
    urls = [
        "HTTPS://WWW.Example.ORG:443/Path/X?b=2&utm_source=tw&a=1#frag",
        "http://ex.org:80/p", "http://ex.org:8080/p", "https://ex.org",
        "https://ex.org?z=1&y=2", "https://ex.org/p?utm_campaign=x",
        "https://user:pw@EX.org/p", "https://[2001:db8::1]:8080/x",
        "https://[2001:DB8::1]:443/x", "https://ex.org:banana/p",
        "https://e.org/CaseSensitive?q=A%3Db&q2==x",
        "https://ex.org/a/../b?x=1&x=1&x=0#y",
        "ftp://Mixed.Host/File", "https://ex.org/?&&",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert twice == once


def test_all_column_algebra_no_python(spark):
    pages = spark.createDataFrame([("https://e/x",)], "url string")
    plan = (dedup_by_canonical_url(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "Arrow" not in plan
