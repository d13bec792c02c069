"""DataFrame-lifted JSON-LD transforms: distributed result == driver-side
core result per document; error isolation; salted aggregation equivalence."""

import json

from pyspark.sql import functions as F

from racket_linkeddata_spark.core.expand import expand as core_expand
from racket_linkeddata_spark.core.to_rdf import to_rdf
from racket_linkeddata_spark.core.urdna2015 import canonical_nquads
from racket_linkeddata_spark.operators.jsonld_ops import (
    expand_documents,
    normalize_documents,
)
from racket_linkeddata_spark.operators.skew import domain_of, salted_agg
from racket_linkeddata_spark.sources.pages import _jsonld_doc, synth_page


def _docs_df(spark, n=40):
    rows = [(i, json.dumps(_jsonld_doc(i))) for i in range(n)]
    rows.append((10_001, "{not json"))
    rows.append((10_002, '{"@context": "https://missing.example/ctx", "a": 1}'))
    return spark.createDataFrame(rows, "doc_id long, doc string")


def test_expand_documents_matches_core(spark):
    df = _docs_df(spark)
    got = {r.doc_id: (r.out, r.error) for r in expand_documents(df).collect()}
    for i in range(40):
        want = json.dumps(core_expand(_jsonld_doc(i)), sort_keys=True)
        assert got[i] == (want, None)
    assert got[10_001][0] is None and got[10_001][1] is not None
    assert got[10_002][1] == "loading remote context failed"


def test_normalize_documents_matches_core(spark):
    df = _docs_df(spark, 25)
    got = {r.doc_id: r.out for r in normalize_documents(df).collect()
           if r.error is None and r.doc_id < 10_000}
    for i in range(25):
        assert got[i] == canonical_nquads(to_rdf(_jsonld_doc(i)))


def test_salted_agg_equivalent_to_groupby(spark):
    pages = spark.createDataFrame(
        [(synth_page(i)[0], i % 7) for i in range(3000)],
        "url string, v long")
    with_domain = pages.withColumn("domain", domain_of(F.col("url")))
    got = {(r.domain): (r.n, r.sum_v)
           for r in salted_agg(with_domain, ["domain"], sums=["v"],
                               salt_buckets=16).collect()}
    want = {r.domain: (r.n, r.sum_v)
            for r in with_domain.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v").alias("sum_v")).collect()}
    assert got == want
    # the mega-domain skew is real in the synth corpus
    top = max(v[0] for v in got.values())
    assert top >= 0.25 * 3000


def test_from_rdf_documents_matches_core(spark):
    from racket_linkeddata_spark.core.from_rdf import from_rdf
    from racket_linkeddata_spark.core.nquads import parse, serialize
    from racket_linkeddata_spark.operators.jsonld_ops import (
        from_rdf_documents)

    rows = []
    for i in range(20):
        nq = serialize(to_rdf(_jsonld_doc(i)))
        rows.append((i, nq))
    rows.append((10_001, "<bad nquads"))
    df = spark.createDataFrame(rows, "doc_id long, nquads string")
    got = {r.doc_id: (r.out, r.error)
           for r in from_rdf_documents(df).collect()}
    for i, nq in rows[:20]:
        want = json.dumps(from_rdf(parse(nq)), sort_keys=True)
        assert got[i] == (want, None)
    assert got[10_001][0] is None and got[10_001][1] is not None


def test_frame_documents_matches_core(spark):
    from racket_linkeddata_spark.core.frame import frame as core_frame
    from racket_linkeddata_spark.operators.jsonld_ops import frame_documents

    frame_doc = {"@context": {"@vocab": "https://example.org/v/"},
                 "@type": "Person"}
    df = _docs_df(spark, 15)
    got = {r.doc_id: (r.out, r.error)
           for r in frame_documents(df, frame=frame_doc).collect()}
    for i in range(15):
        want = json.dumps(core_frame(_jsonld_doc(i), frame_doc),
                          sort_keys=True)
        assert got[i] == (want, None)


def test_null_doc_and_param_rows_marked_not_fatal(spark):
    from racket_linkeddata_spark.operators.jsonld_ops import compact_documents

    rows = [(1, json.dumps(_jsonld_doc(1)), "{}"),
            (2, None, "{}"),
            (3, json.dumps(_jsonld_doc(3)), None)]
    df = spark.createDataFrame(rows, "doc_id long, doc string, ctx string")
    got = {r.doc_id: (r.out, r.error)
           for r in compact_documents(df, param_col="ctx").collect()}
    assert got[1][1] is None and got[1][0] is not None
    assert got[2] == (None, "null input row")
    assert got[3] == (None, "null input row")


def test_transform_programming_error_fails_fast(spark):
    """A bad param_kw injecting an unexpected kwarg is a programming
    error: it must fail the job (TypeError is NOT in the per-row catch),
    not silently degrade every row to an error string."""
    import pytest

    df = spark.createDataFrame(
        [(1, json.dumps(_jsonld_doc(1)), "{}")],
        "doc_id long, doc string, ctx string")
    bad = expand_documents(df, param_col="ctx", param_kw="no_such_kwarg")
    with pytest.raises(Exception, match="no_such_kwarg|TypeError"):
        bad.collect()


def test_sign_verify_documents_roundtrip(spark):
    from racket_linkeddata_spark.core.ld_sigs import generate_rsa_keypair
    from racket_linkeddata_spark.operators.jsonld_ops import (
        sign_documents, verify_documents)

    priv, pub = generate_rsa_keypair()
    rows = [(i, json.dumps({
        "@context": {"v": "https://example.org/v/"},
        "@id": f"https://example.org/d/{i}", "v:n": i})) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, doc string")
    signed = sign_documents(df, private_key_pem=priv,
                            created="2024-01-01T00:00:00Z")
    srows = signed.collect()
    assert all(r.error is None for r in srows)
    signed_df = spark.createDataFrame(
        [(r.doc_id, r.out) for r in srows], "doc_id long, doc string")
    verified = {r.doc_id: r.out
                for r in verify_documents(
                    signed_df, public_key_pem=pub).collect()}
    assert all(v == "true" for v in verified.values())
    # tamper one: flip a byte in the payload
    tampered = spark.createDataFrame(
        [(r.doc_id, r.out.replace('"v:n": 0', '"v:n": 999'))
         for r in srows], "doc_id long, doc string")
    bad = {r.doc_id: r.out
           for r in verify_documents(tampered, public_key_pem=pub).collect()}
    assert bad[0] == "false"
    assert all(v == "true" for k, v in bad.items() if k != 0)
