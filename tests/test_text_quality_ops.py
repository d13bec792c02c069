"""Repetition quality signals + PII redaction (operators/textstats.py,
round-5 additions) on crafted inputs — the driver oracle covers the
real corpus, where PII shapes may never occur."""

from racket_linkeddata_spark.operators.textstats import (
    PII_PATTERNS,
    redact_pii,
    repetition_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_repetition_stats_counts(spark):
    rows = [
        "a a a b c",          # top 'a' x3 of 5; 3 distinct
        "x y z",              # no repetition
        "w w w w",            # fully repeated
        "",                   # one empty token
        "p  q",               # double space -> empty middle token
    ]
    got = {r.doc_id: r for r in repetition_stats(_df(spark, rows)).collect()}
    assert (got[0].n_tokens, got[0].top_token_count) == (5, 3)
    assert got[0].top_token_x1000 == 600
    assert got[0].dup_token_x1000 == 400  # 1 - 3/5
    assert (got[1].top_token_count, got[1].dup_token_x1000) == (1, 0)
    assert (got[2].n_tokens, got[2].top_token_count,
            got[2].top_token_x1000) == (4, 4, 1000)
    assert (got[3].n_tokens, got[3].top_token_count) == (1, 1)
    assert (got[4].n_tokens, got[4].top_token_count) == (3, 1)


def test_repetition_top_is_real_max_not_just_runs(spark):
    # most frequent token NOT adjacent in the original order: the
    # sorted-run trick must still find the global max count
    rows = ["b a b c b a b"]
    r = repetition_stats(_df(spark, rows)).collect()[0]
    assert r.top_token_count == 4  # 'b'


def test_redact_pii_shapes(spark):
    rows = [
        "contact me at jane.doe+x@example.co.uk for details",
        "server at 192.168.0.1 and backup at 10.0.0.255 ok",
        "call +1 555-123-4567 now",
        "nothing sensitive here at all",
        "mixed: a@b.io from 8.8.8.8 dial 0044 1234 5678",
    ]
    got = {r.doc_id: r for r in redact_pii(_df(spark, rows)).collect()}
    assert got[0].n_email == 1 and "[EMAIL]" in got[0].text_redacted
    assert "jane.doe" not in got[0].text_redacted
    assert got[1].n_ip == 2
    assert got[1].text_redacted.count("[IP]") == 2
    assert got[2].n_phone == 1 and "[PHONE]" in got[2].text_redacted
    assert "4567" not in got[2].text_redacted
    assert (got[3].n_email, got[3].n_ip, got[3].n_phone) == (0, 0, 0)
    assert got[3].text_redacted == rows[3]
    assert (got[4].n_email, got[4].n_ip, got[4].n_phone) == (1, 1, 1)


def test_redact_counts_match_python_re(spark):
    """Java-regex (Spark) and Python-re agree on the portable
    patterns — the dialect-portability claim, checked on hostile-ish
    strings."""
    import re

    rows = [
        "a@b.c x@y.zz a@@b.c @nope 1.2.3.4.5 999.999.999.999",
        "+491234567890 12-34 5678901234 end",
        "dots.everywhere@mail.example.travel 0.0.0.0",
    ]
    got = {r.doc_id: r for r in redact_pii(_df(spark, rows)).collect()}
    for i, t in enumerate(rows):
        for name, pat in PII_PATTERNS:
            assert got[i][f"n_{name}"] == len(re.findall(pat, t)), \
                (i, name, t)
