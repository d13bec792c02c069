"""Paragraph-level exact dedup (Lee et al. passage dedup): planted
cross-document boilerplate must disappear while unique text is
byte-preserved."""

from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.paragraphs import (
    paragraph_dedup, passage_counts)

BOILER = "Subscribe to our newsletter for updates"


def _corpus(spark):
    rows = []
    # 12 docs: unique first line, shared boilerplate second line —
    # normalization variants (case, doubled spaces) must count together
    for i in range(12):
        b = BOILER if i % 2 == 0 else BOILER.upper().replace(" ", "  ")
        rows.append((i, f"unique   content {i} with  odd spacing\n{b}"))
    # a passage repeated only twice (below K=5): must survive
    rows.append((100, "rare pair passage\nsolo line a"))
    rows.append((101, "rare pair passage\nsolo line b"))
    # fully-boilerplate doc: keeps its row, text_dedup = ''
    rows.append((200, BOILER))
    # blank lines are formatting, never counted as boilerplate
    rows.append((300, "top line 300\n\nbottom line 300"))
    rows.append((301, "top line 301\n\nbottom line 301"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_dropped_unique_bytes_preserved(spark):
    out = {r["doc_id"]: r for r in
           paragraph_dedup(_corpus(spark), min_repeat=5).collect()}
    for i in range(12):
        assert out[i]["text_dedup"] == \
            f"unique   content {i} with  odd spacing", i  # bytes intact
        assert out[i]["n_paragraphs"] == 2
        assert out[i]["n_dropped"] == 1
    # below-threshold repeats survive
    assert out[100]["text_dedup"] == "rare pair passage\nsolo line a"
    assert out[100]["n_dropped"] == 0
    # fully-boilerplate doc keeps its row
    assert out[200]["text_dedup"] == "" and out[200]["n_dropped"] == 1
    # blank lines survive even though '' repeats corpus-wide
    assert out[300]["text_dedup"] == "top line 300\n\nbottom line 300"
    assert out[300]["n_dropped"] == 0


def test_passage_counts_observability(spark):
    pc = {r["passage"]: r for r in
          passage_counts(_corpus(spark), min_repeat=2).collect()}
    # lexicographic-min spelling of the normalized boilerplate group
    boiler = [r for r in pc.values() if r["n_occurrences"] == 13]
    assert len(boiler) == 1               # 12 docs + doc 200
    assert boiler[0]["n_docs"] == 13
    assert pc["rare pair passage"]["n_occurrences"] == 2
    # unique lines never appear at min_repeat=2
    assert all(r["n_occurrences"] >= 2 for r in pc.values())


def test_shuffle_anti_join_path_matches_broadcast(spark):
    """Force the non-broadcast branch (threshold 0) — results identical;
    stats_out records which path ran."""
    docs = _corpus(spark)
    stats_b, stats_s = {}, {}
    a = paragraph_dedup(docs, min_repeat=5, stats_out=stats_b).collect()
    b = paragraph_dedup(docs, min_repeat=5, broadcast_threshold=0,
                        stats_out=stats_s).collect()
    assert stats_b["hot_broadcast"] and not stats_s["hot_broadcast"]
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_idempotent(spark):
    """Dedup of a deduped corpus is the identity: survivors each occur
    fewer than min_repeat times by construction."""
    once = paragraph_dedup(_corpus(spark), min_repeat=5).select(
        "doc_id", F.col("text_dedup").alias("text"))
    twice = paragraph_dedup(once, min_repeat=5).collect()
    for r in twice:
        assert r["n_dropped"] == 0, r


def test_null_text_behaves_as_empty(spark):
    """Review r06a: NULL text is '' (the repo-wide rule) — the doc
    keeps its row as 1 blank paragraph instead of silently vanishing
    from posexplode / getting NULL counts."""
    d = spark.createDataFrame(
        [(0, None), (1, "real line\nreal line")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           paragraph_dedup(d, min_repeat=5).collect()}
    assert out[0]["text_dedup"] == ""
    assert out[0]["n_paragraphs"] == 1 and out[0]["n_dropped"] == 0
    # and passage_counts sees the doc's content too
    assert passage_counts(d, min_repeat=2).collect()[0]["n_docs"] == 1


def test_sep_is_literal_not_regex(spark):
    """Review r06a: sep must split as a LITERAL — '||' used to be a
    Java regex matching the empty string, exploding every character."""
    d = spark.createDataFrame(
        [(0, "alpha||beta||alpha"), (1, "alpha||gamma")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           paragraph_dedup(d, min_repeat=3, sep="||").collect()}
    assert out[0]["n_paragraphs"] == 3
    assert out[0]["text_dedup"] == "beta"     # 'alpha' x3 dropped
    assert out[1]["text_dedup"] == "gamma"
    import pytest
    with pytest.raises(ValueError, match=r"\\E"):
        paragraph_dedup(d, sep="a\\Eb").collect()
