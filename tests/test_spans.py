from racket_linkeddata_spark.operators.spans import (
    duplicate_spans, span_dedup)

BOILER = "all rights reserved contact us at example dot com for details"


def _corpus(spark):
    rows = [
        (1, "unique alpha text one " + BOILER + " tail one"),
        (2, "different beta words " + BOILER + " other tail"),
        (3, "totally unrelated content with no duplication at all here"),
        (4, ""),
        (5, None),
        (6, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_boilerplate_cut_unique_preserved(spark):
    got = {r["doc_id"]: r for r in span_dedup(_corpus(spark), L=5).collect()}
    assert got[1]["text_dedup"] == "unique alpha text one tail one"
    assert got[2]["text_dedup"] == "different beta words other tail"
    assert got[1]["n_dropped_tokens"] == len(BOILER.split(" ")) == 11
    # untouched docs byte-preserved, NULL -> ''
    assert got[3]["text_dedup"].startswith("totally unrelated")
    assert got[3]["n_dropped_tokens"] == 0
    assert got[4]["text_dedup"] == "" and got[5]["text_dedup"] == ""
    assert got[6]["text_dedup"] == "short doc"  # shorter than L: no windows


def test_spans_are_maximal_merged_intervals(spark):
    spans = duplicate_spans(_corpus(spark), L=5).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # one maximal span per planted doc: 11 tokens -> 7 windows of 5
    for d in (1, 2):
        assert len(by_doc[d]) == 1
        s = by_doc[d][0]
        assert s["span_end"] - s["span_start"] == 11
        assert s["n_windows"] == 7
    assert set(by_doc) == {1, 2}


def test_min_repeat_bar(spark):
    # the boilerplate appears twice: min_repeat=3 must keep everything
    out = span_dedup(_corpus(spark), L=5, min_repeat=3).collect()
    assert all(r["n_dropped_tokens"] == 0 for r in out)


def test_whole_doc_duplicate_empties_text(spark):
    rows = [(i, "exact clone of this entire document body here")
            for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_dedup(d, L=4).collect()
    assert all(r["text_dedup"] == "" for r in out)
    assert all(r["n_dropped_tokens"] == r["n_tokens"] == 8 for r in out)


def test_double_spaces_byte_preserved(spark):
    # split/rejoin on literal space is lossless: empty tokens survive
    rows = [(1, "keep  me  intact " + BOILER),
            (2, "other prefix words " + BOILER)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dedup(d, L=5).collect()}
    assert got[1]["text_dedup"] == "keep  me  intact"


def test_two_separated_regions_two_spans(spark):
    shared_a = "first shared passage block alpha beta"
    shared_b = "second shared passage block gamma delta"
    rows = [(1, shared_a + " middle unique words here " + shared_b),
            (2, shared_a + " other middle entirely " + shared_b)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    spans = [r for r in duplicate_spans(d, L=6).collect()
             if r["doc_id"] == 1]
    assert len(spans) == 2
    got = {r["doc_id"]: r for r in span_dedup(d, L=6).collect()}
    assert got[1]["text_dedup"] == "middle unique words here"


def test_stats_out_and_dedup_consistency(spark):
    stats = {}
    out = span_dedup(_corpus(spark), L=5, stats_out=stats).collect()
    assert stats["hot_broadcast"] and stats["hot_probe"] > 0
    for r in out:
        assert r["n_dropped_tokens"] == \
            r["n_tokens"] - (len(r["text_dedup"].split(" "))
                             if r["text_dedup"] != "" else 0) \
            or r["text_dedup"] == ""


def test_span_dedup_validates_degenerate_params(spark):
    import pytest as _pytest
    d = _corpus(spark)
    with _pytest.raises(ValueError):
        span_dedup(d, L=0)
    with _pytest.raises(ValueError):
        span_dedup(d, L=5, min_repeat=1)  # would drop ALL text
    with _pytest.raises(ValueError):
        duplicate_spans(d, L=-1)


def test_span_dedup_input_spans_column_no_collision(spark):
    rows = [(1, "prefix " + BOILER, "x"), (2, "other " + BOILER, "y")]
    d = spark.createDataFrame(rows, "doc_id long, text string, spans string")
    out = span_dedup(d, L=5).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert all(r["n_dropped_tokens"] == 11 for r in out)
