"""NULL-text semantics are PINNED between engine and oracle (round-5
ADVICE): the sf corpora contain no NULL text, so the driver gate cannot
catch a divergence — this test plants NULL / empty / normal texts and
runs both sides over them.

Contract: engine treats NULL text as '' (repetition emits one empty
token -> n_tokens=1; BPE prices 0 tokens); the oracles COALESCE to the
same."""

import duckdb
import pytest

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nulltext"))
    rows = [(1, "the cat sat on the mat"),
            (2, None),
            (3, ""),
            (4, "th the theth  double  space")]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{d}/documents.parquet"))
    return d


def _compare(spark, corpus_dir, name):
    df = entry_mod.queries()[name](spark, corpus_dir)
    cols = sorted(df.columns)
    _compare.cols = cols  # sorted column order, for callers' indexing
    got = sorted(tuple(r[c] for c in cols) for r in df.collect())

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{corpus_dir}/documents.parquet/*.parquet'")
    res = con.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    want = sorted(tuple(dict(zip(ocols, r))[c] for c in cols)
                  for r in res.fetchall())
    assert got == want, f"{name}: NULL-text divergence {got} vs {want}"
    return got


def test_repetition_null_text_parity(spark, corpus_dir):
    got = _compare(spark, corpus_dir, "text_repetition")
    cols = _compare.cols
    rows = {dict(zip(cols, r))["doc_id"]: dict(zip(cols, r)) for r in got}
    # the NULL doc is PRESENT on both sides (n_tokens=1, one '' token)
    del rows[2]["doc_id"], rows[3]["doc_id"]
    assert rows[2] == rows[3]            # NULL == '' semantics
    assert rows[2]["n_tokens"] == 1      # one empty token, not dropped


def test_bpe_null_text_parity(spark, corpus_dir):
    got = _compare(spark, corpus_dir, "text_tokens_bpe_real")
    by_id = {r[0]: r[1] for r in got}
    assert by_id[2] == 0 and by_id[3] == 0


def test_lm_surprisal_null_text_parity(spark, corpus_dir):
    got = _compare(spark, corpus_dir, "text_lm_surprisal")
    cols = _compare.cols
    rows = {dict(zip(cols, r))["doc_id"]: dict(zip(cols, r)) for r in got}
    # NULL == '' semantics: zero tokens, zero scores, row present
    for d in (2, 3):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["avg_surprisal_x1000"] == 0


def test_packing_null_text_parity(spark, corpus_dir):
    for name in ("train_pack_offsets", "train_pack_stats",
                 "train_pack_greedy"):
        _compare(spark, corpus_dir, name)


def test_spans_null_text_parity(spark, corpus_dir):
    for name in ("dedup_spans", "dedup_span_stats"):
        _compare(spark, corpus_dir, name)


def test_blocklist_null_text_parity(spark, corpus_dir):
    """NULL text tokenizes to zero tokens on BOTH sides: never blocked
    (fraction of nothing), zero counts — the doc survives a filter."""
    got = _compare(spark, corpus_dir, "text_blocklist")
    cols = _compare.cols
    rows = {dict(zip(cols, r))["doc_id"]: dict(zip(cols, r)) for r in got}
    assert rows[2]["n_tokens"] == 0 and rows[2]["blocked"] is False
    assert rows[3]["n_tokens"] == 0 and rows[3]["blocked"] is False
