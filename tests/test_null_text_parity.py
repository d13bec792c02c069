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


def test_bigram_surprisal_null_text_parity(spark, corpus_dir):
    got = _compare(spark, corpus_dir, "text_bigram_surprisal")
    cols = _compare.cols
    rows = {dict(zip(cols, r))["doc_id"]: dict(zip(cols, r))
            for r in got}
    for d in (2, 3):   # NULL == '': zero bigrams, zero scores
        assert rows[d]["n_bigrams"] == 0
        assert rows[d]["avg_surprisal_x1000"] == 0


def test_split_leak_check_null_text_parity(spark, corpus_dir):
    _compare(spark, corpus_dir, "split_leak_check")


@pytest.fixture(scope="module")
def hostile_ws_dir(spark, tmp_path_factory):
    """Documents containing VERTICAL TAB (\\x0b): Java's \\s splits on
    it, RE2's (DuckDB's) does NOT — the r06i divergence the shared
    explicit WS_CLASS closes. Every whitespace-tokenizing query must
    agree on these."""
    d = str(tmp_path_factory.mktemp("hostilews"))
    rows = [(1, "plain words here"),
            (2, "a\x0bb c"),            # VT between tokens
            (3, "x\x0b\x0b\ty\fz"),     # VT runs + tab + formfeed
            (4, "\x0b")]                # VT-only text
    (spark.createDataFrame(rows, "doc_id long, text string")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{d}/documents.parquet"))
    return d


def test_vertical_tab_tokenizer_parity(spark, hostile_ws_dir):
    for name in ("text_lm_surprisal", "text_bigram_surprisal",
                 "text_tfidf", "text_textrank",
                 "sketch_hll_registers", "text_quality_signals"):
        got = _compare(spark, hostile_ws_dir, name)
    # and the engine actually SPLITS on VT (not just agreeing on
    # not-splitting): doc 2 has 3 tokens -> 2 bigrams
    got = _compare(spark, hostile_ws_dir, "text_bigram_surprisal")
    cols = _compare.cols
    rows = {dict(zip(cols, r))["doc_id"]: dict(zip(cols, r))
            for r in got}
    assert rows[2]["n_bigrams"] == 2
    assert rows[4]["n_bigrams"] == 0    # VT-only == empty
