"""Property-based invariants (hypothesis) for the curation/packing
operators — randomized corpora, few examples (each example is a Spark
job), deadline off for the co-tenant host."""

from hypothesis import given, settings, strategies as st

from racket_linkeddata_spark.operators.mixture import (
    mixture_sample, mixture_stats)
from racket_linkeddata_spark.operators.packing import (
    pack_greedy, pack_offsets)
from racket_linkeddata_spark.operators.spans import span_dedup

# the spark fixture is session-scoped, so no fixture health check
# suppression is needed
_SETTINGS = dict(max_examples=8, deadline=None)

words = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta eta theta iota "
                    "kappa".split()),
    min_size=0, max_size=12)


@settings(**_SETTINGS)
@given(st.lists(words, min_size=1, max_size=12))
def test_span_dedup_token_conservation(spark, docs):
    d = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)],
        "doc_id long, text string")
    for r in span_dedup(d, L=3, min_repeat=2).collect():
        n, dropped = r["n_tokens"], r["n_dropped_tokens"]
        assert 0 <= dropped <= n
        if dropped == 0:
            # untouched docs are byte-identical (incl. '' == one cell)
            assert r["text_dedup"] == " ".join(docs[r["doc_id"]])
        elif dropped == n:
            assert r["text_dedup"] == ""
        else:
            # partial drop: surviving cell count balances exactly
            assert len(r["text_dedup"].split(" ")) == n - dropped


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=40),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=50))
def test_pack_offsets_stream_is_partition(spark, toks, budget):
    d = spark.createDataFrame(list(enumerate(toks)),
                              "doc_id long, n_tokens long")
    rows = pack_offsets(d, budget, 3).collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["pos"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for seq in by_shard.values():
        off = 0
        for r in seq:
            assert (r["start_off"], r["end_off"]) == \
                (off, off + r["n_tokens"])
            assert r["first_seq"] == r["start_off"] // budget
            assert r["last_seq"] == \
                max(r["end_off"] - 1, r["start_off"]) // budget
            off = r["end_off"]
        assert off == sum(r["n_tokens"] for r in seq)


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=40),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=50))
def test_pack_greedy_matches_python_fold(spark, toks, budget):
    d = spark.createDataFrame(list(enumerate(toks)),
                              "doc_id long, n_tokens long")
    rows = pack_greedy(d, budget, 2).collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["pos"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for seq_rows in by_shard.values():
        seq, fill = 0, 0
        for i, r in enumerate(seq_rows):
            if i > 0 and fill + r["n_tokens"] > budget:
                seq, fill = seq + 1, 0
            assert r["seq_id"] == seq
            fill += r["n_tokens"]


@settings(**_SETTINGS)
@given(st.dictionaries(st.sampled_from(["a", "b", "c"]),
                       st.floats(min_value=0, max_value=1,
                                 allow_nan=False), max_size=3),
       st.floats(min_value=0, max_value=1, allow_nan=False))
def test_mixture_stats_agree_with_sample(spark, weights, default):
    rows = [(i, ["a", "b", "c", None][i % 4]) for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    sampled = {}
    for r in mixture_sample(d, weights, default_weight=default).collect():
        sampled[r["source"]] = sampled.get(r["source"], 0) + 1
    stats = {r["source"]: r for r in
             mixture_stats(d, weights, default_weight=default).collect()}
    for src, s in stats.items():
        assert s["n_sampled"] == sampled.get(src, 0)
