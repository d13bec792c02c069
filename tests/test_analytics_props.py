"""Property-based invariants (hypothesis) for the round-6 analytics
operators — randomized inputs cross-checked against the pure-Python
replicas. Few examples (each is a Spark job), deadline off for the
co-tenant host (the test_curation_props conventions)."""

import hashlib
from collections import Counter, defaultdict

from hypothesis import given, settings, strategies as st

from racket_linkeddata_spark.operators.pagerank import (
    pagerank, textrank_scores)
from racket_linkeddata_spark.operators.sketch import hll_registers
from racket_linkeddata_spark.operators.tfidf import tfidf_topk

_SETTINGS = dict(max_examples=8, deadline=None)

_NODES = list("abcdef")
edges_strategy = st.lists(
    st.tuples(st.sampled_from(_NODES), st.sampled_from(_NODES),
              st.integers(min_value=1, max_value=5)),
    min_size=1, max_size=15)

words = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
    min_size=0, max_size=10)


def _pr_replica(edges, iters, d=85, scale=1_000_000):
    outw = defaultdict(int)
    for s, _, w in edges:
        outw[s] += w
    nodes = {s for s, _, _ in edges} | {t for _, t, _ in edges}
    rank = {n: scale for n in nodes}
    base = ((100 - d) * scale) // 100
    for _ in range(iters):
        mass = defaultdict(int)
        for s, t, w in edges:
            mass[t] += (rank[s] * w) // outw[s]
        rank = {n: base + (d * mass[n]) // 100 for n in nodes}
    return rank


@settings(**_SETTINGS)
@given(edges_strategy, st.integers(min_value=1, max_value=3))
def test_pagerank_matches_replica(spark, edges, iters):
    df = spark.createDataFrame(edges, "src string, dst string, w int")
    got = {r.node: r.rank for r in
           pagerank(df, iterations=iters, weight_col="w").collect()}
    assert got == _pr_replica(edges, iters)
    # conservation bound: total emitted mass never exceeds base + d *
    # (total previous mass) — every rank is positive and bounded
    assert all(v >= ((100 - 85) * 1_000_000) // 100 for v in got.values())


@settings(**_SETTINGS)
@given(st.lists(words, min_size=1, max_size=8))
def test_textrank_matches_replica(spark, docs):
    d = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)],
        "doc_id long, text string")
    got = {r.term: r.rank for r in
           textrank_scores(d, iterations=2).collect()}
    directed = Counter()
    for w in docs:
        for x, y in zip(w, w[1:]):
            if x != y:
                directed[(x, y)] += 1
    edges = Counter()
    for (x, y), n in directed.items():
        edges[(x, y)] += n
        edges[(y, x)] += n
    assert got == _pr_replica(
        [(s, t, w) for (s, t), w in edges.items()], 2)


@settings(**_SETTINGS)
@given(st.lists(words, min_size=1, max_size=8),
       st.integers(min_value=1, max_value=4))
def test_tfidf_topk_matches_replica(spark, docs, k):
    import math
    d = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)],
        "doc_id long, text string")
    got = sorted((r.doc_id, r.term, r.tf, r.score, r.rank)
                 for r in tfidf_topk(d, k).collect())
    n_docs = len(docs)
    df_ = Counter()
    for w in docs:
        df_.update(set(w))
    exp = []
    for i, w in enumerate(docs):
        tf = Counter(w)
        scored = sorted(
            ((t, c, c * (int(math.log2(n_docs))
                         - int(math.log2(df_[t]))))
             for t, c in tf.items()),
            key=lambda r: (-r[2], r[0]))
        exp += [(i, t, c, s, r + 1)
                for r, (t, c, s) in enumerate(scored[:k])]
    assert got == sorted(exp)


@settings(**_SETTINGS)
@given(st.lists(st.text(min_size=0, max_size=6), min_size=0,
                max_size=40),
       st.sampled_from([4, 6, 8]))
def test_hll_registers_match_replica(spark, vals, p):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r.bucket: r.register
           for r in hll_registers(df, "v", p=p).collect()}
    w = 32 - p
    exp = {}
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
        b, suf = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if suf == 0 else w - (suf.bit_length() - 1)
        exp[b] = max(exp.get(b, 0), rho)
    assert got == exp
