"""Integer-scaled PageRank + TextRank (operators/pagerank.py):
hand-computable graph, pure-Python replica parity (weighted and
unweighted, several iteration counts), co-occurrence edge symmetry,
degenerate docs, and validation."""

from collections import Counter, defaultdict

import pytest

from racket_linkeddata_spark.operators.pagerank import (
    pagerank,
    textrank_scores,
    token_cooccurrence_edges,
)

EDGES = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("a", "c", 3)]


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


def _cooc_replica(texts):
    directed = Counter()
    for t in texts:
        toks = (t or "").lower().split()
        for x, y in zip(toks, toks[1:]):
            if x != y:
                directed[(x, y)] += 1
    edges = Counter()
    for (x, y), n in directed.items():
        edges[(x, y)] += n
        edges[(y, x)] += n
    return dict(edges)


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, w int")


def test_weighted_matches_replica(spark, edges_df):
    for iters in (1, 2, 5):
        got = {r.node: r.rank for r in
               pagerank(edges_df, iterations=iters,
                        weight_col="w").collect()}
        assert got == _pr_replica(EDGES, iters), iters


def test_unit_weights(spark, edges_df):
    got = {r.node: r.rank for r in
           pagerank(edges_df, iterations=3).collect()}
    unit = [(s, t, 1) for s, t, _ in EDGES]
    assert got == _pr_replica(unit, 3)


def test_rank_one_iteration_by_hand(spark, edges_df):
    """scale 1000, d 85: outw(a)=4, contribs a->b 250, a->c 750,
    b->c 1000, c->a 1000; rank = 150 + 85%*mass."""
    got = {r.node: r.rank for r in
           pagerank(edges_df, iterations=1, scale=1000,
                    weight_col="w").collect()}
    assert got == {"a": 150 + 850, "b": 150 + (85 * 250) // 100,
                   "c": 150 + (85 * 1750) // 100}


def test_dangling_and_no_inlinks(spark):
    # b is dangling (mass leaks); a has no in-links (rank = base)
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r.rank for r in
           pagerank(e, iterations=2, scale=1000).collect()}
    assert got["a"] == 150
    # round 1: b = 150 + 850; round 2: b = 150 + (85*150)//100
    assert got["b"] == 150 + (85 * 150) // 100


TEXTS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat cat cat"),     # self-loops only -> no edges
    (4, None),
    (5, ""),
    (6, "solo"),            # single token -> no edges
]


def test_cooccurrence_edges(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {(r.src, r.dst): r.w for r in
           token_cooccurrence_edges(docs).collect()}
    assert got == _cooc_replica([t for _, t in TEXTS])
    # undirected: weight matrix is symmetric
    assert all(got[(b, a)] == w for (a, b), w in got.items())
    assert not any("solo" in k or "cat" == k[0] == k[1] for k in got)


def test_textrank_matches_replica(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {r.term: r.rank for r in
           textrank_scores(docs, iterations=4).collect()}
    edges = [(s, t, w) for (s, t), w in
             _cooc_replica([t for _, t in TEXTS]).items()]
    assert got == _pr_replica(edges, 4)
    # 'the' is the hub of doc 1 and 2 -> highest salience
    assert max(got, key=got.get) == "the"


def test_validation(spark, edges_df):
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges_df, iterations=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(edges_df, damping_pct=101)
    with pytest.raises(ValueError, match="scale"):
        pagerank(edges_df, scale=0)


def test_fractional_weights_rejected(spark):
    """A double weight column would truncate to 0 under the bigint
    cast and silently zero contributions — rejected at plan time;
    non-positive/NULL weights fail the job loudly (review r06e)."""
    frac = spark.createDataFrame([("a", "b", 0.4)],
                                 "src string, dst string, w double")
    with pytest.raises(ValueError, match="integral column"):
        pagerank(frac, weight_col="w")
    with pytest.raises(ValueError, match="not found"):
        pagerank(frac, weight_col="no_such_col")

    for bad_w in (0, None):
        bad = spark.createDataFrame([("a", "b", bad_w)],
                                    "src string, dst string, w int")
        with pytest.raises(Exception, match="weights must be >= 1"):
            pagerank(bad, iterations=1, weight_col="w").collect()


def test_null_endpoints_rejected(spark):
    """An edge with a NULL endpoint would silently vanish in the
    out-weight inner join — and with it any node reachable only
    through it. Fail loudly instead (review r06e)."""
    for rows in ([(None, "b")], [("a", None)]):
        bad = spark.createDataFrame(rows, "src string, dst string")
        with pytest.raises(Exception, match="NULL src/dst"):
            pagerank(bad, iterations=1).collect()


def test_weight_col_case_insensitive_and_missing(spark):
    """dtype validation resolves the column like Spark does —
    an uppercase ref to a lowercase integral column works; a missing
    column is a clean plan-time ValueError (review r06f)."""
    e = spark.createDataFrame(EDGES, "src string, dst string, w int")
    got = {r.node: r.rank for r in
           pagerank(e, iterations=1, weight_col="W").collect()}
    assert got == _pr_replica(EDGES, 1)
    with pytest.raises(ValueError, match="not found"):
        pagerank(e, weight_col="nope")
