"""Product-quantization (PQ) ANN — the memory-side scale path.

IVF (similarity.ivf_topk) prunes WHICH vectors a query scans; PQ
shrinks WHAT is scanned: each vector is compressed to ``m`` small
codes (one per subspace), and query-to-item distance is approximated
by table lookups (ADC — asymmetric distance computation, Jegou et al.
2011).  At 100 TB the codes table is ~64x smaller than the float
corpus, so the ADC scan is bandwidth-, not compute-, bound; the two
compose (IVF-PQ) — prune cells first, ADC-scan the survivors.

Cross-engine exactness (the property every driver oracle here needs)
comes from doing ALL distance math in integers:

- vectors quantize as ``floor(x * scale)`` with a power-of-two
  ``scale`` — float32 -> float64 is exact, multiplying by 2^k is
  exact, floor is unambiguous, so Spark, numpy and DuckDB agree to
  the last bit;
- the codebook is DATA-DERIVED, not trained: per subspace, the
  quantized subvectors of the md5-ordered first ``k`` corpus ids
  (the same bounded-by-construction sample rule as
  similarity._ivf_centroids — ORDER BY md5(id) LIMIT k runs as a
  per-partition top-n, never a full sort, and the driver collect is
  exactly ``k`` rows regardless of corpus size).  A trained k-means
  codebook can be passed instead (``codebook=``) — same shape, the
  caller owns determinism (the ivf_pinned.py pattern);
- encode = integer argmin of squared L2 per subspace (ties to the
  lowest code id — numpy argmin's first-occurrence rule, mirrored by
  ``ORDER BY d, cid`` in SQL);
- ADC = integer partial-distance lookups summed per (query, item).

The reference engine has no ANN at all (no counterpart file); this
family is part of the LLM-training-data brief.

Plan shape (pinned in tests/test_plans.py):
- encode is ONE Arrow-batched pandas UDF stage (a B x k x dsub numpy
  broadcast per subspace — vectorized, no per-row Python);
- the query-side partial-distance table is Q*m*k rows of pure column
  algebra, broadcast to the exploded codes;
- scoring is equi-joins + one hash aggregate (map-side combinable
  LongSum) + a per-query top-k window.  No cross product anywhere.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# 2^10: float32 inputs in [-1, 1] quantize to ~3 significant decimal
# digits; power of two so x * scale is EXACT in binary floating point.
DEFAULT_SCALE = 1024


def _quantize_col(vec_col, scale: int):
    """array<float|double> -> array<bigint>: floor(x * scale).
    Exact and engine-agnostic for power-of-two scales (see module
    docstring)."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(scale))).cast("long"))


def _sample_codebook(embeddings: DataFrame, k: int, scale: int,
                     id_col: str, vec_col: str) -> np.ndarray:
    """The md5-ordered first-k corpus vectors, quantized, as a
    (k_actual, dim) int64 matrix in sample order (code id = position).
    Bounded driver collect: exactly min(k, N) rows BY CONSTRUCTION.
    The ''-salted _salted_sample IS the same ordering rule
    (concat(id, '') == id), so the two sampling faces cannot drift
    (review r06e)."""
    rows = _salted_sample(embeddings, k, "", id_col, vec_col)
    if not rows:
        raise ValueError("pq: empty corpus — cannot sample a codebook")
    return np.floor(
        np.asarray([v for _, v in rows], dtype=np.float64)
        * scale).astype(np.int64)


def _codebook_matrix(embeddings: DataFrame, m: int, k: int, scale: int,
                     codebook: Optional[DataFrame],
                     id_col: str, vec_col: str) -> np.ndarray:
    """(m, k_actual, dsub) int64 codeword tensor.  ``codebook`` rows,
    if supplied, are (code int, vec array<numeric>) — quantized with
    the same rule so caller-trained float centroids line up with the
    corpus quantization."""
    if codebook is not None:
        rows = (codebook
                .select(F.col("code").cast("long"),
                        F.col("vec").cast("array<double>"))
                .orderBy("code").collect())
        if not rows:
            raise ValueError("pq: empty external codebook")
        if [r[0] for r in rows] != list(range(len(rows))):
            raise ValueError(
                "pq: external codebook codes must be exactly 0..k-1 "
                f"(got {[r[0] for r in rows][:5]}...)")
        flat = np.floor(
            np.asarray([r[1] for r in rows], dtype=np.float64)
            * scale).astype(np.int64)
    else:
        flat = _sample_codebook(embeddings, k, scale, id_col, vec_col)
    dim = flat.shape[1]
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return flat.reshape(flat.shape[0], m, dsub).transpose(1, 0, 2).copy()


def _encode_udf(cb: np.ndarray, scale: int):
    """codes(vec) -> array<int>: per-subspace integer-L2 argmin against
    the broadcast codeword tensor.  One numpy broadcast per subspace
    per Arrow batch; np.argmin's first-occurrence rule IS the
    lowest-code tie-break the SQL replica uses."""
    n_sub, _, dsub = cb.shape

    @F.pandas_udf("array<int>")
    def codes(vecs: pd.Series) -> pd.Series:
        from .util import worker_runtime_tune
        worker_runtime_tune()
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        a = np.floor(np.asarray(vecs.tolist(), dtype=np.float64)
                     * scale).astype(np.int64)
        if a.shape[1] != n_sub * dsub:
            raise ValueError(
                f"pq: vector dim {a.shape[1]} != codebook dim "
                f"{n_sub * dsub}")
        sub = a.reshape(a.shape[0], n_sub, dsub)
        out = np.empty((a.shape[0], n_sub), dtype=np.int32)
        for mi in range(n_sub):
            d = sub[:, mi, None, :] - cb[mi][None, :, :]
            out[:, mi] = np.argmin((d * d).sum(axis=2), axis=1)
        return pd.Series(list(out))
    return codes


def _encode_df(embeddings: DataFrame, cb: np.ndarray, scale: int,
               id_col: str, vec_col: str) -> DataFrame:
    """(item_id, codes) from an already-built codeword tensor — shared
    by pq_encode and pq_topk so the bounded codebook sample runs ONE
    driver job, not one per caller."""
    from .util import ensure_parallelism
    corpus = ensure_parallelism(embeddings)
    return corpus.select(
        F.col(id_col).cast("long").alias("item_id"),
        _encode_udf(cb, scale)(
            F.col(vec_col).cast("array<double>")).alias("codes"))


def pq_encode(embeddings: DataFrame, *, m: int = 8, k: int = 16,
              scale: int = DEFAULT_SCALE,
              codebook: Optional[DataFrame] = None,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Compress each vector to ``m`` subspace codes.

    Returns (item_id long, codes array<int>) — the compressed corpus a
    100 TB deployment would persist next to (instead of) the float
    vectors.  ``m * ceil(log2 k)`` bits per vector: the default 8x16
    is 32 bits — a 64x reduction over 64 float32 dims."""
    cb = _codebook_matrix(embeddings, m, k, scale, codebook,
                          id_col, vec_col)
    return _encode_df(embeddings, cb, scale, id_col, vec_col)


def _checked_query(queries: DataFrame, dim: int, scale: int,
                   id_col: str, vec_col: str, what: str) -> DataFrame:
    """(query_id, qq) with a loud runtime dim + NULL-element guard.
    The corpus-side encode UDF validates dimensions, but the query
    side is pure column algebra — a short/NULL query vector, or a
    dim-correct one CONTAINING a NULL element (r06f), would slice to
    NULL partial distances that F.sum silently skips, yielding
    plausible-but-wrong rankings instead of an error."""
    sz = F.size(F.col(vec_col))
    has_null = F.exists(F.col(vec_col), lambda x: x.isNull())
    qq = _quantize_col(vec_col, scale)
    return queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.when((sz == F.lit(dim)) & ~has_null, qq)
        .otherwise(F.raise_error(F.concat(
            F.lit(f"{what}: query vector dim "),
            F.coalesce(sz.cast("string"), F.lit("NULL")),
            F.lit(f" != codebook dim {dim}, or NULL element present"))))
        .alias("qq"))


def _codebook_df(spark, cb: np.ndarray) -> DataFrame:
    """The (m, code, cvec) codeword tensor as a tiny DataFrame (m*k
    rows) for the query-side broadcast join."""
    rows = [(mi, ci, [int(x) for x in cb[mi, ci]])
            for mi in range(cb.shape[0]) for ci in range(cb.shape[1])]
    return spark.createDataFrame(
        rows, "m int, code int, cvec array<bigint>")


def pq_topk(embeddings: DataFrame, queries: DataFrame, topk: int = 5, *,
            m: int = 8, k: int = 16, scale: int = DEFAULT_SCALE,
            codebook: Optional[DataFrame] = None,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate L2 top-``topk`` per query via the PQ ADC scan.

    - corpus: pq_encode (one Arrow stage), codes exploded to
      (item_id, m, code) — the scan reads m ints per item, never the
      float vector;
    - queries: quantized + sliced in pure column algebra, partial
      squared-L2 to every codeword (Q*m*k rows, broadcast);
    - score: equi-join on (m, code) + one LongSum hash aggregate
      (map-side combinable), then a per-query top-k window with the
      (distance, item_id) deterministic tie-break.

    Returns (query_id, item_id, approx_l2sq, rank).  approx_l2sq is
    the INTEGER ADC distance in quantized units — monotone in the
    approximate true distance (divide by scale^2 for float units).
    Exactness is brute_force_topk's contract; recall vs it is gated in
    tests/test_pq.py (test_pq_cluster_recall,
    test_pq_recall_improves_with_code_budget)."""
    cb = _codebook_matrix(embeddings, m, k, scale, codebook,
                          id_col, vec_col)
    dsub = cb.shape[2]
    dim = cb.shape[0] * dsub

    enc = _encode_df(embeddings, cb, scale, id_col, vec_col)
    # posexplode_OUTER, deliberately: the inner generator makes
    # InferFiltersFromGenerate add a size(codes)>0 pre-filter that
    # predicate pushdown then sinks BELOW the parallelism exchange,
    # re-running the encode UDF a second time (measured: two
    # ArrowEvalPython stages).  The UDF always emits exactly m codes,
    # so outer semantics are identical — and no filter is inferred.
    codes = enc.select(
        "item_id", F.posexplode_outer("codes").alias("m", "code"))

    q = _checked_query(queries, dim, scale, id_col, vec_col, "pq")
    qsub = q.select(
        "query_id",
        F.posexplode(F.array(*[
            F.slice("qq", mi * dsub + 1, dsub) for mi in range(m)
        ])).alias("m", "sv"))
    cb_df = _codebook_df(embeddings.sparkSession, cb)
    pdist = (qsub.join(F.broadcast(cb_df), "m")
             .select("query_id", "m", "code",
                     F.aggregate(
                         F.zip_with("sv", "cvec",
                                    lambda a, b: (a - b) * (a - b)),
                         F.lit(0).cast("long"),
                         lambda acc, x: acc + x).alias("pd")))

    scored = (codes.join(F.broadcast(pdist), ["m", "code"])
              .filter(F.col("query_id") != F.col("item_id"))
              .groupBy("query_id", "item_id")
              .agg(F.sum("pd").alias("approx_l2sq")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_l2sq"), F.asc("item_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk))


def pq_code_stats(embeddings: DataFrame, *, m: int = 8, k: int = 16,
                  scale: int = DEFAULT_SCALE,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Codebook-occupancy observability (the lsh_bucket_stats analogue):
    how many items land on each (subspace, code).  A dead codeword
    (0 rows here) or one swallowing the corpus means the sample/scale
    is wrong for the data — the thing to check before trusting PQ
    recall at a new scale."""
    enc = pq_encode(embeddings, m=m, k=k, scale=scale,
                    id_col=id_col, vec_col=vec_col)
    # posexplode_outer: same single-evaluation rationale as pq_topk
    return (enc.select(F.posexplode_outer("codes").alias("m", "code"))
            .groupBy("m", "code")
            .agg(F.count(F.lit(1)).alias("n_items"))
            .orderBy("m", "code"))


def _int_l2(a, b):
    """Integer squared L2 between two array<bigint> columns — exact in
    every engine (the whole point of the quantization)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _salted_sample(embeddings: DataFrame, k: int, salt: str,
                   id_col: str, vec_col: str):
    """md5(id || salt)-ordered first-k rows as [(id, float64 vec)].
    The salt decorrelates the codebook sample from the centroid sample
    (same rule, different order); bounded collect BY CONSTRUCTION."""
    rows = (embeddings
            .select(F.col(id_col).cast("long").alias("i"),
                    F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.md5(F.concat(F.col("i").cast("string"),
                                    F.lit(salt))), "i")
            .limit(k).collect())
    return [(r["i"], r["v"]) for r in rows]


def ivf_pq_topk(embeddings: DataFrame, queries: DataFrame,
                topk: int = 5, *, n_cells: int = 8, nprobe: int = 3,
                m: int = 8, k: int = 16, scale: int = DEFAULT_SCALE,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ: the composition of the two ANN scale paths (the FAISS
    IVFPQ arrangement) — IVF prunes WHICH items a query scans
    (nprobe of n_cells), PQ shrinks WHAT is scanned (m residual codes
    per item, never the float vector).

    Residual encoding, exactly: each vector's PQ codes quantize
    ``v - centroid(cell(v))``, all in integers, so the classic limit
    identity holds EXACTLY here: with a codeword per corpus residual
    (k = N, m = 1) and a full probe (nprobe = n_cells), the ADC
    distance for an item in cell c is ||(q-c) - (v-c)||^2 = ||q-v||^2
    — integer brute force (pinned in tests/test_pq.py).

    Layout mirrors a real deployment: the coarse quantizer is the
    md5-sample of ``n_cells`` corpus vectors; the residual codebook is
    a 'cb'-salted md5-sample of ``k`` residuals (salted so the two
    samples decorrelate); both driver collects are bounded BY
    CONSTRUCTION.  Corpus side: ONE Arrow stage emits (cell, codes);
    the scan that follows carries ints only.  Query side: pure column
    algebra — probe cells and per-(query, cell) residual distance
    tables ride broadcast joins (Q * nprobe * m * k rows).  Scoring
    joins on (cell, m, code), so candidates are restricted to probed
    cells by the join key itself — no separate pruning pass."""
    cent = np.floor(
        np.asarray([v for _, v in
                    _salted_sample(embeddings, n_cells, "", id_col,
                                   vec_col)], dtype=np.float64)
        * scale).astype(np.int64)
    if cent.size == 0:
        raise ValueError("ivf_pq: empty corpus — cannot sample cells")
    dim = cent.shape[1]
    if dim % m != 0:
        raise ValueError(f"ivf_pq: dim {dim} not divisible by m={m}")
    dsub = dim // m
    n_cells = cent.shape[0]  # may be < requested on a tiny corpus

    def _assign(q: np.ndarray):
        """cells + residuals for quantized rows (B, dim): integer-L2
        argmin (first occurrence == lowest cell id)."""
        d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cells = np.argmin(d, axis=1)
        return cells, q - cent[cells]

    # residual codebook: the salted sample's residuals, same assign rule
    samp = _salted_sample(embeddings, k, "cb", id_col, vec_col)
    sq = np.floor(np.asarray([v for _, v in samp], dtype=np.float64)
                  * scale).astype(np.int64)
    _, sres = _assign(sq)
    cb = sres.reshape(sres.shape[0], m, dsub).transpose(1, 0, 2).copy()

    def encode_rows(batches):
        """mapInPandas encoder emitting the exploded (item_id, cell, m,
        code) rows directly — deliberately OPAQUE to the optimizer: a
        struct-returning pandas_udf here gets re-evaluated below the
        parallelism exchange when the join's inferred isnotnull(cell)
        filter is pushed down (measured: two ArrowEvalPython stages of
        the same matmul).  mapInPandas admits no pushdown, and emitting
        rows from Python also removes the Generate — this IS the
        materialization boundary a real deployment persists."""
        from .util import worker_runtime_tune
        worker_runtime_tune()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.floor(np.asarray(pdf["v"].tolist(), dtype=np.float64)
                         * scale).astype(np.int64)
            if q.shape[1] != dim:
                raise ValueError(
                    f"ivf_pq: vector dim {q.shape[1]} != cell dim {dim}")
            cells, res = _assign(q)
            sub = res.reshape(q.shape[0], m, dsub)
            codes_mat = np.empty((q.shape[0], m), dtype=np.int32)
            for mi in range(m):
                d = sub[:, mi, None, :] - cb[mi][None, :, :]
                codes_mat[:, mi] = np.argmin((d * d).sum(axis=2), axis=1)
            yield pd.DataFrame({
                "item_id": np.repeat(pdf["i"].to_numpy(), m),
                "cell": np.repeat(cells.astype(np.int32), m),
                "m": np.tile(np.arange(m, dtype=np.int32), q.shape[0]),
                "code": codes_mat.ravel()})

    from .util import ensure_parallelism
    codes = (ensure_parallelism(embeddings)
             .select(F.col(id_col).cast("long").alias("i"),
                     F.col(vec_col).cast("array<double>").alias("v"))
             .mapInPandas(encode_rows,
                          "item_id long, cell int, m int, code int"))

    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        [(ci, [int(x) for x in cent[ci]]) for ci in range(n_cells)],
        "cell int, centvec array<bigint>")
    cb_df = _codebook_df(spark, cb)

    q = _checked_query(queries, dim, scale, id_col, vec_col, "ivf_pq")
    from pyspark.sql.window import Window
    wc = Window.partitionBy("query_id").orderBy(
        F.asc("cd"), F.asc("cell"))
    probes = (q.join(F.broadcast(cent_df))
              .select("query_id", "cell", "qq", "centvec",
                      _int_l2(F.col("qq"), F.col("centvec")).alias("cd"))
              .withColumn("crn", F.row_number().over(wc))
              .filter(F.col("crn") <= nprobe)
              .select("query_id", "cell",
                      F.zip_with("qq", "centvec",
                                 lambda a, b: a - b).alias("qresid")))
    qsub = probes.select(
        "query_id", "cell",
        F.posexplode(F.array(*[
            F.slice("qresid", mi * dsub + 1, dsub) for mi in range(m)
        ])).alias("m", "sv"))
    pdist = (qsub.join(F.broadcast(cb_df), "m")
             .select("query_id", "cell", "m", "code",
                     _int_l2(F.col("sv"), F.col("cvec")).alias("pd")))

    scored = (codes.join(F.broadcast(pdist), ["cell", "m", "code"])
              .filter(F.col("query_id") != F.col("item_id"))
              .groupBy("query_id", "item_id")
              .agg(F.sum("pd").alias("approx_l2sq")))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_l2sq"), F.asc("item_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk))
