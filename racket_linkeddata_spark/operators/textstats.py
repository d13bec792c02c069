"""Text-analysis operators for training-data pipelines over a documents
table (doc_id, text, lang, source, n_chars).

Everything here is JVM-side column algebra (whole-stage codegen) except
simhash/fingerprint, which are Arrow-batched numpy pandas UDFs — never
row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# deterministic stopword markers per language for the LIKE-based heuristic
_LANG_MARKERS = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " et ", " les "]),
    ("es", [" el ", " y ", " los "]),
]


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token count + char stats (integers only, oracle-friendly)."""
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.length(F.regexp_replace("text", " ", "")).cast("bigint")
        .alias("n_nonspace"),
        F.size(F.array_distinct(words)).cast("bigint")
        .alias("n_distinct_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Cheap quality signals: mean word length x1000 (int), distinct-token
    ratio x1000 (int) — fixed-point so cross-engine hashing is exact."""
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words)
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    n_distinct = F.size(F.array_distinct(words))
    return docs.select(
        "doc_id",
        (F.lit(1000) * n_nonspace / n_tokens).cast("bigint")
        .alias("mean_word_len_x1000"),
        (F.lit(1000) * n_distinct / n_tokens).cast("bigint")
        .alias("distinct_ratio_x1000"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language heuristic (n-gram-lite; deliberately
    SQL-expressible so DuckDB can replicate it)."""
    score_cols = []
    for lang, markers in _LANG_MARKERS:
        score = sum(
            (F.when(F.col("text").contains(m), 1).otherwise(0)
             for m in markers),
            F.lit(0))
        score_cols.append((lang, score))
    # argmax with 'und' fallback; ties go to the first language in order
    exprs = [s for _, s in score_cols]
    max_score = F.greatest(*exprs)
    guess = F.lit("und")
    for lang, score in reversed(score_cols):
        guess = F.when((score == max_score) & (max_score > 0),
                       F.lit(lang)).otherwise(guess)
    return docs.select("doc_id", guess.alias("lang_guess"),
                       max_score.cast("bigint").alias("marker_hits"))


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text"):
    """Distinct word n-gram shingles as an array column (JVM-side)."""
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(words, i, n)))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.5,
                        max_docs: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (the verification step of any
    LSH pipeline). All-pairs — quadratic, use only on candidate subsets;
    the scale path is minhash_lsh_candidates() feeding this."""
    from .util import ensure_parallelism

    d = docs
    if max_docs is not None:
        d = d.filter(F.col("doc_id") < max_docs)
    d = ensure_parallelism(d)
    # persist: otherwise the shingle expression tree is re-evaluated on
    # both sides of the self-join
    s = d.select("doc_id", shingles(d, n).alias("sh")).persist()
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union
    return (a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    F.round(jac, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# --- MinHash + LSH (all JVM-side: xxhash64 + affine rehash) ---------------

_MERSENNE = (1 << 31) - 1


def _minhash_cols(shingle_col, k: int):
    # fold xxhash64 into 31 bits first so a*h+b never overflows a long
    # under ANSI arithmetic
    base = F.transform(shingle_col,
                       lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 31)))
    cols = []
    for j in range(k):
        a = 2 * j + 1          # odd multipliers, deterministic
        b = 104729 * (j + 1)
        h = F.array_min(F.transform(
            base, lambda x: (x * a + b) % _MERSENNE))
        cols.append(h.alias(f"mh{j}"))
    return cols


def minhash_signatures(docs: DataFrame, n: int = 3, k: int = 16) -> DataFrame:
    from .util import ensure_parallelism

    docs = ensure_parallelism(docs)  # interpreted HOF exprs are CPU-bound
    sh = shingles(docs, n)
    return docs.select("doc_id", *_minhash_cols(sh, k))


def minhash_lsh_candidates(docs: DataFrame, n: int = 3, k: int = 16,
                           bands: int = 4,
                           materialize: bool = True) -> DataFrame:
    """shingle -> minhash -> band -> bucket self-join: candidate near-dup
    pairs. The self-join is on band bucket keys (equi, shuffle on a
    high-cardinality key — scales linearly, never all-pairs).

    ``materialize`` persists the exploded band table before the self-join:
    without it Catalyst re-evaluates the whole shingle+minhash expression
    tree on BOTH join sides (measured 30x slower). At production scale the
    signature table is written out (Iceberg) instead of cached."""
    sigs = minhash_signatures(docs, n, k)
    rows_per_band = k // bands
    band_structs = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(*[F.col(f"mh{i * rows_per_band + r}")
                         for r in range(rows_per_band)]).alias("bucket"))
        for i in range(bands)
    ])
    exploded = (sigs.select("doc_id", F.explode(band_structs).alias("b"))
                .select("doc_id", F.col("b.band").alias("band"),
                        F.col("b.bucket").alias("bucket")))
    if materialize:
        exploded = exploded.persist()
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (left.join(right, ["band", "bucket"])
            .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word hashes — Arrow-batched numpy UDF
    (per-bit weighted majority doesn't vectorize into column algebra)."""
    import numpy as np

    @F.pandas_udf("bigint")
    def sim(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = t.split(" ") if t else []
            if not words:
                out.append(0)
                continue
            hs = np.array([hash_word(w) for w in words], dtype=np.uint64)
            bits_m = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
            # signed: uint64 arithmetic would wrap negative vote sums
            votes = bits_m.sum(axis=0).astype(np.int64) * 2 - len(words)
            sig = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(i)
            out.append(int(np.int64(sig)))
        return pd.Series(out)

    def hash_word(w: str) -> int:
        import hashlib
        return int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")

    from .util import ensure_parallelism

    return ensure_parallelism(docs).select(
        "doc_id", sim("text").alias("simhash"))


def fingerprint(docs: DataFrame, n: int = 8) -> DataFrame:
    """Document fingerprint: min/max xxhash64 over character n-gram
    rolling windows (winnowing-lite), JVM-side."""
    from .util import ensure_parallelism

    docs = ensure_parallelism(docs)
    idx = F.sequence(F.lit(1),
                     F.greatest(F.length("text") - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(F.col("text"), i, n))
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
    )
