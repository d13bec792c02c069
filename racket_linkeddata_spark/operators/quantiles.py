"""Exact corpus quantiles over an integer column — percentile_disc
semantics without a global row sort:

    value(q) = min v such that |{x <= v}| >= ceil(q * N)

The scalable trick is aggregating over the VALUE DOMAIN, not the
rows: a (value, count) aggregate is map-side combinable and its
output is as small as the number of distinct values (document
lengths, token counts, scores — domains of thousands, not the corpus
cardinality), so the cumulative sum that follows is a window over a
tiny compact table. A row-sort formulation (row_number over the whole
corpus) would be a global sort at 100 TB; this is one two-phase
aggregate plus constant-size work.

Everything is integer arithmetic: thresholds are
``(q_x100 * N + 99) div 100`` (exact ceil), so the result is
value-exact against the same computation in SQL — no reliance on any
engine's percentile interpolation flavor.

NULLs are excluded (the percentile_disc convention). The cumulative
window runs on a single partition BY DESIGN — its input is the
compact (value, count) table, never corpus rows; the bound is the
distinct-value count, which for the intended integer measures is
tiny. An empty corpus (or all-NULL column) returns no rows.

No reference counterpart; corpus observability for the LLM-pipeline
brief (length/score distributions before choosing gate thresholds).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

DECILES = tuple(range(10, 101, 10))


def exact_quantiles(df: DataFrame, col: str, *,
                    quantiles_x100: Sequence[int] = DECILES,
                    group_col: Optional[str] = None) -> DataFrame:
    """(q_x100 int, value bigint): for each requested quantile (x100,
    e.g. 50 = median, 99 = p99), the smallest value whose cumulative
    count reaches ceil(q * N).

    With ``group_col``, per-group quantiles instead —
    (group_col, q_x100, value) — same value-domain shape with the
    cumulative window partitioned by the group (so it is no longer
    single-partition: each group's compact value table sorts
    independently). A NULL group is a group like any other (the SQL
    GROUP BY convention)."""
    bad = [q for q in quantiles_x100
           if not isinstance(q, int) or isinstance(q, bool)]
    qs = sorted(set(quantiles_x100)) if not bad else []
    if bad or not qs or qs[0] < 1 or qs[-1] > 100:
        # int(q) coercion would silently hand back p99 for a requested
        # 99.5 — reject instead (review r06f)
        raise ValueError(
            f"exact_quantiles: quantiles_x100 must be non-empty ints "
            f"in [1, 100], got {list(quantiles_x100)!r}")
    # Spark-resolved dtype (case-insensitive, like the column ref
    # itself): a fractional column would silently TRUNCATE under the
    # bigint cast while a SQL replica's ::BIGINT ROUNDS — the repo's
    # documented floor-vs-CAST divergence. Integral domains only
    # (review r06f).
    try:
        dt = df.select(F.col(col)).schema[0].dataType.simpleString()
    except Exception as exc:
        raise ValueError(
            f"exact_quantiles: column {col!r} not found "
            f"(has {df.columns})") from exc
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"exact_quantiles: column {col!r} must be integral "
            f"(got {dt}); bucket or scale fractional measures to "
            f"integers first")

    if group_col is not None:
        if group_col in ("q_x100", "value"):
            raise ValueError(
                f"exact_quantiles: group_col cannot be {group_col!r} "
                f"— it collides with the output columns")
        try:
            df.select(F.col(group_col))
        except Exception as exc:
            raise ValueError(
                f"exact_quantiles: group_col {group_col!r} not found "
                f"(has {df.columns})") from exc
    # the group rides a collision-safe internal alias so a group
    # column named like a working column (n, cum, N, ...) can never
    # turn into an AMBIGUOUS_REFERENCE (review r06h; the repo's
    # collision-safe-working-columns lesson)
    groups = ["_q_grp"] if group_col is not None else []
    gsel = ([F.col(group_col).alias("_q_grp")]
            if group_col is not None else [])
    counts = (df.filter(F.col(col).isNotNull())
              .select(*gsel, F.col(col).cast("bigint").alias("value"))
              .groupBy(*groups, "value")
              .agg(F.count(F.lit(1)).alias("n")))
    # window over the COMPACT value table (see module docstring) —
    # not over corpus rows; single-partition when ungrouped,
    # per-group otherwise
    base = (Window.partitionBy(*groups) if groups else Window) \
        .orderBy("value")
    w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = base.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cum = counts.select(
        *groups, "value",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(w_all).alias("N"))

    qdf = df.sparkSession.createDataFrame([(q,) for q in qs],
                                          "q_x100 int")
    # exact ceil(q * N / 100) in integers; the theta-join is
    # (quantile rows) x (compact value table) under a broadcast —
    # constant work
    out = (cum.join(
        F.broadcast(qdf),
        F.col("cum") * 100 >= F.col("q_x100") * F.col("N"))
        .groupBy(*groups, "q_x100")
        .agg(F.min("value").alias("value")))
    if group_col is not None:
        out = out.withColumnRenamed("_q_grp", group_col)
    return out
