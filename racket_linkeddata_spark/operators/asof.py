"""As-of join — for every left row, the nearest right row per key:
at-or-before its timestamp (``direction='backward'``, the default —
"each click joined to the user's latest prior view") or at-or-after
it (``direction='forward'``, the next-event join). Spark has no
native ASOF JOIN (DuckDB does — which makes it the perfect
independent oracle); the naive formulations are a range join that
explodes to |left| x |right| per key or a per-key collect. This is
the scalable composition:

    union(left tagged 1, right tagged 0)
    -> ONE shuffle on the key
    -> last(right value, ignoreNulls) over an ordered running window
    -> keep the left rows

Each row is touched once; the window is a running frame (constant
state per key, streaming-friendly order), and equal timestamps sort
the right row FIRST (tag ascending) so the match is INCLUSIVE of
ties — DuckDB ASOF's `>=` (backward) / `<=` (forward) semantics
exactly; forward only flips the timestamp sort key.

Determinism with duplicate right rows on the same (key, ts): the
window sorts them by ``seq_col`` if given (latest sequence wins),
else by the value columns themselves — either way last() picks a
well-defined winner, and the oracle pre-dedups with the same rule.

No reference counterpart (racket-linkeddata has no temporal joins);
the brief names as-of join explicitly as a custom-operator target.

100 TB shape: one hash exchange on ``by`` + one sort — the same cost
as any keyed window; no broadcast needed on either side, no range
cross product, AQE-splittable hot keys. Rows with a NULL key or NULL
timestamp on the left pass through unmatched (NULL value columns);
NULL-ts right rows can never be "most recent" and are dropped.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str = "ts", by: str = "user_id",
              value_cols: List[str],
              seq_col: Optional[str] = None,
              direction: str = "backward") -> DataFrame:
    """left columns + ``value_cols`` (from the matching right row) +
    ``asof_ts`` (its timestamp; NULL when no right row matches).

    ``direction='backward'`` (default): latest right row at-or-before
    the left timestamp — DuckDB ``ON l.ts >= r.ts``.
    ``direction='forward'``: EARLIEST right row at-or-after it —
    DuckDB ``ON l.ts <= r.ts`` (the "next event" join). Same plan,
    only the window's timestamp sort flips (NULLS FIRST under the
    descending order so NULL-ts left rows stay unmatched); the
    duplicate-(key, ts) winner rule is unchanged (greatest seq)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be 'backward' or "
                         f"'forward', got {direction!r}")
    if not value_cols:
        raise ValueError("asof_join: value_cols must be non-empty")
    internal = {"_asof_is_left", "_asof_seq", "_asof_match"}
    clash = ((set(value_cols) | {"asof_ts"} | internal)
             & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join: output/working columns {sorted(clash)} "
            f"already exist on the left side — rename before joining")
    for c in (by, on, *value_cols, *( [seq_col] if seq_col else [])):
        if c not in right.columns:
            raise ValueError(f"asof_join: right side lacks {c!r} "
                             f"(has {right.columns})")
    for c in (by, on):
        # unionByName(allowMissingColumns) would silently fill a
        # missing LEFT key/ts with NULL and return 100% unmatched
        # rows instead of erroring (review r06g)
        if c not in left.columns:
            raise ValueError(f"asof_join: left side lacks {c!r} "
                             f"(has {left.columns})")

    tag = "_asof_is_left"
    # carry the right timestamp separately: the left rows' own `on`
    # drives the sort, the matched right `on` is the output asof_ts
    # NULL-key right rows can never equality-match (DuckDB ASOF
    # semantics); dropping them keeps NULL-key LEFT rows unmatched
    # instead of "matching" inside the NULL window partition
    r = (right.filter(F.col(on).isNotNull() & F.col(by).isNotNull())
         .select(F.col(by), F.col(on),
                 F.col(on).alias("asof_ts"),
                 *[F.col(c) for c in value_cols],
                 *( [F.col(seq_col).alias("_asof_seq")]
                    if seq_col else []),
                 F.lit(0).alias(tag)))
    l = left.select("*", F.lit(1).alias(tag))
    u = l.unionByName(r, allowMissingColumns=True)

    ts_key = (F.col(on).desc_nulls_first() if direction == "forward"
              else F.col(on).asc())
    order = [ts_key, F.col(tag).asc()]
    order += ([F.col("_asof_seq").asc()] if seq_col
              else [F.col(c).asc() for c in value_cols])
    w = (Window.partitionBy(by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    is_right = F.col(tag) == 0
    # fill ONE struct, not per-column lasts: independent
    # last(ignorenulls) fills would stitch values from DIFFERENT
    # right rows whenever the matched row carries a NULL value column
    # — a composite row matching NO right row, diverging from DuckDB
    # ASOF which returns the latest row WITH its NULLs (review r06g,
    # empirically confirmed). The struct is non-NULL for every right
    # row, so last() always picks whole rows.
    payload = F.when(is_right, F.struct(
        F.col("asof_ts").alias("asof_ts"),
        *[F.col(c).alias(c) for c in value_cols]))
    filled = u.select(
        "*",
        F.last(payload, ignorenulls=True).over(w)
        .alias("_asof_match"))
    return (filled.filter(F.col(tag) == 1)
            .select(*left.columns,
                    *[F.col(f"_asof_match.{c}").alias(c)
                      for c in value_cols],
                    F.col("_asof_match.asof_ts").alias("asof_ts")))
