"""Shared operator utilities."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SIZE_RE = re.compile(r"^(\d+)\s*([kmgt]?)b?$", re.IGNORECASE)
_SIZE_MULT = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
              "t": 1 << 40}


def f64_sql(x: float) -> str:
    """A float64 as a DuckDB literal that parses back BIT-EXACT — for
    oracles that pin trained/derived float tables as VALUES literals
    (SRP planes, k-means centroids). A bare decimal literal
    (``0.025248210149055178``) is typed DECIMAL first and the
    DECIMAL->DOUBLE conversion can be off by one ulp vs nearest-double
    parsing; a literal with an exponent is typed DOUBLE and
    strtod-parsed exactly. repr() already emits the shortest
    round-trip form — append ``e0`` when it carries no exponent
    ('n' covers inf/nan passthrough)."""
    r = repr(x)
    return r if ("e" in r or "E" in r or "n" in r) else r + "e0"


def _parse_bytes(s: str, default: int) -> int:
    m = _SIZE_RE.match(s.strip())
    if not m:
        return default
    return int(m.group(1)) * _SIZE_MULT[m.group(2).lower()]


def ensure_parallelism(df: DataFrame, multiple: int = 2) -> DataFrame:
    """Repartition up when the scan would yield fewer partitions than
    the cluster can chew. Spark's file-split packing targets IO bytes
    (maxPartitionBytes=128MB), which starves CPU-bound stages (Python
    UDFs, interpreted higher-order functions) on small inputs — measured
    30x on a single-split corpus. No-op at production scale.

    The probe reads the OPTIMIZED plan's size estimate (analysis +
    optimization only) and compares against the same split arithmetic
    the scan uses (size / maxPartitionBytes vs target) — it never calls
    ``df.rdd.getNumPartitions()``, which forced full physical planning
    and an RDD conversion at operator-construction time for every
    caller (round-4 verdict carried minor). For file scans the estimate
    IS the input byte count, so the decision matches the old
    partition-count probe; at 100 TB the estimate is huge and this is a
    no-op with near-zero driver cost."""
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism * multiple
    max_pb = _parse_bytes(
        sess.conf.get("spark.sql.files.maxPartitionBytes", "134217728"),
        134217728)
    open_cost = _parse_bytes(
        sess.conf.get("spark.sql.files.openCostInBytes", "4194304"),
        4194304)
    try:
        est = int(str(
            df._jdf.queryExecution().optimizedPlan().stats()
            .sizeInBytes()))
    except Exception:
        # exotic plan with no stats: repartitioning is always
        # semantically safe, and anything that defeats estimation is
        # not the giant file scan the no-op exists for
        return df.repartition(target)
    if est >= target * max_pb:
        # size alone yields >= target splits for SPLITTABLE sources —
        # checked FIRST so the 100 TB parquet case never pays the
        # inputFiles listing below. binaryFile relations (the WARC
        # source) are NON-splittable: one file = one partition no
        # matter the bytes, so a handful of multi-GB archives would
        # starve the extraction stage if the size short-circuit
        # applied (review r05a) — for those, few files means few
        # partitions, and listing few files is cheap.
        if "binaryFile" not in \
                df._jdf.queryExecution().optimizedPlan().toString():
            return df
        if len(df.inputFiles()) >= target:
            return df
        return df.repartition(target)
    # small data: splits ~ file count when each file's open cost fills
    # a split (the session pins openCostInBytes = maxPartitionBytes
    # exactly so small files never pack) — a staged table written from
    # >= target partitions is already parallel; re-shuffling it cost
    # kg_build ~25% (measured). A small NON-file input (createDataFrame,
    # post-shuffle subtree: inputFiles = []) that already has >= target
    # partitions gets one redundant shuffle here — of data the estimate
    # just bounded as small.
    if open_cost >= max_pb and len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)


# Tokenizer whitespace: Java's \s (Spark split) is [ \t\n\x0B\f\r]
# but RE2's (DuckDB's) \s LACKS \x0B — a vertical tab in scraped text
# splits tokens in the engine and not in the oracle. ONE explicit
# class, byte-identical semantics in both engines (java.util.regex
# and RE2 both accept the \t \n \r \f \x0B escapes), and exactly
# equal to Java's \s so nothing changes engine-side (review r06i).
WS_CLASS = "[ \\t\\n\\r\\f\\x0B]+"

# single-character variant of the same class (for \s and \s* uses)
WS_CHAR = "[ \\t\\n\\r\\f\\x0B]"
