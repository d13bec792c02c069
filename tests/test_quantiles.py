"""Exact quantiles (operators/quantiles.py): percentile_disc parity
with a pure-Python replica, NULL exclusion, duplicates, empty input,
and validation."""

import math

import pytest

from racket_linkeddata_spark.operators.quantiles import exact_quantiles


def _replica(values, qs):
    vals = sorted(v for v in values if v is not None)
    n = len(vals)
    return {q: vals[max(math.ceil(q * n / 100), 1) - 1]
            for q in qs} if n else {}


@pytest.mark.parametrize("values", [
    list(range(1, 101)),                    # uniform 1..100
    [5] * 10,                               # all equal
    [1, 1, 1, 2, 3, 100, None, None],       # skew + NULLs
    [7],                                    # single row
    [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],      # dups, unsorted
])
def test_matches_replica(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x long")
    qs = (1, 10, 25, 50, 75, 90, 99, 100)
    got = {r.q_x100: r.value
           for r in exact_quantiles(df, "x",
                                    quantiles_x100=qs).collect()}
    assert got == _replica(values, qs)


def test_median_semantics(spark):
    """Even count: percentile_disc(0.5) is the LOWER middle element
    (ceil(0.5 * 4) = 2nd of 4)."""
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x long")
    got = {r.q_x100: r.value
           for r in exact_quantiles(df, "x",
                                    quantiles_x100=[50]).collect()}
    assert got == {50: 2}


def test_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "x long")
    assert exact_quantiles(empty, "x").collect() == []
    nulls = spark.createDataFrame([(None,), (None,)], "x long")
    assert exact_quantiles(nulls, "x").collect() == []


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "x long")
    for bad in ([], [0], [101]):
        with pytest.raises(ValueError, match="quantiles_x100"):
            exact_quantiles(df, "x", quantiles_x100=bad)


def test_fractional_inputs_rejected(spark):
    """Fractional columns would truncate in Spark but round in a SQL
    ::BIGINT replica (the repo's floor-vs-CAST divergence) — rejected
    at plan time; fractional quantile requests are rejected too, not
    silently truncated to the floor percentile (review r06f)."""
    dbl = spark.createDataFrame([(1.9,), (2.6,)], "x double")
    with pytest.raises(ValueError, match="must be integral"):
        exact_quantiles(dbl, "x")
    ints = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="quantiles_x100"):
        exact_quantiles(ints, "x", quantiles_x100=[99.5])
    with pytest.raises(ValueError, match="quantiles_x100"):
        exact_quantiles(ints, "x", quantiles_x100=[True])


def test_case_insensitive_column(spark):
    """Column resolution follows Spark's (case-insensitive by
    default), not a case-sensitive dict lookup (review r06f)."""
    df = spark.createDataFrame([(1,), (2,)], "x long")
    got = {r.q_x100: r.value
           for r in exact_quantiles(df, "X",
                                    quantiles_x100=[50]).collect()}
    assert got == {50: 1}


def test_missing_column_clean_error(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="not found"):
        exact_quantiles(df, "n_cahrs")


def test_grouped_quantiles_match_replica(spark):
    rows = [("a", v) for v in range(1, 11)] + \
        [("b", 5)] * 4 + [(None, 7), (None, 9), ("a", None)]
    df = spark.createDataFrame(rows, "src string, x long")
    qs = (25, 50, 100)
    got = {(r.src, r.q_x100): r.value
           for r in exact_quantiles(df, "x", quantiles_x100=qs,
                                    group_col="src").collect()}
    by_group = {}
    for s, v in rows:
        if v is not None:
            by_group.setdefault(s, []).append(v)
    exp = {(s, q): _replica(vs, qs)[q]
           for s, vs in by_group.items() for q in qs}
    assert got == exp
    assert got[(None, 50)] == 7  # NULL group is a group (SQL GROUP BY)


def test_group_col_collisions_and_validation(spark):
    """A group column named like a working column must WORK (internal
    alias, the collision-safe-working-columns lesson), an output-name
    collision and a typo are clean ValueErrors (review r06h)."""
    df2 = spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)],
                                "cum string, x long")
    got2 = {(r.cum, r.q_x100): r.value
            for r in exact_quantiles(df2, "x", quantiles_x100=[100],
                                     group_col="cum").collect()}
    assert got2 == {("a", 100): 2, ("b", 100): 5}
    with pytest.raises(ValueError, match="collides with the output"):
        exact_quantiles(df2.withColumnRenamed("cum", "q_x100"), "x",
                        group_col="q_x100")
    with pytest.raises(ValueError, match="group_col .* not found"):
        exact_quantiles(df2, "x", group_col="sorce")
