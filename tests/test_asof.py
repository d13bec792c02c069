"""As-of join (operators/asof.py): hand-built matches, tie
inclusivity, NULL semantics, seq tie-break, validation, and a seeded
randomized cross-check against DuckDB's NATIVE ASOF JOIN."""

import duckdb
import pandas as pd
import pytest

from racket_linkeddata_spark.operators.asof import asof_join

LEFT = [  # (click_id, user_id, ts)
    (1, "u1", 100),
    (2, "u1", 205),
    (3, "u1", 300),   # ties a right row exactly
    (4, "u2", 50),    # no prior view
    (5, "u3", 10),    # user with no right rows at all
    (6, None, 100),   # NULL key: unmatched
    (7, "u1", None),  # NULL ts: unmatched
]
RIGHT = [  # (user_id, ts, page)
    ("u1", 90, "a"),
    ("u1", 200, "b"),
    ("u1", 300, "c"),
    ("u2", 60, "d"),     # after u2's click
    (None, 5, "x"),      # NULL key: never matches
    ("u3", None, "y"),   # NULL ts: never matches
]


@pytest.fixture(scope="module")
def dfs(spark):
    l = spark.createDataFrame(LEFT, "click_id long, user_id string, "
                              "ts long")
    r = spark.createDataFrame(RIGHT, "user_id string, ts long, "
                              "page string")
    return l, r


def test_backward_match_and_ties(spark, dfs):
    l, r = dfs
    got = {row.click_id: (row.page, row.asof_ts)
           for row in asof_join(l, r, value_cols=["page"]).collect()}
    assert got == {
        1: ("a", 90),
        2: ("b", 200),
        3: ("c", 300),      # equal ts is INCLUSIVE (DuckDB >=)
        4: (None, None),
        5: (None, None),
        6: (None, None),
        7: (None, None),
    }


def test_duplicate_right_ts_seq_tiebreak(spark):
    l = spark.createDataFrame([(1, "u", 10)],
                              "click_id long, user_id string, ts long")
    r = spark.createDataFrame(
        [("u", 10, "first", 1), ("u", 10, "second", 2)],
        "user_id string, ts long, page string, seq long")
    got = asof_join(l, r, value_cols=["page"],
                    seq_col="seq").collect()[0]
    assert got.page == "second"   # greatest seq wins
    # without seq_col: value columns break the tie (largest tuple)
    got2 = asof_join(l, r, value_cols=["page"]).collect()[0]
    assert got2.page == "second"  # 'second' > 'first' lexicographically


def test_validation(spark, dfs):
    l, r = dfs
    with pytest.raises(ValueError, match="non-empty"):
        asof_join(l, r, value_cols=[])
    with pytest.raises(ValueError, match="already exist"):
        asof_join(l.withColumn("page", l.click_id), r,
                  value_cols=["page"])
    with pytest.raises(ValueError, match="right side lacks"):
        asof_join(l, r, value_cols=["nope"])


def test_matches_duckdb_native_asof(spark):
    """Seeded randomized corpus vs DuckDB's native ASOF LEFT JOIN —
    the independent industry-semantics oracle. Right rows are unique
    per (key, ts) (the determinism precondition the driver query also
    establishes)."""
    import random
    rng = random.Random(7)
    left = [(i, f"u{rng.randrange(6)}", rng.randrange(1000))
            for i in range(120)]
    right_keys = {(f"u{rng.randrange(8)}", rng.randrange(1000))
                  for _ in range(80)}
    right = [(u, t, f"v{j}") for j, (u, t) in
             enumerate(sorted(right_keys))]

    l = spark.createDataFrame(left, "click_id long, user_id string, "
                              "ts long")
    r = spark.createDataFrame(right, "user_id string, ts long, "
                              "page string")
    got = {row.click_id: (row.page, row.asof_ts) for row in
           asof_join(l, r, value_cols=["page"]).collect()}

    con = duckdb.connect()
    con.register("l", pd.DataFrame(
        left, columns=["click_id", "user_id", "ts"]))
    con.register("r", pd.DataFrame(
        right, columns=["user_id", "ts", "page"]))
    exp = {int(c): (p, None if pd.isna(t) else int(t))
           for c, p, t in con.sql("""
        SELECT l.click_id, r.page, r.ts
        FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts""").fetchall()}
    assert got == exp


def test_null_value_column_comes_from_matched_row(spark):
    """DuckDB ASOF parity: the match is the latest row WITH its NULLs
    — independent per-column last(ignorenulls) fills would stitch a
    composite row matching NO right row (review r06g, the struct-fill
    fix)."""
    l = spark.createDataFrame([(1, "u", 20)],
                              "click_id long, user_id string, ts long")
    r = spark.createDataFrame(
        [("u", 5, "a", "x"), ("u", 10, None, "y")],
        "user_id string, ts long, page string, other string")
    got = asof_join(l, r, value_cols=["page", "other"]).collect()[0]
    # the ts=10 row wins ENTIRELY: page NULL (its own), other 'y'
    assert (got.page, got.other, got.asof_ts) == (None, "y", 10)

    con = duckdb.connect()
    con.register("l", pd.DataFrame([(1, "u", 20)],
                                   columns=["click_id", "user_id",
                                            "ts"]))
    con.register("r", pd.DataFrame(
        [("u", 5, "a", "x"), ("u", 10, None, "y")],
        columns=["user_id", "ts", "page", "other"]))
    page, other, ts = con.sql("""
        SELECT r.page, r.other, r.ts FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts""").fetchone()
    assert (got.page, got.other, got.asof_ts) == (page, other, ts)


def test_left_side_missing_key_rejected(spark, dfs):
    """A missing left by/on column would be NULL-filled by
    unionByName and return 100% unmatched rows silently — rejected
    loudly (review r06g)."""
    l, r = dfs
    with pytest.raises(ValueError, match="left side lacks"):
        asof_join(l.withColumnRenamed("ts", "click_ts"), r,
                  value_cols=["page"])
    with pytest.raises(ValueError, match="left side lacks"):
        asof_join(l.withColumnRenamed("user_id", "uid"), r,
                  value_cols=["page"])


def test_forward_direction(spark, dfs):
    """direction='forward': EARLIEST right row at-or-after each left
    timestamp; ties inclusive; NULL-key/ts rows stay unmatched."""
    l, r = dfs
    got = {row.click_id: (row.page, row.asof_ts)
           for row in asof_join(l, r, value_cols=["page"],
                                direction="forward").collect()}
    assert got == {
        1: ("b", 200),    # next view after ts=100 is ts=200
        2: ("c", 300),
        3: ("c", 300),    # equal ts inclusive
        4: ("d", 60),     # u2's view at 60 is AFTER the click at 50
        5: (None, None),
        6: (None, None),
        7: (None, None),
    }
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, value_cols=["page"], direction="nearest")


def test_forward_matches_duckdb(spark):
    """Randomized cross-check vs DuckDB's native forward ASOF
    (ON l.ts <= r.ts)."""
    import random
    rng = random.Random(11)
    left = [(i, f"u{rng.randrange(5)}", rng.randrange(500))
            for i in range(80)]
    right_keys = {(f"u{rng.randrange(7)}", rng.randrange(500))
                  for _ in range(60)}
    right = [(u, t, f"v{j}") for j, (u, t) in
             enumerate(sorted(right_keys))]
    l = spark.createDataFrame(left, "click_id long, user_id string, "
                              "ts long")
    r = spark.createDataFrame(right, "user_id string, ts long, "
                              "page string")
    got = {row.click_id: (row.page, row.asof_ts) for row in
           asof_join(l, r, value_cols=["page"],
                     direction="forward").collect()}
    con = duckdb.connect()
    con.register("l", pd.DataFrame(
        left, columns=["click_id", "user_id", "ts"]))
    con.register("r", pd.DataFrame(
        right, columns=["user_id", "ts", "page"]))
    exp = {int(c): (p, None if pd.isna(t) else int(t))
           for c, p, t in con.sql("""
        SELECT l.click_id, r.page, r.ts
        FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts <= r.ts""").fetchall()}
    assert got == exp


def test_forward_duplicate_ts_seq_tiebreak(spark):
    """The duplicate-(key, ts) winner rule is direction-INDEPENDENT
    (greatest seq wins) — pinned for forward too (review r06j)."""
    l = spark.createDataFrame([(1, "u", 10)],
                              "click_id long, user_id string, ts long")
    r = spark.createDataFrame(
        [("u", 10, "first", 1), ("u", 10, "second", 2),
         ("u", 50, "later", 3)],
        "user_id string, ts long, page string, seq long")
    got = asof_join(l, r, value_cols=["page"], seq_col="seq",
                    direction="forward").collect()[0]
    assert (got.page, got.asof_ts) == ("second", 10)
