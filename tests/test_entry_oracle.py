"""Replicates the driver's correctness gate locally: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01; compare row count, column names, and order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows(rows, cols):
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    spark_rows = spark_df.collect()
    cols = sorted(spark_df.columns)

    oracle = duck.execute(ORACLES[name])
    oracle_cols = [d[0] for d in oracle.description]
    oracle_rows = [dict(zip(oracle_cols, r)) for r in oracle.fetchall()]

    assert sorted(oracle_cols) == cols, f"{name}: column mismatch"

    # dtype parity (the driver compares schemas, not just names)
    type_map = {"BIGINT": "bigint", "INTEGER": "int", "DOUBLE": "double",
                "VARCHAR": "string", "HUGEINT": "decimal(38,0)",
                "BOOLEAN": "boolean"}
    spark_types = dict(spark_df.dtypes)
    for col, typ, *_ in duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall():
        expected = type_map.get(typ, typ.lower())
        assert spark_types.get(col) == expected, \
            f"{name}.{col}: spark={spark_types.get(col)} duckdb={typ}"
    assert len(oracle_rows) == len(spark_rows), f"{name}: row count"
    got = _rows([r.asDict() for r in spark_rows], cols)
    want = _rows(oracle_rows, cols)
    assert got == want, f"{name}: value mismatch (first diff: " \
        f"{next(((g, w) for g, w in zip(got, want) if g != w), None)})"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
