"""Deterministic HyperLogLog (operators/sketch.py): register-level
parity with a pure-Python replica, duplicate insensitivity, estimate
accuracy, empty input, and validation."""

import hashlib

import pytest

from racket_linkeddata_spark.operators.sketch import (
    _alpha_x1e6,
    hll_registers,
    hll_summary,
)


def _replica_registers(values, p):
    w = 32 - p
    regs = {}
    for v in values:
        if v is None:
            continue
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        b, suf = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if suf == 0 else w - (suf.bit_length() - 1)
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _replica_summary(values, p):
    m, rmax = 1 << p, (32 - p) + 1
    regs = _replica_registers(values, p)
    denom = (sum(1 << (rmax - r) for r in regs.values())
             + (m - len(regs)) * (1 << rmax))
    numerator = _alpha_x1e6(m) * m * m * (1 << rmax)
    return (m - len(regs), denom, (numerator // denom) // 1_000_000)


VALUES = ["alpha", "beta", "gamma", None, "alpha", "42"] + \
    [f"tok{i}" for i in range(200)]


def test_registers_match_replica(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "v string")
    for p in (4, 6, 10):
        got = {r.bucket: r.register
               for r in hll_registers(df, "v", p=p).collect()}
        assert got == _replica_registers(VALUES, p), p


def test_int_column_hashes_like_str(spark):
    """values hash via their string form: int 42 == str '42'."""
    df = spark.createDataFrame([(42,), (7,)], "v long")
    got = {r.bucket: r.register
           for r in hll_registers(df, "v", p=6).collect()}
    assert got == _replica_registers([42, 7], 6)


def test_duplicates_do_not_move_the_sketch(spark):
    once = spark.createDataFrame([(v,) for v in VALUES], "v string")
    thrice = spark.createDataFrame([(v,) for v in VALUES * 3],
                                   "v string")
    assert sorted(map(tuple, hll_registers(once, "v").collect())) == \
        sorted(map(tuple, hll_registers(thrice, "v").collect()))


def test_summary_matches_replica_and_is_accurate(spark):
    vals = [f"item-{i}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    row = hll_summary(df, "v", p=6).collect()[0]
    zeros, denom, est = _replica_summary(vals, 6)
    assert (row.p, row.m) == (6, 64)
    assert (row.n_zero_buckets, row.harmonic_denom, row.estimate) == \
        (zeros, denom, est)
    # 64 buckets -> sigma ~ 1.04/8 = 13%; assert within 3 sigma
    assert abs(row.estimate - 5000) / 5000 < 0.39


def test_empty_input(spark):
    df = spark.createDataFrame([], "v string")
    row = hll_summary(df, "v", p=6).collect()[0]
    assert row.n_zero_buckets == 64
    assert row.harmonic_denom == 64 * (1 << 27)
    # all-zero registers: raw estimate degenerates to ~alpha*m (the
    # documented no-linear-counting regime, flagged by n_zero_buckets)
    assert row.estimate == (_alpha_x1e6(64) * 64) // 1_000_000


def test_non_identifier_column_name(spark):
    """Column access is pure-column (F.col), not string-interpolated
    SQL — a spaced name must work (review r06e)."""
    df = spark.createDataFrame([("alpha",), ("beta",)],
                               "`my col` string")
    got = {r.bucket: r.register
           for r in hll_registers(df, "my col", p=6).collect()}
    assert got == _replica_registers(["alpha", "beta"], 6)


def test_streaming_registers_match_batch(spark, tmp_path):
    """The sketch composes with Structured Streaming as-is: max is
    commutative/idempotent, so hll_registers over micro-batches in
    complete mode converges to the batch sketch — m rows of state,
    the bounded-streaming-state story for distinct counting."""
    src = str(tmp_path / "vals")
    schema = "v string"
    batches = [[(f"a{i}",) for i in range(40)],
               [(f"b{i}",) for i in range(40)],
               [(f"a{i}",) for i in range(20)]]       # dup re-delivery
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (hll_registers(stream, "v", p=6)
         .writeStream.format("memory").queryName("hll_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r.bucket, r.register)
           for r in spark.sql("select * from hll_stream").collect()}
    batch = {(r.bucket, r.register) for r in
             hll_registers(spark.read.parquet(src), "v", p=6).collect()}
    assert got == batch
    all_vals = [v for b in batches for (v,) in b]
    assert got == set(_replica_registers(all_vals, 6).items())


def test_p_validation(spark):
    df = spark.createDataFrame([("x",)], "v string")
    for bad in (3, 11, 0):
        with pytest.raises(ValueError, match="p must be in"):
            hll_registers(df, "v", p=bad)
        with pytest.raises(ValueError, match="p must be in"):
            hll_summary(df, "v", p=bad)


def _cms_replica(values, width, depth):
    cells = {}
    for v in values:
        if v is None:
            continue
        for i in range(depth):
            h = int(hashlib.md5(f"{v}:{i}".encode())
                    .hexdigest()[:8], 16) % width
            cells[(i, h)] = cells.get((i, h), 0) + 1
    return cells


def test_cms_sketch_matches_replica(spark):
    from racket_linkeddata_spark.operators.sketch import cms_sketch

    vals = ["the"] * 50 + ["cat"] * 7 + [None] + \
        [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {(r.row, r.col): r.cnt
           for r in cms_sketch(df, "v", width=64, depth=3).collect()}
    assert got == _cms_replica(vals, 64, 3)


def test_cms_estimate_never_underestimates(spark):
    from racket_linkeddata_spark.operators.sketch import (
        cms_estimate, cms_sketch)

    vals = ["the"] * 50 + ["cat"] * 7 + [f"t{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = cms_sketch(df, "v", width=64, depth=4)
    probes = spark.createDataFrame(
        [("the",), ("cat",), ("absent",), (None,)], "v string")
    got = {r.value: r.estimate
           for r in cms_estimate(sk, probes, "v",
                                 width=64, depth=4).collect()}
    assert set(got) == {"the", "cat", "absent"}  # NULL probe skipped
    truth = {"the": 50, "cat": 7, "absent": 0}
    cells = _cms_replica(vals, 64, 4)
    for v, t in truth.items():
        exp = min(cells.get(
            (i, int(hashlib.md5(f"{v}:{i}".encode())
                    .hexdigest()[:8], 16) % 64), 0)
            for i in range(4))
        assert got[v] == exp       # exact replica parity
        assert got[v] >= t         # the CMS one-sided guarantee


def test_cms_validation(spark):
    from racket_linkeddata_spark.operators.sketch import (
        cms_estimate, cms_sketch)

    df = spark.createDataFrame([("x",)], "v string")
    for kw in ({"width": 1}, {"depth": 0}, {"depth": 17}):
        with pytest.raises(ValueError, match="cms"):
            cms_sketch(df, "v", **kw)
        with pytest.raises(ValueError, match="cms"):
            cms_estimate(df, df, "v", **kw)


def test_streaming_cms_matches_batch(spark, tmp_path):
    """CMS composes with Structured Streaming like HLL: counts are
    commutative, so cms_sketch over micro-batches in complete mode
    converges to the batch sketch — width*depth rows of state."""
    from racket_linkeddata_spark.operators.sketch import cms_sketch

    src = str(tmp_path / "cmsvals")
    batches = [[("the",)] * 10 + [(f"a{i}",) for i in range(20)],
               [("the",)] * 5 + [(f"b{i}",) for i in range(20)]]
    for b in batches:
        spark.createDataFrame(b, "v string").coalesce(1) \
            .write.mode("append").parquet(src)

    stream = (spark.readStream.schema("v string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (cms_sketch(stream, "v", width=64, depth=3)
         .writeStream.format("memory").queryName("cms_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r.row, r.col): r.cnt for r in
           spark.sql("select * from cms_stream").collect()}
    all_vals = [v for b in batches for (v,) in b]
    assert got == _cms_replica(all_vals, 64, 3)
