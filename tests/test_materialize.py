"""Materialized layout: bucketed edges/nodes, resume from the written log."""

from pyspark.sql import functions as F

from racket_linkeddata_spark.plans.kg import (
    build_kg, materialize, read_edges, read_nodes)
from racket_linkeddata_spark.sources.pages import synthesize_pages


def test_snapshot_resume_merges_edges(spark, tmp_path):
    """Two-snapshot resume == single full run under the merged read view:
    no duplicate triple keys, n_sources summed across snapshots."""
    pages = synthesize_pages(spark, 80, partitions=4).cache()
    first = pages.limit(50).cache()
    out = str(tmp_path / "kg")

    kg1 = build_kg(first, persist=False, snapshot_id=0)
    materialize(kg1, out, buckets=8)

    log = spark.read.parquet(f"{out}/page_log")
    kg2 = build_kg(pages, processed_log=log, persist=False, snapshot_id=1)
    materialize(kg2, out, buckets=8, mode="append")
    kg2.log.write.mode("append").parquet(f"{out}/page_log")

    merged = read_edges(spark, out)
    full = build_kg(pages, persist=False).edges
    key = ["subj", "pred", "obj_kind", "obj_value", "obj_dt",
           "obj_lang", "graph"]
    assert merged.groupBy(*key).count().filter("count > 1").count() == 0
    got = {tuple(r[k] for k in key): r.n_sources
           for r in merged.collect()}
    want = {tuple(r[k] for k in key): r.n_sources for r in full.collect()}
    assert got == want
    # merged nodes view also collapses across snapshots
    nodes = read_nodes(spark, out)
    assert nodes.groupBy("canon_uri").count().filter("count > 1").count() == 0


def test_materialize_and_resume(spark, tmp_path):
    pages = synthesize_pages(spark, 100, partitions=4).cache()
    kg = build_kg(pages, persist=False)
    out = str(tmp_path / "kg")
    materialize(kg, out, buckets=8)

    edges = spark.read.parquet(f"{out}/edges")
    assert edges.select("bucket").distinct().count() <= 8
    assert edges.count() == kg.edges.count()
    # partition pruning: a single-bucket read scans one partition dir
    one = edges.filter(F.col("bucket") == 3)
    assert one.count() == edges.filter("bucket = 3").count()

    log = spark.read.parquet(f"{out}/page_log")
    assert log.count() == 100

    # resume against the materialized log: nothing left to do
    kg2 = build_kg(pages, processed_log=log, persist=False)
    assert kg2.extracted.count() == 0


def test_sql_views(spark):
    from racket_linkeddata_spark.plans.kg import register_views

    pages = synthesize_pages(spark, 60, partitions=4)
    kg = build_kg(pages, persist=False)
    register_views(kg)
    top = spark.sql("""
        SELECT pred, count(*) AS n FROM kg_edges
        GROUP BY pred ORDER BY n DESC, pred LIMIT 3""").collect()
    assert len(top) == 3 and top[0].n >= top[1].n
    joined = spark.sql("""
        SELECT count(*) AS n FROM kg_edges e
        JOIN kg_nodes s ON e.subj = s.canon_uri""").first().n
    assert joined == spark.sql("SELECT count(*) FROM kg_edges").first()[0]


def test_compact_snapshots_folds_to_single_snapshot(spark, tmp_path):
    from racket_linkeddata_spark.plans.kg import compact_snapshots

    pages = synthesize_pages(spark, 60, partitions=4).cache()
    first = pages.limit(40).cache()
    out = str(tmp_path / "kg")
    materialize(build_kg(first, persist=False, snapshot_id=0), out, buckets=4)
    log = spark.read.parquet(f"{out}/page_log")
    materialize(build_kg(pages, processed_log=log, persist=False,
                         snapshot_id=1), out, buckets=4, mode="append")

    before = {tuple(r) for r in read_edges(spark, out).collect()}
    nodes_before = {tuple(r) for r in read_nodes(spark, out).collect()}
    compact_snapshots(spark, out)

    edges = spark.read.parquet(f"{out}/edges")
    assert edges.select("snap").distinct().collect() == [
        edges.sparkSession.createDataFrame([(0,)], "snap int").first()]
    assert {tuple(r) for r in read_edges(spark, out).collect()} == before
    assert {tuple(r) for r in read_nodes(spark, out).collect()} == \
        nodes_before
    # compacted table keeps working as the base for a THIRD snapshot
    kg3 = build_kg(pages, processed_log=spark.read.parquet(
        f"{out}/page_log"), persist=False, snapshot_id=1)
    materialize(kg3, out, buckets=4, mode="append")
    assert read_edges(spark, out).count() >= len(before)


def test_compaction_crash_recovery_all_states(spark, tmp_path):
    """Round-2 ADVICE: the compaction swap is two renames, not one atomic
    step — every crash state must self-heal via _recover_compaction so
    readers never see a missing table and no data is lost."""
    import shutil

    from racket_linkeddata_spark.plans.kg import (
        _recover_compaction, compact_snapshots)

    pages = synthesize_pages(spark, 40, partitions=4).cache()
    out = str(tmp_path / "kg")
    materialize(build_kg(pages, persist=False, snapshot_id=0), out, buckets=4)
    want = {tuple(r) for r in read_edges(spark, out).collect()}

    path, tmp, old = (f"{out}/edges", f"{out}/edges__compacting",
                      f"{out}/edges__old")

    # state 1: crash before the swap started (tmp possibly partial)
    shutil.copytree(path, tmp)
    shutil.rmtree(f"{tmp}/snap=0")  # make it visibly partial
    assert {tuple(r) for r in read_edges(spark, out).collect()} == want
    assert not __import__("os").path.exists(tmp)

    # state 2: crash between the two renames (path absent, tmp complete)
    shutil.copytree(path, tmp)
    shutil.move(path, old)
    assert {tuple(r) for r in read_edges(spark, out).collect()} == want
    import os
    assert os.path.exists(path) and not os.path.exists(old)

    # state 3: crash before the final cleanup (path present, old present)
    shutil.copytree(path, old)
    assert {tuple(r) for r in read_edges(spark, out).collect()} == want
    assert not os.path.exists(old)

    # state 4: only old left (rolled back)
    shutil.move(path, old)
    _recover_compaction(out, "edges")
    assert {tuple(r) for r in read_edges(spark, out).collect()} == want

    # and a real compaction still works end-to-end after all that
    compact_snapshots(spark, out)
    assert {tuple(r) for r in read_edges(spark, out).collect()} == want


def test_kg_job_warc_input(spark, tmp_path):
    """kg_job --warc: the spark-submit entry builds the same KG from a
    raw WARC directory as from the equivalent pages table."""
    import datetime
    import os
    import subprocess
    import sys

    from racket_linkeddata_spark.sources.pages import synth_page
    from racket_linkeddata_spark.sources.warc import write_warc

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    recs = []
    for i in range(30):
        url, ts, html, _, _ = synth_page(i)
        recs.append((url, ts.replace(microsecond=0,
                                     tzinfo=datetime.timezone.utc), html))
    write_warc(recs, str(wdir / "a.warc"))
    (wdir / "junk.warc").write_bytes(b"NOT A WARC")  # must be isolated

    out = str(tmp_path / "kg")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    run = subprocess.run(
        [sys.executable, "/root/repo/jobs/kg_job.py",
         "--warc", str(wdir), "--out", out],
        env=env, capture_output=True, text=True)
    assert run.returncode == 0, run.stderr[-2000:]

    from racket_linkeddata_spark.plans.kg import build_kg, read_edges
    got = read_edges(spark, out).agg({"n_sources": "sum"}).first()[0]
    direct = build_kg(synthesize_pages(spark, 30, partitions=2),
                      persist=False).edges \
        .agg({"n_sources": "sum"}).first()[0]
    assert got == direct


def test_kg_job_stream_warc_cli(spark, tmp_path):
    """kg_job --stream --warc: the CLI drains a crawl directory via
    Structured Streaming into the same store; the merged view equals
    the batch build, and a second invocation with a new archive
    processes only it (stream checkpoint)."""
    import datetime
    import os
    import subprocess
    import sys

    from racket_linkeddata_spark.sources.pages import synth_page
    from racket_linkeddata_spark.sources.warc import write_warc

    def mk(lo, hi):
        recs = []
        for i in range(lo, hi):
            url, ts, html, _, _ = synth_page(i)
            recs.append((url, ts.replace(
                microsecond=0, tzinfo=datetime.timezone.utc), html))
        return recs

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    write_warc(mk(0, 20), str(wdir / "a.warc"))
    out = str(tmp_path / "kg")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    cmd = [sys.executable, "/root/repo/jobs/kg_job.py",
           "--warc", str(wdir), "--out", out, "--stream"]
    run = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert run.returncode == 0, run.stderr[-2000:]

    write_warc(mk(200, 210), str(wdir / "b.warc.gz"), compress=True)
    run2 = subprocess.run(cmd, env=env, capture_output=True, text=True)
    assert run2.returncode == 0, run2.stderr[-2000:]

    from racket_linkeddata_spark.plans.kg import build_kg, read_edges
    from racket_linkeddata_spark.sources.warc import read_warc
    key = ["subj", "pred", "obj_kind", "obj_value", "obj_dt",
           "obj_lang", "graph"]
    got = {tuple(r[k] for k in key): r.n_sources
           for r in read_edges(spark, out).collect()}
    want = {tuple(r[k] for k in key): r.n_sources
            for r in build_kg(read_warc(spark, str(wdir)),
                              persist=False).edges.collect()}
    assert got == want
    log = spark.read.parquet(f"{out}/page_log")
    assert log.count() == log.select("url").distinct().count() == 30


def test_resume_aborts_when_lineage_unreadable(spark, tmp_path):
    """Round-2 ADVICE: if page_log loads but lineage is missing/corrupt
    (crash between materialize's writes), --resume must abort, NOT fall
    back to overwrite (which destroyed all prior snapshots)."""
    import shutil
    import subprocess
    import sys

    import os

    out = str(tmp_path / "kg")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    run = [sys.executable, "/root/repo/jobs/kg_job.py", "--out", out]
    first = subprocess.run(run + ["--n-synth", "40"], env=env,
                           capture_output=True, text=True)
    assert first.returncode == 0, first.stderr[-2000:]

    shutil.rmtree(f"{out}/lineage")  # simulate the partial-write crash
    edges_before = sorted(
        str(p) for p in (tmp_path / "kg" / "edges").rglob("*.parquet"))
    assert edges_before
    resume = subprocess.run(run + ["--n-synth", "60", "--resume"], env=env,
                            capture_output=True, text=True)
    assert resume.returncode != 0
    assert "refusing" in (resume.stderr + resume.stdout)
    # prior snapshot data untouched
    edges_after = sorted(
        str(p) for p in (tmp_path / "kg" / "edges").rglob("*.parquet"))
    assert edges_after == edges_before


def test_kg_job_stream_flag_validation(tmp_path):
    """Review r05a: --stream with BOTH --pages and --warc must be
    rejected (the wrong reader would silently yield an empty KG), and
    an empty input dir must drain to '0 edges', not crash on a
    never-created store. Validation happens before the JVM starts."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, PYTHONPATH="/root/repo")
    base = [sys.executable, "/root/repo/jobs/kg_job.py",
            "--out", str(tmp_path / "kg"), "--stream"]
    both = subprocess.run(
        base + ["--pages", "/x", "--warc", "/y"],
        env=env, capture_output=True, text=True, timeout=60)
    assert both.returncode != 0 and "not both" in both.stderr

    neither = subprocess.run(base, env=env, capture_output=True,
                             text=True, timeout=60)
    assert neither.returncode != 0 and "needs" in neither.stderr

    empty = tmp_path / "emptywarcs"
    empty.mkdir()
    drain = subprocess.run(base + ["--warc", str(empty)], env=env,
                           capture_output=True, text=True, timeout=600)
    assert drain.returncode == 0, drain.stderr[-2000:]
    assert "0 edges" in drain.stdout


def test_kg_job_under_spark_submit_pyfiles(spark, tmp_path):
    """The north rule's literal launch mode: `spark-submit --py-files
    rls.zip jobs/kg_job.py`. The package is importable ONLY from the
    zip (no PYTHONPATH, neutral cwd), so this proves the job ships
    itself to executors the way a real cluster submit would."""
    import os
    import shutil
    import subprocess
    import zipfile

    pkg = "/root/repo/racket_linkeddata_spark"
    zpath = str(tmp_path / "rls.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, "/root/repo"))

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    out = str(tmp_path / "kg")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    run = subprocess.run(
        [spark_submit, "--master", "local[4]", "--driver-memory", "2g",
         "--py-files", zpath, "/root/repo/jobs/kg_job.py",
         "--n-synth", "60", "--out", out, "--buckets", "4"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=420)
    assert run.returncode == 0, (run.stdout[-1000:], run.stderr[-2000:])
    assert "kg-construct done" in run.stdout
    edges = spark.read.parquet(f"{out}/edges")
    assert edges.count() > 0
