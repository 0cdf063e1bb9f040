"""Manifest tail-stream rate limiting (maxFilesPerTrigger /
maxRowsPerTrigger): bounded micro-batches with whole-file admission, a
>=1-file progress guarantee, capping active from the FIRST batch of a
fresh backfill, and restart safety (the engine's checkpoint replay
re-syncs the cursor before the first poll — offsets never regress).

processingTime triggers exercise the cap directly (latestOffset is
polled per batch).  For availableNow, Spark wraps a Python source in
AvailableNowDataStreamWrapper, which calls latestOffset EXACTLY ONCE
per run — so one capped run advances one capped step, and the full
availableNow contract ("drain ALL available data in capped batches")
is delivered by ``streaming.sinks.drain_available_now``, which loops
capped availableNow runs on one checkpoint until no progress
(asserted below, including kill-and-resume recovery mid-backfill).
"""

from __future__ import annotations

import time

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import register


def _append_files(spark, path: str, start_file: int, n_files: int,
                  rows_per_file: int = 5) -> None:
    register(spark)
    for j in range(start_file, start_file + n_files):
        df = spark.createDataFrame(
            [(j * rows_per_file + i, float(i))
             for i in range(rows_per_file)], "k long, x double")
        (df.coalesce(1).write.format("graft_manifest").mode("append")
         .option("path", path).option("statCols", "k").save())


def _drain(spark, path: str, ckpt: str, want_rows: int,
           **opts) -> list[int]:
    """Run the tail stream under a fast processingTime trigger until
    ``want_rows`` accumulate (or timeout); return per-batch row counts
    (foreachBatch runs driver-side: list capture works)."""
    sizes: list[int] = []
    reader = spark.readStream.format("graft_manifest").option(
        "path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (reader.load().writeStream
         .foreachBatch(lambda df, _: sizes.append(df.count()))
         .option("checkpointLocation", ckpt)
         .trigger(processingTime="250 milliseconds").start())
    deadline = time.time() + 90
    while time.time() < deadline and sum(sizes) < want_rows:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    return [s for s in sizes if s > 0]


def test_max_files_per_trigger_bounds_each_microbatch(spark, tmp_path):
    path = str(tmp_path / "t")
    _append_files(spark, path, 0, 4)
    sizes = _drain(spark, path, str(tmp_path / "ck"), 20,
                   maxFilesPerTrigger="1")
    assert sum(sizes) == 20          # everything drains exactly once
    assert max(sizes) <= 5           # never more than one file's rows
    assert len(sizes) >= 4           # one batch per file — from batch 1


def test_max_rows_per_trigger_admits_whole_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _append_files(spark, path, 0, 4)
    # budget of 10 rows = exactly two 5-row files per batch
    sizes = _drain(spark, path, str(tmp_path / "ck"), 20,
                   maxRowsPerTrigger="10")
    assert sum(sizes) == 20
    assert max(sizes) <= 10
    # a budget SMALLER than one file still makes progress (>=1 file)
    sizes2 = _drain(spark, path, str(tmp_path / "ck2"), 20,
                    maxRowsPerTrigger="3")
    assert sum(sizes2) == 20 and max(sizes2) <= 5


def test_rate_limited_restart_never_rewinds_or_duplicates(
        spark, tmp_path):
    """The hazard a rate-limited Python source must not have: a
    restarted query whose first capped poll computes an offset behind
    the checkpoint.  Spark replays the checkpoint's last batch through
    partitions() before polling, which re-syncs the cursor — pinned
    here by draining uncapped, appending more files, then restarting
    WITH a cap on the same checkpoint: no duplicates, no loss."""
    path = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ck")
    _append_files(spark, path, 0, 4)
    # phase 1: uncapped availableNow — checkpoint commits index 4
    q = (spark.readStream.format("graft_manifest").option("path", path)
         .load().writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 20
    _append_files(spark, path, 4, 2)
    # phase 2: restart the SAME checkpoint with a 1-file cap
    q2 = (spark.readStream.format("graft_manifest").option("path", path)
          .option("maxFilesPerTrigger", "1").load()
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .trigger(processingTime="250 milliseconds").start())
    deadline = time.time() + 90
    while (time.time() < deadline
           and spark.read.parquet(sink).count() < 30):
        time.sleep(0.5)
    q2.stop()
    q2.awaitTermination(30)
    got = sorted(r["k"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(30))  # complete, exactly once


def test_cdc_max_commits_per_trigger(spark, tmp_path):
    """maxCommitsPerTrigger on the change feed: a CDC backfill over a
    multi-commit history drains one commit per micro-batch (capped
    from batch 1 of a fresh stream) and still emits every change
    exactly once."""
    path = str(tmp_path / "t")
    _append_files(spark, path, 0, 4)
    versions: list[list[int]] = []
    q = (spark.readStream.format("graft_manifest").option("path", path)
         .option("readChangeFeed", "true").option("keyCols", "k")
         .option("maxCommitsPerTrigger", "1").load()
         .writeStream.foreachBatch(lambda df, _: versions.append(
             [r["commit_version"] for r in df.collect()]))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="250 milliseconds").start())
    deadline = time.time() + 90
    while (time.time() < deadline
           and sum(len(v) for v in versions) < 20):
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    batches = [v for v in versions if v]
    assert sum(len(v) for v in batches) == 20
    # each micro-batch carries exactly one commit's changes
    assert all(len(set(v)) == 1 for v in batches)
    assert sorted(v[0] for v in batches) == [0, 1, 2, 3]


def test_streaming_sink_inherits_hidden_partitioning(spark, tmp_path):
    """Hidden partitioning is TABLE state, so the exactly-once
    streaming sink inherits it with zero sink-side configuration:
    micro-batch appends land split per generated partition value,
    and time-range scans over the streamed table prune files."""
    import datetime

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
        read_manifest,
    )
    from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
        manifest_append_writer,
        run_foreach_batch,
    )

    register(spark)
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1 + i % 3, i % 24), float(i))
         for i in range(30)], "k long, ts timestamp, x double")
    # establish the table + spec with a seed batch write
    (df.limit(0).write.format("graft_manifest").mode("overwrite")
     .option("path", table).option("statCols", "k")
     .option("partitionGen", "d=date(ts)").save())
    df.repartition(2).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_foreach_batch(
        stream, manifest_append_writer(table, ["k"], "hpsink"), ckpt)
    m = load_manifest(table)
    live = [f for f in m["files"] if not f.get("dead")]
    assert live and all(
        f.get("partition") and "d" in f["partition"] for f in live)
    assert {f["partition"]["d"] for f in live} == {
        "2024-01-01", "2024-01-02", "2024-01-03"}
    pr = read_manifest(
        spark, table,
        filters=[("ts", ">=", datetime.datetime(2024, 1, 3))])
    assert len(pr.inputFiles()) < len(live)
    got = pr.filter("ts >= timestamp'2024-01-03'")
    assert got.count() == 10
    assert read_manifest(spark, table).count() == 30


def test_starting_version_skips_history_and_old_rewrites(
        spark, tmp_path):
    """startingVersion on the raw tail (Delta's option): the stream
    begins at the files appended by that version — earlier history
    (a fresh plain stream would emit the whole current snapshot) is
    never emitted, rewrites BEFORE the start never guard, and a
    rewrite AFTER the starting version still fails fast."""
    import pytest

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        compact_manifest,
    )

    path = str(tmp_path / "t")
    _append_files(spark, path, 0, 2)              # v0, v1
    compact_manifest(spark, path, ["k"], 100)     # v2: rewrite
    _append_files(spark, path, 2, 2)              # v3, v4

    def drain(ckpt: str, **opts):
        rows: list[int] = []
        reader = spark.readStream.format("graft_manifest").option(
            "path", path)
        for kk, vv in opts.items():
            reader = reader.option(kk, vv)
        q = (reader.load().writeStream
             .foreachBatch(lambda df, _: rows.extend(
                 r["k"] for r in df.collect()))
             .option("checkpointLocation", str(tmp_path / ckpt))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return sorted(rows)

    # a fresh plain stream emits the whole current snapshot (the v2
    # rewrite is BEFORE anything it consumed: no duplicate hazard)
    assert drain("ck_plain") == list(range(20))
    # startingVersion=3 skips history AND the old rewrite
    assert drain("ck_sv", startingVersion="3") == list(range(10, 20))
    # a rewrite AFTER the starting version still fails fast
    compact_manifest(spark, path, ["k"], 100)     # v5: rewrite
    _append_files(spark, path, 4, 1)              # v6
    with pytest.raises(Exception, match="rewrite|ignoreChanges"):
        drain("ck_sv2", startingVersion="3")


def test_drain_available_now_caps_every_batch_and_drains_all(
        spark, tmp_path):
    """The availableNow backfill contract (round 8): a capped backfill
    over a multi-file backlog drains EVERYTHING — in N>1 capped
    batches, exactly once — instead of stopping after the first
    capped batch (the Python-source wrapper limitation
    drain_available_now exists to close)."""
    from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
        drain_available_now,
    )

    path = str(tmp_path / "t")
    _append_files(spark, path, 0, 5)
    sizes: list[int] = []
    rows: list[int] = []

    def build():
        return (spark.readStream.format("graft_manifest")
                .option("path", path)
                .option("maxFilesPerTrigger", "1").load())

    def write(df, _bid):
        got = [r["k"] for r in df.collect()]
        if got:
            sizes.append(len(got))
            rows.extend(got)

    runs = drain_available_now(build, write, str(tmp_path / "ck"))
    assert runs == 5                      # one capped batch per file
    assert sizes == [5, 5, 5, 5, 5]       # every batch capped at 1 file
    assert sorted(rows) == list(range(25))  # full backlog, exactly once
    # a second drain on the same checkpoint is a no-op (0 runs)
    assert drain_available_now(build, write, str(tmp_path / "ck")) == 0
    assert sorted(rows) == list(range(25))


def test_drain_available_now_resumes_after_kill(spark, tmp_path):
    """Kill-and-resume mid-backfill: a drain stopped after a bounded
    number of runs picks up from the SAME checkpoint and finishes the
    backlog with no duplicates and no loss — the recovery story a
    capped backfill needs on a real cluster."""
    from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
        drain_available_now,
    )

    path = str(tmp_path / "t")
    _append_files(spark, path, 0, 6)
    rows: list[int] = []

    def build():
        return (spark.readStream.format("graft_manifest")
                .option("path", path)
                .option("maxRowsPerTrigger", "10").load())

    def write(df, _bid):
        rows.extend(r["k"] for r in df.collect())

    ckpt = str(tmp_path / "ck")
    # "crash" after 2 of the 3 needed runs (max_runs bounds the loop)
    first = drain_available_now(build, write, ckpt, max_runs=2)
    assert first == 2
    assert sorted(rows) == list(range(20))
    # resume on the same checkpoint: the rest, exactly once
    rest = drain_available_now(build, write, ckpt)
    assert rest >= 1
    assert sorted(rows) == list(range(30))
