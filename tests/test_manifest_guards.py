"""Round-6 protocol guards: raw-tail fail-fast on rewrite commits,
append-vs-append key conflicts (appendKeys), overwrite_where scope
conflicts, CDC non-append-window detection, DV re-delete masking, and
the CDC sink's pre-image rejection.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    ManifestArrowWriter,
    _FileCommit,
    _delta_file,
    load_manifest,
    overwrite_where,
    register,
    write_manifest_table,
)


def _nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name")


def _drain_tail(spark, path, ckpt, sink, extra=None):
    r = (spark.readStream.format("graft_manifest").option("path", path))
    if extra:
        for k, v in extra.items():
            r = r.option(k, v)
    q = (r.load().writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.read.parquet(sink)


# --- task 3: raw tail fails fast on rewrite commits ------------------

def test_raw_tail_fails_on_rewrite_unless_opted_in(
        spark, sf_dir, tmp_path):
    """A stream that consumed files a later MERGE rewrote must FAIL at
    the next batch (silent duplicates otherwise); ignoreChanges=true
    restores the old Delta-ignoreChanges duplicate semantics."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        merge_into_manifest,
    )

    path = str(tmp_path / "tailfail")
    nat = _nation(spark, sf_dir)
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
    assert _drain_tail(spark, path, ckpt, sink).count() == 25
    # rewrite: key 0 merged → its file tombstoned + rewritten
    merge_into_manifest(
        spark.createDataFrame([(0, "ZED")],
                              "n_nationkey long, n_name string"),
        path, ["n_nationkey"], ["n_nationkey"])
    with pytest.raises(Exception, match="ignoreChanges"):
        _drain_tail(spark, path, ckpt, sink)
    # opt-in: duplicates accepted explicitly, the stream proceeds and
    # re-emits the rewrite output (24 copied rows + 1 merged row)
    ckpt2, sink2 = str(tmp_path / "ck2"), str(tmp_path / "out2")
    first = _drain_tail(spark, path, ckpt2, sink2,
                        {"ignoreChanges": "true"}).count()
    merge_into_manifest(
        spark.createDataFrame([(1, "ONE")],
                              "n_nationkey long, n_name string"),
        path, ["n_nationkey"], ["n_nationkey"])
    total = _drain_tail(spark, path, ckpt2, sink2,
                        {"ignoreChanges": "true"}).count()
    assert total == first + 25  # full rewrite output re-emitted


def test_raw_tail_append_only_and_dv_commits_still_stream(
        spark, sf_dir, tmp_path):
    """The fail-fast must not regress the supported cases: plain
    appends tail exactly-once, and a pure deletion-vector commit (no
    tombstones) passes the guard."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_vectors_from_manifest,
    )

    path = str(tmp_path / "tailok")
    nat = _nation(spark, sf_dir)
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
    assert _drain_tail(spark, path, ckpt, sink).count() == 25
    delete_vectors_from_manifest(
        spark.createDataFrame([(3,)], "n_nationkey long"),
        path, ["n_nationkey"], ["n_nationkey"])
    (spark.createDataFrame([(90, "NEW")],
                           "n_nationkey long, n_name string")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    total = _drain_tail(spark, path, ckpt, sink).count()
    assert total == 26  # only the appended row; DV commit emits nothing


# --- task 4: appendKeys closes append-vs-append ----------------------

def _staged_msg(spark, path, w, key):
    """Stage a 1-row parquet for a hand-driven writer commit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    stage = os.path.join(path, f".race.{w._commit_id}.{key}.tmp")
    pq.write_table(
        pa.table({"n_nationkey": pa.array([key], pa.int64()),
                  "n_name": pa.array([f"k{key}"])}), stage)
    return _FileCommit(
        tmp_path=stage,
        final_path=os.path.join(
            path, f"part-race-{w._commit_id}-{key}.parquet"),
        rows=1, stats={"n_nationkey": {"min": key, "max": key}})


def test_append_keys_conflicts_racing_same_key_append(
        spark, sf_dir, tmp_path):
    """Two racing PLAIN appends inserting the same key: the second to
    commit fails with a serializable conflict when appendKeys is set —
    the WriteSerializable residual the merge path already closed."""
    path = str(tmp_path / "ak")
    nat = _nation(spark, sf_dir)
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    schema = spark.createDataFrame(
        [], "n_nationkey long, n_name string").schema
    # writer 2 plans FIRST (captures read version 0)...
    w2 = ManifestArrowWriter(
        {"path": path, "statcols": "n_nationkey",
         "appendkeys": "n_nationkey"}, schema, overwrite=False)
    # ...then writer 1 lands key 77
    (spark.createDataFrame([(77, "FIRST")],
                           "n_nationkey long, n_name string")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey")
     .option("appendKeys", "n_nationkey").save())
    msg = _staged_msg(spark, path, w2, 77)
    with pytest.raises(ValueError, match="appendKeys"):
        w2.commit([msg])
    # the refused commit unpublished its file; the winner's row stands
    assert not os.path.exists(msg.final_path)
    rows = [r["n_name"] for r in
            (spark.read.format("graft_manifest").option("path", path)
             .load().filter("n_nationkey = 77").collect())]
    assert rows == ["FIRST"]


def test_append_keys_disjoint_ranges_both_land(spark, sf_dir, tmp_path):
    """Racing appends with DISJOINT key ranges both commit — the stats
    ladder proves no intersection, so no false conflict."""
    path = str(tmp_path / "akd")
    nat = _nation(spark, sf_dir)
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    schema = spark.createDataFrame(
        [], "n_nationkey long, n_name string").schema
    w2 = ManifestArrowWriter(
        {"path": path, "statcols": "n_nationkey",
         "appendkeys": "n_nationkey"}, schema, overwrite=False)
    (spark.createDataFrame([(500, "FIRST")],
                           "n_nationkey long, n_name string")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey")
     .option("appendKeys", "n_nationkey").save())
    w2.commit([_staged_msg(spark, path, w2, 600)])
    got = (spark.read.format("graft_manifest").option("path", path)
           .load().filter("n_nationkey >= 500").count())
    assert got == 2


def test_append_keys_requires_stat_cols(spark):
    """appendKeys without stats on the key column is refused loudly —
    detection reasons from per-file min/max."""
    schema = spark.createDataFrame([], "k long, v string").schema
    with pytest.raises(ValueError, match="statCols"):
        ManifestArrowWriter({"path": "/tmp/x", "statcols": "v",
                             "appendkeys": "k"}, schema, overwrite=False)


# --- ADVICE A2: overwrite_where scope conflict -----------------------

def test_overwrite_where_detects_racing_in_scope_append(
        spark, sf_dir, tmp_path, monkeypatch):
    """A plain append of IN-SCOPE rows racing between the backfill's
    planning read and its commit fails the backfill (it would survive
    the 'replace every row in [lo, hi]' commit otherwise); an
    out-of-scope racer does not conflict."""
    import data_engineering_pipeline_project_cloud_spark.sources.manifest_source as ms

    path = str(tmp_path / "owr")
    nat = _nation(spark, sf_dir)
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])

    real = ms._masked_spark_read
    racer_key = {"k": 5}

    def race_then_read(spark_, st, entries):
        k = racer_key["k"]
        if k is not None:
            racer_key["k"] = None
            (spark.createDataFrame([(k, "RACER")],
                                   "n_nationkey long, n_name string")
             .coalesce(1).write.format("graft_manifest").mode("append")
             .option("path", path).option("statCols", "n_nationkey")
             .save())
        return real(spark_, st, entries)

    monkeypatch.setattr(ms, "_masked_spark_read", race_then_read)
    repl = spark.createDataFrame(
        [(i, "BF") for i in range(0, 10)],
        "n_nationkey long, n_name string")
    with pytest.raises(Exception, match="serializable conflict"):
        overwrite_where(repl, path, "n_nationkey", 0, 9,
                        ["n_nationkey"])
    # racer's row survived, backfill landed nothing
    rows = {r["n_name"] for r in
            (spark.read.format("graft_manifest").option("path", path)
             .load().filter("n_nationkey = 5").collect())}
    assert "RACER" in rows and "BF" not in rows
    # out-of-scope racer: no conflict, backfill lands
    racer_key["k"] = 80
    out = overwrite_where(repl, path, "n_nationkey", 0, 9,
                          ["n_nationkey"])
    assert out["version"] >= 3
    df = (spark.read.format("graft_manifest").option("path", path)
          .load())
    assert df.filter("n_nationkey = 5").collect()[0]["n_name"] == "BF"
    assert df.filter("n_nationkey = 80").count() == 1


# --- ADVICE A1: CDC window non-append detection ----------------------

def test_cdc_refuses_non_append_commit_in_window(
        spark, sf_dir, tmp_path):
    """An overwrite whose post-publish cleanup was interrupted leaves
    pre-overwrite history behind; the CDC planner (and the incremental
    changefeed) must refuse the garbled window with a clear error, not
    emit an empty/mis-paired change set."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _invalidate_caches,
        manifest_changes_incremental,
    )

    path = str(tmp_path / "cdctrunc")
    nat = _nation(spark, sf_dir)
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])  # v0
    (nat.filter("n_nationkey < 5").coalesce(1)
     .write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    # simulate an overwrite at v2 whose cleanup never ran: hand-craft
    # a truncating delta that resets the list to one copied file
    m = load_manifest(path)
    src = m["files"][0]
    copy = os.path.join(path, "part-v0002-feedface-00000.parquet")
    shutil.copy(src["path"], copy)
    delta = {"version": 2, "truncate": True, "schema": m["schema"],
             "txn": {}, "droppedCols": {}, "committedAt": 0.0,
             "add": [{"path": copy, "rows": src["rows"],
                      "stats": src["stats"]}]}
    with open(os.path.join(path, _delta_file(2)), "w") as fh:
        json.dump(delta, fh)
    _invalidate_caches()
    with pytest.raises(Exception, match="non-append commit"):
        manifest_changes_incremental(spark, path, 0, 2,
                                     ["n_nationkey"]).collect()
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (spark.readStream.format("graft_manifest")
         .option("path", path).option("readChangeFeed", "true")
         .option("keyCols", "n_nationkey").load()
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="non-append commit"):
        q.awaitTermination(120)
        raise AssertionError("stream should have failed")


# --- ADVICE A4: DV discovery masks already-deleted positions ---------

def test_dv_redelete_does_not_recount_dead_positions(
        spark, sf_dir, tmp_path):
    """Erasure batches over overlapping keys: positions earlier DV
    commits already deleted no longer count against max_dv_rows, so a
    re-delete of 5 dead keys + 1 live key stays a pure-metadata DV
    commit under a cap of 1 instead of spuriously forcing the
    copy-on-write fallback."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_vectors_from_manifest,
    )

    path = str(tmp_path / "redel")
    nat = _nation(spark, sf_dir)
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    first = spark.createDataFrame([(i,) for i in range(5)],
                                  "n_nationkey long")
    delete_vectors_from_manifest(first, path, ["n_nationkey"],
                                 ["n_nationkey"], max_dv_rows=10)
    m1 = load_manifest(path)
    assert not any(f.get("dead") for f in m1["files"])
    again = spark.createDataFrame([(i,) for i in range(6)],
                                  "n_nationkey long")
    m2 = delete_vectors_from_manifest(again, path, ["n_nationkey"],
                                      ["n_nationkey"], max_dv_rows=1)
    # still merge-on-read: no tombstones, one more DV generation
    assert not any(f.get("dead") for f in m2["files"])
    assert sum(f.get("dvRows", 0) for f in m2["files"]) == 6
    got = (spark.read.format("graft_manifest").option("path", path)
           .load().count())
    assert got == 19
    # idempotent re-delete of only-dead keys: pure no-op, no commit
    m3 = delete_vectors_from_manifest(first, path, ["n_nationkey"],
                                      ["n_nationkey"], max_dv_rows=1)
    assert m3["version"] == m2["version"]


# --- ADVICE A3: CDC apply sink rejects pre-image streams -------------

def test_cdc_apply_writer_rejects_preimage_rows(spark, tmp_path):
    """cdc_apply_writer consumes post-image semantics; an
    updatePreimages=true stream ties pre/post rows on commit_version,
    so the sink must fail loudly instead of nondeterministically
    upserting a stale pre-image."""
    from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
        cdc_apply_writer,
    )

    w = cdc_apply_writer(str(tmp_path / "t"), ["k"], ["k"], "app")
    batch = spark.createDataFrame(
        [(1, "old", "update_preimage", 4),
         (1, "new", "update_postimage", 4)],
        "k long, v string, change_type string, commit_version long")
    with pytest.raises(ValueError, match="update_preimage"):
        w(batch, 0)
