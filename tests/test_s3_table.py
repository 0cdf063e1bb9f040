"""Manifest tables on S3-compatible OBJECT STORAGE (round 8,
sources/table_fs.py): data files, delta records, checkpoints, and
sidecars all live in the bucket; the version claim is an S3
conditional PUT of the delta record itself.

Runs against the in-process stdlib fake S3 (tests/fake_s3.py) on the
port tests/conftest.py reserved BEFORE the JVM launched — so the
Python DataSource's worker-side reads reach it too.  The pieces the
fake can't host — Spark's own s3a:// parquet IO (needs the hadoop-aws
jars) — are covered by the GATED live MinIO test in
tests/test_object_store.py.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

import data_engineering_pipeline_project_cloud_spark.sources.manifest_source as ms
from data_engineering_pipeline_project_cloud_spark.sources import table_fs as tfs


@pytest.fixture(scope="module", autouse=True)
def fake_s3():
    import fake_s3 as f3

    state = f3._State()
    handler = type("H", (f3._Handler,), {"state": state})
    from http.server import ThreadingHTTPServer

    port = int(os.environ["SPARK_GRAFT_FAKE_S3_PORT"])
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    import threading

    threading.Thread(target=srv.serve_forever, daemon=True).start()
    tfs._S3FS = None  # rebuild against this endpoint
    yield state
    srv.shutdown()


def _table(name: str | None = None) -> str:
    return f"s3://bkt/{name or uuid.uuid4().hex[:8]}"


def _commit_rows(spark, path: str, rows: list[int],
                 overwrite: bool = False) -> None:
    """One real commit through the full protocol: parquet staged to
    the bucket, attempt-unique name renamed into place (S3 copy+
    delete), version claimed with a conditional PUT of the delta."""
    w = ms.ManifestArrowWriter({"path": path, "statcols": "k"},
                               spark.createDataFrame(
                                   [(1,)], "k long").schema, overwrite)
    staged = f"{path}/.stage-{w._commit_id}/d.parquet"
    tfs.write_parquet(pa.table({"k": pa.array(rows, pa.int64())}),
                      staged)
    final = (f"{path}/part-v{w._name_version:04d}-{w._commit_id}"
             "-00000.parquet")
    w.commit([ms._FileCommit(
        tmp_path=staged, final_path=final, rows=len(rows),
        stats={"k": {"min": min(rows), "max": max(rows)}})])


def test_metadata_lives_in_the_bucket(spark, fake_s3):
    path = _table()
    _commit_rows(spark, path, [1, 2, 3], overwrite=True)
    _commit_rows(spark, path, [10, 11])
    prefix = path.split("://", 1)[1]
    keys = sorted(k for k in fake_s3.objects if k.startswith(prefix))
    assert any(k.endswith("delta-v00000000.json") for k in keys)
    assert any(k.endswith("delta-v00000001.json") for k in keys)
    assert sum(k.endswith(".parquet") for k in keys) == 2
    m = ms.load_manifest(path)
    assert m["version"] == 1
    assert sum(f["rows"] for f in m["files"] if not f.get("dead")) == 5
    # stats harvested into the delta exactly as on local tables
    assert m["files"][0]["stats"]["k"] == {"min": 1, "max": 3}


def test_read_and_time_travel_through_the_datasource(spark, fake_s3):
    """The registered Python DataSource reads the bucket table end to
    end (worker-side pyarrow S3), filters prune files from manifest
    stats, and versionAsOf reconstructs the pre-append snapshot."""
    path = _table()
    ms.register(spark)
    _commit_rows(spark, path, [1, 2, 3], overwrite=True)
    _commit_rows(spark, path, [10, 11])
    df = (spark.read.format("graft_manifest").option("path", path)
          .load())
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3, 10, 11]
    # stats pruning still applies (driver-side, manifest stats)
    assert df.filter(F.col("k") >= 10).count() == 2
    v0 = (spark.read.format("graft_manifest").option("path", path)
          .option("versionAsOf", "0").load())
    assert sorted(r["k"] for r in v0.collect()) == [1, 2, 3]


def test_conditional_put_arbitrates_racing_commits(spark, fake_s3):
    path = _table()
    _commit_rows(spark, path, [1], overwrite=True)
    # a duplicate claim of the SAME version loses cleanly
    assert not ms._claim(path, ms._delta_file(0), json.dumps({}))
    assert ms._claim(path, ms._delta_file(1), json.dumps(
        {"version": 1, "schema": ms.load_manifest(path)["schema"],
         "add": [], "committedAt": 0}))


def test_checkpoint_and_sidecarless_vacuum_on_bucket(spark, fake_s3):
    """Checkpoint parquet lands in the bucket and reconstruction reads
    it back; vacuum expires a superseded overwrite's files from the
    bucket (retention-governed overwrite + object-store sweep)."""
    path = _table()
    ms.register(spark)
    _commit_rows(spark, path, [1, 2], overwrite=True)
    _commit_rows(spark, path, [3])
    st = ms._load_state(path, 1)
    ms._write_checkpoint(path, st)
    assert any(k.endswith("checkpoint-v00000001.parquet")
               for k in fake_s3.objects)
    ms._STATE_CACHE.clear()
    ms._invalidate_caches()
    m = ms.load_manifest(path)
    assert m["version"] == 1
    assert sum(f["rows"] for f in m["files"] if not f.get("dead")) == 3
    # supersede everything, then vacuum with the age guard off
    _commit_rows(spark, path, [9, 9, 9], overwrite=True)
    rep = ms.vacuum_manifest(path, keep_versions=1, min_age_seconds=0)
    assert rep["removed_files"], "old version's files must be swept"
    prefix = path.split("://", 1)[1]
    live = {k for k in fake_s3.objects
            if k.startswith(prefix) and k.endswith(".parquet")
            and "checkpoint" not in k}
    assert len(live) == 1  # only the latest overwrite's data file
    df = (spark.read.format("graft_manifest").option("path", path)
          .load())
    assert [r["k"] for r in df.collect()] == [9, 9, 9]


def test_python_arrow_writer_refuses_bucket_tables(spark, fake_s3):
    ms.register(spark)
    with pytest.raises(Exception, match="write_frame|local"):
        (spark.range(3).selectExpr("id as k")
         .write.format("graft_manifest").mode("append")
         .option("path", _table()).option("statCols", "k").save())


def test_streaming_tail_from_bucket_table(spark, fake_s3):
    """The manifest tail STREAM reads an object-store table: offsets
    resolve from bucket metadata, partitions read data via the Arrow
    S3 filesystem in the stream runner, and a second commit arrives
    on the same checkpoint exactly once."""
    path = _table()
    ms.register(spark)
    _commit_rows(spark, path, [1, 2, 3], overwrite=True)
    rows: list[int] = []

    def drain(ckpt: str) -> None:
        q = (spark.readStream.format("graft_manifest")
             .option("path", path).load()
             .writeStream.foreachBatch(
                 lambda df, _: rows.extend(
                     r["k"] for r in df.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    import tempfile

    ckpt = tempfile.mkdtemp(prefix="s3tailck")
    drain(ckpt)
    assert sorted(rows) == [1, 2, 3]
    _commit_rows(spark, path, [10, 11])
    drain(ckpt)
    assert sorted(rows) == [1, 2, 3, 10, 11]


def test_fsck_and_shallow_clone_on_bucket_tables(spark, fake_s3):
    """fsck audits a bucket table (footer row counts from the bucket,
    orphan listing); a shallow clone of it into ANOTHER bucket prefix
    references the source files zero-copy, reads independently, and a
    deep clone copies the bytes."""
    path = _table()
    ms.register(spark)
    _commit_rows(spark, path, [1, 2, 3], overwrite=True)
    _commit_rows(spark, path, [10, 11])
    rep = ms.fsck_manifest(path)
    assert rep["ok"], rep
    # orphan detection: drop an unreferenced object into the prefix
    tfs.write_parquet(__import__("pyarrow").table({"k": [0]}),
                      f"{path}/part-v9999-orphan-00000.parquet")
    rep = ms.fsck_manifest(path)
    assert not rep["ok"] and len(rep["orphan_files"]) == 1
    tfs.remove(f"{path}/part-v9999-orphan-00000.parquet")
    # shallow clone into a fresh prefix
    dst = _table()
    ms.clone_manifest(path, dst)
    got = (spark.read.format("graft_manifest").option("path", dst)
           .load())
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 3, 10, 11]
    prefix = dst.split("://", 1)[1]
    assert not any(k.startswith(prefix) and k.endswith(".parquet")
                   for k in fake_s3.objects), "shallow = zero copy"
    # deep clone copies bytes into its own prefix
    deep = _table()
    ms.clone_manifest(path, deep, copy_data=True)
    dprefix = deep.split("://", 1)[1]
    assert sum(k.startswith(dprefix) and k.endswith(".parquet")
               for k in fake_s3.objects) == 2
    got2 = (spark.read.format("graft_manifest").option("path", deep)
            .load())
    assert sorted(r["k"] for r in got2.collect()) == [1, 2, 3, 10, 11]


def test_copy_into_lists_object_store_sources(spark, fake_s3):
    """Round 9: COPY INTO lists s3:// prefixes and globs through
    table_fs' pyarrow filesystem (Databricks posture) instead of
    requiring explicit URI lists; hidden/underscore SEGMENTS are
    skipped; identities stay the verbatim URIs (the 9b3ae6f
    contract)."""
    base = f"s3://bkt/landing-{uuid.uuid4().hex[:8]}"
    for key in ("a.parquet", "b.parquet", "sub/c.parquet",
                "_temporary/0/t.parquet", ".staging/s.parquet"):
        tfs.write_bytes(f"{base}/{key}", b"x")
    # directory/prefix listing, recursive, hidden segments pruned
    assert ms._list_remote_source(base) == [
        f"{base}/a.parquet", f"{base}/b.parquet",
        f"{base}/sub/c.parquet"]
    assert ms._list_remote_source(base + "/") == \
        ms._list_remote_source(base)
    # glob against the non-glob prefix
    assert ms._list_remote_source(f"{base}/a*.parquet") == [
        f"{base}/a.parquet"]
    # a plain existing key is itself; a missing one lists nothing
    assert ms._list_remote_source(f"{base}/a.parquet") == [
        f"{base}/a.parquet"]
    assert ms._list_remote_source(f"{base}/nope.parquet") == []


def test_copy_into_s3_prefix_skips_registered_before_any_read(
        spark, fake_s3, tmp_path):
    """The idempotent re-run path against an s3 PREFIX source: all
    listed URIs already registered → copy_into returns skip counts
    without touching Spark's reader (this container has no s3a jars,
    which also proves the skip happens BEFORE the data plane)."""
    base = f"s3://bkt/reg-{uuid.uuid4().hex[:8]}"
    for key in ("a.parquet", "b.parquet"):
        tfs.write_bytes(f"{base}/{key}", b"x")
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1,), (2,)], "k long")
    # seed the registry in the same atomic commit shape copy_into
    # uses (copyFiles option), with the VERBATIM URIs
    ms.write_frame(df, path, "append", statCols="k",
                   copyFiles=json.dumps(
                       [f"{base}/a.parquet", f"{base}/b.parquet"]))
    res = ms.copy_into(spark, path, base)
    assert res == {"loadedFiles": 0, "skippedFiles": 2,
                   "version": ms.load_manifest(path)["version"]}
