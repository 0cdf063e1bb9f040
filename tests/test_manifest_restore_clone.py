"""RESTORE (roll the table back to an earlier version as a new
commit) and SHALLOW/DEEP CLONE (publish a new table referencing the
source's files) — the two snapshot-management ops table formats ship
on top of versioned metadata (Delta RESTORE / CREATE TABLE SHALLOW
CLONE; the reference's full-reload posture, scripts/main.py, has
neither).  Both are metadata-only: these tests pin zero-data-movement
alongside content correctness.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    clone_manifest,
    delete_vectors_from_manifest,
    load_manifest,
    register,
    restore_manifest,
    write_manifest_table,
)


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.year("o_orderdate").cast("int").alias("order_year"))


def _read(spark, path, **opts):
    r = spark.read.format("graft_manifest").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    """v0 = years < 1998 (2 files), v1 = append the rest (2 files)."""
    register(spark)
    path = str(tmp_path / "restore_orders")
    orders = _orders(spark, sf_dir)
    write_manifest_table(
        orders.filter(F.col("order_year") < 1998)
        .repartitionByRange(2, "order_year"), path,
        ["order_year", "o_orderkey"])
    (orders.filter(F.col("order_year") >= 1998)
     .repartitionByRange(2, "order_year")
     .write.format("graft_manifest").mode("append").option("path", path)
     .option("statCols", "order_year,o_orderkey").save())
    return path


def test_restore_rolls_back_appends(spark, sf_dir, table):
    pre = _read(spark, table, versionAsOf=0)
    pre_rows = pre.count()
    full_rows = _read(spark, table).count()
    assert full_rows > pre_rows

    m = restore_manifest(table, 0)
    assert m["version"] == 2
    got = _read(spark, table)
    assert got.count() == pre_rows
    assert (got.exceptAll(pre).isEmpty()
            and pre.exceptAll(got).isEmpty())
    # history is kept: the rolled-back state is still time-travelable
    assert _read(spark, table, versionAsOf=1).count() == full_rows
    # and restore of the restore goes forward again
    restore_manifest(table, 1)
    assert _read(spark, table).count() == full_rows


def test_restore_is_metadata_only_and_o_changed(table):
    before = set(glob.glob(os.path.join(table, "*.parquet")))
    m0 = load_manifest(table, 0)
    m1 = load_manifest(table)
    appended = len([f for f in m1["files"] if not f.get("dead")]) - len(
        [f for f in m0["files"] if not f.get("dead")])
    restore_manifest(table, 0)
    assert set(glob.glob(os.path.join(table, "*.parquet"))) == before, \
        "restore must not write or remove any data file"
    delta = json.load(open(os.path.join(
        table, "delta-v%08d.json" % 2)))
    assert delta.get("restoredFrom") == 0
    # O(changed files): only the appended files are tombstoned,
    # nothing is re-added, no DV churn
    assert len(delta.get("tombstone") or ()) == appended
    assert not delta.get("add")
    assert not delta.get("dvUpdate")


def test_restore_to_current_is_noop(table):
    v = load_manifest(table)["version"]
    assert restore_manifest(table, v)["version"] == v


def test_restore_undoes_dv_delete_and_bumps_gen(spark, sf_dir, table):
    doomed = (_read(spark, table).select("o_orderkey").limit(7))
    delete_vectors_from_manifest(doomed, table, ["o_orderkey"],
                                 ["order_year", "o_orderkey"])
    v_del = load_manifest(table)["version"]
    n_masked = _read(spark, table).count()
    m = restore_manifest(table, v_del - 1)
    got = _read(spark, table)
    assert got.count() == n_masked + 7, "DV rollback restores the rows"
    # every surviving file's dvGen moved PAST both snapshots' gens so
    # any in-flight DV planner fails its CAS instead of mis-applying
    for f in m["files"]:
        if f.get("dead"):
            continue
        assert not f.get("dv"), "restored state must carry no mask"
    # re-deleting afterwards still works (gen bump did not wedge DVs)
    delete_vectors_from_manifest(doomed, table, ["o_orderkey"],
                                 ["order_year", "o_orderkey"])
    assert _read(spark, table).count() == n_masked


def test_restore_re_adds_compacted_away_files(spark, sf_dir, table):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        compact_manifest,
    )

    v_pre = load_manifest(table)["version"]
    rows = _read(spark, table).count()
    compact_manifest(spark, table, ["order_year", "o_orderkey"],
                     small_file_rows=10**9)
    assert load_manifest(table)["version"] == v_pre + 1
    m = restore_manifest(table, v_pre)
    live = [f for f in m["files"] if not f.get("dead")]
    assert len(live) == 4, "pre-compaction layout is live again"
    assert _read(spark, table).count() == rows


def test_tail_stream_fail_fasts_on_restore(spark, sf_dir, table, tmp_path):
    # consume the whole table, then restore (a rewrite commit behind
    # the consumed offset) — the raw tail must refuse to continue
    out0 = str(tmp_path / "out0")
    ck = str(tmp_path / "ck")
    (spark.readStream.format("graft_manifest").option("path", table)
     .load().writeStream.format("parquet").option("path", out0)
     .option("checkpointLocation", ck).trigger(availableNow=True)
     .start().awaitTermination())
    restore_manifest(table, 0)
    q = (spark.readStream.format("graft_manifest").option("path", table)
         .load().writeStream.format("noop")
         .option("checkpointLocation", ck).trigger(availableNow=True)
         .start())
    with pytest.raises(Exception, match="re-emit|rewrite|ignoreChanges"):
        q.awaitTermination()


def test_shallow_clone_content_and_independence(spark, sf_dir, table,
                                                tmp_path):
    dst = str(tmp_path / "clone")
    m = clone_manifest(table, dst)
    assert m["version"] == 0
    src_df = _read(spark, table)
    got = _read(spark, dst)
    assert (got.exceptAll(src_df).isEmpty()
            and src_df.exceptAll(got).isEmpty())
    # zero copy: the clone dir holds no parquet data files
    assert not glob.glob(os.path.join(dst, "*.parquet"))

    # writes diverge independently in both directions
    extra = _orders(spark, sf_dir).limit(5)
    (extra.write.format("graft_manifest").mode("append")
     .option("path", dst)
     .option("statCols", "order_year,o_orderkey").save())
    assert _read(spark, dst).count() == src_df.count() + 5
    assert _read(spark, table).count() == src_df.count()
    (extra.write.format("graft_manifest").mode("append")
     .option("path", table)
     .option("statCols", "order_year,o_orderkey").save())
    assert _read(spark, dst).count() == src_df.count() + 5


def test_clone_at_version_and_nonempty_dst_refused(spark, sf_dir, table,
                                                   tmp_path):
    dst = str(tmp_path / "clone_v0")
    clone_manifest(table, dst, version=0)
    v0_rows = _read(spark, table, versionAsOf=0).count()
    assert _read(spark, dst).count() == v0_rows
    delta = json.load(open(os.path.join(dst, "delta-v%08d.json" % 0)))
    assert delta["clonedFrom"]["version"] == 0
    assert delta["clonedFrom"]["shallow"] is True
    with pytest.raises(ValueError, match="already a manifest table"):
        clone_manifest(table, dst)


def test_clone_carries_deletion_vectors(spark, sf_dir, table, tmp_path):
    doomed = _read(spark, table).select("o_orderkey").limit(9)
    delete_vectors_from_manifest(doomed, table, ["o_orderkey"],
                                 ["order_year", "o_orderkey"])
    masked = _read(spark, table).count()
    dst = str(tmp_path / "clone_dv")
    clone_manifest(table, dst)
    assert _read(spark, dst).count() == masked, \
        "clone must mask the source's deleted positions (DV sidecar)"


def test_deep_clone_survives_source_removal(spark, sf_dir, table,
                                            tmp_path):
    import shutil

    dst = str(tmp_path / "deep")
    clone_manifest(table, dst, copy_data=True)
    rows = _read(spark, table).count()
    shutil.rmtree(table)
    assert _read(spark, dst).count() == rows


def test_restore_across_drop_column(spark, sf_dir, tmp_path):
    """Restore to a pre-DROP-COLUMN version resurrects the wide schema
    and its values; restore forward again re-narrows."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        drop_column_from_manifest,
    )

    register(spark)
    path = str(tmp_path / "dropcol")
    orders = _orders(spark, sf_dir)
    write_manifest_table(orders.coalesce(1), path,
                         ["order_year", "o_orderkey"])
    drop_column_from_manifest(path, "total_price")
    assert "total_price" not in _read(spark, path).columns
    m = restore_manifest(path, 0)
    assert m["version"] == 2
    got = _read(spark, path)
    assert "total_price" in got.columns
    assert got.filter(F.col("total_price").isNull()).count() == 0
    restore_manifest(path, 1)
    assert "total_price" not in _read(spark, path).columns


def test_clone_of_schema_evolved_table(spark, sf_dir, tmp_path):
    """Cloning a table whose old files predate an added column keeps
    the NULL-fill alignment working through the clone's manifest."""
    register(spark)
    src = str(tmp_path / "evo_src")
    dst = str(tmp_path / "evo_clone")
    nat = load_table(spark, sf_dir, "nation")
    write_manifest_table(
        nat.filter(F.col("n_nationkey") < 20)
        .select("n_nationkey", "n_name").coalesce(1), src,
        ["n_nationkey"])
    (nat.filter(F.col("n_nationkey") >= 20)
     .select("n_nationkey", "n_name", "n_regionkey").coalesce(1)
     .write.format("graft_manifest").mode("append").option("path", src)
     .option("statCols", "n_nationkey").save())
    clone_manifest(src, dst)
    got = _read(spark, dst)
    assert "n_regionkey" in got.columns
    assert got.count() == nat.count()
    # pre-evolution files NULL-fill; post-evolution rows keep values
    assert (got.filter(F.col("n_nationkey") < 20)
            .filter(F.col("n_regionkey").isNotNull()).count() == 0)
    assert (got.filter(F.col("n_nationkey") >= 20)
            .filter(F.col("n_regionkey").isNull()).count() == 0)


def test_vacuum_after_restore_keeps_restored_data(spark, sf_dir, table):
    """Retention cleanup after a rollback: vacuum at keep_versions=1
    deletes the files only the rolled-back era referenced, keeps every
    file the restored state reads (including re-referenced sidecars),
    and the table stays byte-equal."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        vacuum_manifest,
    )

    pre = _read(spark, table, versionAsOf=0)
    rows = pre.count()
    restore_manifest(table, 0)
    res = vacuum_manifest(table, keep_versions=1, min_age_seconds=0)
    # the appended (now tombstoned) files are retention-expired
    assert len(res["removed_files"]) >= 2
    got = _read(spark, table)
    assert got.count() == rows
    assert (got.exceptAll(pre).isEmpty()
            and pre.exceptAll(got).isEmpty())


def test_restore_racing_append_restore_wins(spark, sf_dir, table):
    """Documented semantic: RESTORE means 'make the latest state equal
    version N'.  An append that lands between the restore's planning
    read and its claim is REBASED OVER — the restore tombstones it,
    exactly as it tombstones any other post-target file (the rows
    remain time-travelable at their own version)."""
    import json as _json

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        LocalFSClaimBackend,
        _delta_file,
        _invalidate_caches,
        set_claim_backend,
    )

    v0_rows = _read(spark, table, versionAsOf=0).count()
    next_v = load_manifest(table)["version"] + 1

    class _AppendOnce:
        def __init__(self, inner):
            self.inner = inner
            self.raced = False

        def put_if_absent(self, directory, name, payload):
            if not self.raced and name == _delta_file(next_v):
                self.raced = True
                # the "other writer": a competing metadata append-era
                # commit wins the contested version
                d = _json.loads(payload)
                competing = dict(d, restoredFrom=None, tombstone=None,
                                 add=None, dvUpdate=None,
                                 txn={"racer": 1})
                competing = {k: v for k, v in competing.items()
                             if v is not None}
                self.inner.put_if_absent(directory, name,
                                         _json.dumps(competing))
                _invalidate_caches()
                return False
            return self.inner.put_if_absent(directory, name, payload)

        def __getattr__(self, a):
            return getattr(self.inner, a)

    old = set_claim_backend(_AppendOnce(LocalFSClaimBackend()))
    try:
        m = restore_manifest(table, 0)
    finally:
        set_claim_backend(old)
    assert m["version"] == next_v + 1, "restore rebased past the racer"
    assert _read(spark, table).count() == v0_rows
    # the racer's commit is intact underneath
    assert load_manifest(table, next_v)["txn"].get("racer") == 1


def test_clone_carries_round8_state_restore_keeps_registry(
        spark, tmp_path):
    import shutil

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_generated_column,
        copy_into,
        load_manifest,
        read_manifest,
        restore_manifest,
        set_column_default,
        write_frame,
        write_manifest_table,
    )
    register(spark)
    src_tbl = str(tmp_path / "src")
    write_manifest_table(
        spark.createDataFrame([(1, 10.0)], "k long, v double"),
        src_tbl, ["k"])
    set_column_default(spark, src_tbl, "v", "7.0")
    add_generated_column(spark, src_tbl, "v2", "v * 2", backfill=True)
    land = str(tmp_path / "landing")
    os.makedirs(land)
    (spark.createDataFrame([(2, 1.0, 2.0)],
                           "k long, v double, v2 double")
     .coalesce(1).write.mode("overwrite").parquet(land + "/_t"))
    shutil.move(glob.glob(land + "/_t/*.parquet")[0],
                land + "/x.parquet")
    copy_into(spark, src_tbl, land + "/x.parquet")
    v_before_restore = load_manifest(src_tbl)["version"]

    # CLONE: DDL contracts AND the COPY INTO registry travel with it
    # (Databricks documents exactly this so incremental ingestion can
    # continue on the clone)
    dst = str(tmp_path / "dst")
    clone_manifest(src_tbl, dst)
    cm = load_manifest(dst)
    assert cm["columnDefaults"] == {"v": "7.0"}
    assert cm["generatedCols"] == {"v2": "v * 2"}
    # registry stamps REBASE to the clone's own version axis (v0):
    # expire_copy_registry must count clone versions, not the source's
    assert all(e["at"] == 0 for e in cm["copyInto"])
    r = copy_into(spark, dst, land + "/x.parquet")
    assert r["loadedFiles"] == 0 and r["skippedFiles"] == 1
    # defaults + generation enforced on the clone
    write_frame(spark.createDataFrame([(3,)], "k long"),
                dst, "append", statCols="k")
    row = read_manifest(spark, dst).filter("k = 3").collect()[0]
    assert (row["v"], row["v2"]) == (7.0, 14.0)

    # RESTORE: contracts roll back with the schema; the registry keeps
    # the exactly-once memory (documented at the delta composition)
    restore_manifest(src_tbl, 0)
    rm = load_manifest(src_tbl)
    assert rm["columnDefaults"] == {}
    assert rm["generatedCols"] == {}
    assert len(rm["copyInto"]) == 1
    assert load_manifest(src_tbl)["version"] == v_before_restore + 1
