"""Deletion vectors (merge-on-read DELETE) for the manifest table
(sources/manifest_source.py:delete_vectors_from_manifest): metadata-only
deletes, masked reads, time travel, the copy-on-write fallback cap,
OPTIMIZE materialization, CDC emission, changefeed parity, and the
two-sided concurrency guards (dvState / touched-file CAS check).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    compact_manifest,
    delete_vectors_from_manifest,
    fsck_manifest,
    load_manifest,
    manifest_changes,
    manifest_changes_incremental,
    merge_into_manifest,
    register,
    write_manifest_table,
)


@pytest.fixture()
def dv_table(spark, sf_dir, tmp_path):
    """nation as a 3-file manifest table (v0) with keys 0..24."""
    path = str(tmp_path / "dv")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name")
    write_manifest_table(
        nat.repartitionByRange(3, "n_nationkey"), path, ["n_nationkey"])
    register(spark)
    return path


def _keys(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals],
                                 "n_nationkey long")


def _read(spark, path, **opts):
    r = spark.read.format("graft_manifest").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_dv_delete_is_metadata_only(spark, dv_table):
    """A DV delete writes NO data file: the file set is byte-identical,
    one new manifest version records the bitmaps, reads mask the rows,
    time travel still sees them, and a second delete ORs in."""
    m0 = load_manifest(dv_table)
    files0 = sorted(f["path"] for f in m0["files"])
    sizes0 = {p: os.path.getsize(p) for p in files0}
    m1 = delete_vectors_from_manifest(
        _keys(spark, [2, 3, 11]), dv_table,
        ["n_nationkey"], ["n_nationkey"])
    assert m1["version"] == m0["version"] + 1
    assert sorted(f["path"] for f in m1["files"]) == files0
    assert {p: os.path.getsize(p) for p in files0} == sizes0
    assert sum(f.get("dvRows", 0) for f in m1["files"]) == 3
    assert all(f.get("dvGen", 0) == 1 for f in m1["files"] if f.get("dv"))
    got = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert got == set(range(25)) - {2, 3, 11}
    # pre-delete snapshot unaffected
    tt = _read(spark, dv_table, versionAsOf=m0["version"])
    assert tt.count() == 25
    # second delete ORs into the same vectors (no file change either)
    m2 = delete_vectors_from_manifest(
        _keys(spark, [3, 20]), dv_table, ["n_nationkey"], ["n_nationkey"])
    assert sorted(f["path"] for f in m2["files"]) == files0
    got2 = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert got2 == set(range(25)) - {2, 3, 11, 20}
    assert fsck_manifest(dv_table)["ok"]


def test_dv_pushdown_filter_on_masked_table(spark, dv_table):
    """Stats pruning composes with the mask: a pushed filter never
    resurrects a deleted row, and a deleted key's file still prunes."""
    delete_vectors_from_manifest(
        _keys(spark, [5]), dv_table, ["n_nationkey"], ["n_nationkey"])
    assert _read(spark, dv_table).filter("n_nationkey = 5").count() == 0
    assert _read(spark, dv_table).filter("n_nationkey = 6").count() == 1


def test_dv_falls_back_to_copy_on_write_past_cap(spark, dv_table):
    """max_dv_rows is the mask-health cap: a delete whose positions
    exceed it rewrites files (delete_from_manifest) instead of
    recording a giant vector — same final state, no dv entries."""
    m0 = load_manifest(dv_table)
    files0 = {f["path"] for f in m0["files"]}
    m1 = delete_vectors_from_manifest(
        _keys(spark, range(0, 20)), dv_table,
        ["n_nationkey"], ["n_nationkey"], max_dv_rows=5)
    # copy-on-write: replaced files tombstoned, new files appended
    assert any(f.get("dead") for f in m1["files"])
    assert {f["path"] for f in m1["files"]} != files0
    assert not any(f.get("dv") for f in m1["files"])
    got = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert got == set(range(20, 25))


def test_dv_merge_does_not_resurrect(spark, dv_table):
    """A MERGE whose rewrite scope includes DV'd files reads them
    MASKED: deleted keys stay deleted through the rewrite, and the
    rewritten files carry no vector."""
    delete_vectors_from_manifest(
        _keys(spark, [1, 2]), dv_table, ["n_nationkey"], ["n_nationkey"])
    merge_into_manifest(
        spark.createDataFrame([(3, "PATCHED")],
                              "n_nationkey long, n_name string"),
        dv_table, ["n_nationkey"], ["n_nationkey"])
    rows = {r["n_nationkey"]: r["n_name"]
            for r in _read(spark, dv_table).collect()}
    assert 1 not in rows and 2 not in rows
    assert rows[3] == "PATCHED"
    assert not any(f.get("dv") for f in load_manifest(dv_table)["files"]
                   if not f.get("dead"))


def test_dv_compaction_materializes(spark, dv_table):
    """OPTIMIZE pays down DV debt: DV'd files compact regardless of
    size, deleted rows are physically dropped, vectors cleared."""
    delete_vectors_from_manifest(
        _keys(spark, [0, 10, 24]), dv_table,
        ["n_nationkey"], ["n_nationkey"])
    m = compact_manifest(spark, dv_table, ["n_nationkey"], 1_000_000)
    live = [f for f in m["files"] if not f.get("dead")]
    assert not any(f.get("dv") for f in live)
    assert sum(f["rows"] for f in live) == 22
    got = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert got == set(range(25)) - {0, 10, 24}


def test_dv_changefeed_full_and_incremental_agree(spark, dv_table):
    """Both changefeed forms report a DV commit as plain deletes; the
    incremental form reads ONLY the re-vectored file (both sides of
    it), not the untouched files."""
    from pyspark.sql.readwriter import DataFrameReader

    v0 = load_manifest(dv_table)["version"]
    delete_vectors_from_manifest(
        _keys(spark, [4, 21]), dv_table, ["n_nationkey"], ["n_nationkey"])
    full = {(r["n_nationkey"], r["change_type"])
            for r in manifest_changes(
                spark, dv_table, v0, None, ["n_nationkey"]).collect()}
    assert full == {(4, "delete"), (21, "delete")}

    opened: list[str] = []
    real = DataFrameReader.parquet

    def spy(self, *paths):
        opened.extend(paths)
        return real(self, *paths)

    import unittest.mock as mock

    with mock.patch.object(DataFrameReader, "parquet", spy):
        inc = {(r["n_nationkey"], r["change_type"])
               for r in manifest_changes_incremental(
                   spark, dv_table, v0, None, ["n_nationkey"]).collect()}
    assert inc == full
    m = load_manifest(dv_table)
    dv_paths = {f["path"] for f in m["files"] if f.get("dv")}
    live = {f["path"] for f in m["files"] if not f.get("dead")}
    assert set(opened) == dv_paths  # only re-vectored files opened
    assert len(dv_paths) < len(live)


def test_dv_cdc_stream_emits_position_deletes(spark, dv_table, tmp_path):
    """The CDC stream turns a DV commit into delete rows (pre-images by
    position — no key join), alongside the v0 inserts."""
    delete_vectors_from_manifest(
        _keys(spark, [7, 13]), dv_table, ["n_nationkey"], ["n_nationkey"])
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    q = (spark.readStream.format("graft_manifest")
         .option("path", dv_table).option("readChangeFeed", "true")
         .option("keyCols", "n_nationkey").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    res = spark.read.parquet(out)
    dels = {r["n_nationkey"]
            for r in res.filter("change_type = 'delete'").collect()}
    assert dels == {7, 13}
    assert res.filter("change_type = 'insert'").count() == 25


def test_dv_commit_fails_racing_rewrite(spark, dv_table, monkeypatch):
    """A MERGE that tombstones a file between the DV delete's planning
    read and its CAS claim fails the DV commit (touched-file check) —
    the delete never lands on a stale file."""
    import data_engineering_pipeline_project_cloud_spark.sources.manifest_source as ms

    real = ms._files_possibly_containing
    fired = {"done": False}

    def race_then_plan(files, key_cols, bounds, keys_sorted):
        out = real(files, key_cols, bounds, keys_sorted)
        if not fired["done"]:
            fired["done"] = True
            merge_into_manifest(
                spark.createDataFrame([(2, "RACER")],
                                      "n_nationkey long, n_name string"),
                dv_table, ["n_nationkey"], ["n_nationkey"])
        return out

    monkeypatch.setattr(ms, "_files_possibly_containing", race_then_plan)
    with pytest.raises(Exception, match="concurrent modification"):
        delete_vectors_from_manifest(
            _keys(spark, [2]), dv_table, ["n_nationkey"], ["n_nationkey"])
    # the racer's merge is intact; key 2 was NOT deleted
    rows = {r["n_nationkey"]: r["n_name"]
            for r in _read(spark, dv_table).collect()}
    assert rows[2] == "RACER"


def test_rewrite_fails_racing_dv_commit(spark, dv_table, monkeypatch):
    """The reverse race: a DV delete landing between a MERGE's planning
    read and its commit fails the MERGE (dvState check) — the rewrite
    cannot resurrect the freshly deleted rows."""
    import data_engineering_pipeline_project_cloud_spark.sources.manifest_source as ms

    real = ms._masked_spark_read
    fired = {"done": False}

    def race_then_read(spark_, st, entries):
        if not fired["done"]:
            fired["done"] = True
            delete_vectors_from_manifest(
                _keys(spark, [1]), dv_table,
                ["n_nationkey"], ["n_nationkey"])
        return real(spark_, st, entries)

    monkeypatch.setattr(ms, "_masked_spark_read", race_then_read)
    with pytest.raises(Exception, match="deletion vector changed"):
        merge_into_manifest(
            spark.createDataFrame([(0, "PATCHED")],
                                  "n_nationkey long, n_name string"),
            dv_table, ["n_nationkey"], ["n_nationkey"])
    # the DV delete won: key 1 is gone, key 0 unpatched
    rows = {r["n_nationkey"]: r["n_name"]
            for r in _read(spark, dv_table).collect()}
    assert 1 not in rows
    assert rows[0] != "PATCHED"


def test_fsck_flags_corrupt_dv(spark, dv_table):
    """fsck reports a vector whose dvRows disagrees with its popcount —
    corrupted in place in the commit's delta record (dvRows is commit
    metadata; the bitmap itself lives in the payload sidecar)."""
    import json

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _invalidate_caches,
    )

    delete_vectors_from_manifest(
        _keys(spark, [3]), dv_table, ["n_nationkey"], ["n_nationkey"])
    deltas = sorted(p for p in os.listdir(dv_table)
                    if p.startswith("delta-v"))
    corrupted = False
    for name in reversed(deltas):
        full = os.path.join(dv_table, name)
        with open(full) as fh:
            d = json.load(fh)
        if d.get("dvUpdate"):
            for upd in d["dvUpdate"].values():
                upd["dvRows"] = upd["dvRows"] + 1
            with open(full, "w") as fh:
                json.dump(d, fh)
            corrupted = True
            break
    assert corrupted, "expected a DV commit's delta record"
    _invalidate_caches()  # the test rewrote an immutable artifact
    rep = fsck_manifest(dv_table)
    assert not rep["ok"] and rep["bad_dv"]


def test_manifest_history_accounting(spark, dv_table):
    """manifest_history reports per-snapshot file/row accounting:
    the initial load, a DV delete (live rows down, DV debt up, file
    set unchanged), and a compaction (debt cleared, files shrink)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        manifest_history,
    )

    delete_vectors_from_manifest(
        _keys(spark, [1, 2, 3]), dv_table,
        ["n_nationkey"], ["n_nationkey"])
    compact_manifest(spark, dv_table, ["n_nationkey"], 1_000_000)
    hist = manifest_history(dv_table)
    assert [h["version"] for h in hist] == [0, 1, 2]
    v0, v1, v2 = hist
    assert (v0["n_live_rows"], v0["n_dv_rows"]) == (25, 0)
    assert (v1["n_live_rows"], v1["n_dv_rows"]) == (22, 3)
    assert v1["n_live_files"] == v0["n_live_files"]  # metadata-only
    assert (v2["n_live_rows"], v2["n_dv_rows"]) == (22, 0)
    assert v2["n_live_files"] < v1["n_live_files"] \
        or v2["n_files"] > v1["n_files"]  # compaction rewrote layout
    assert all(h["committed_at"] is not None for h in hist[1:])


def test_overwrite_where_scoped_backfill(spark, dv_table):
    """replaceWhere semantics: rows in [10, 19] are replaced, rows
    outside survive untouched, files that cannot intersect the scope
    keep their exact manifest entries, and a replacement row outside
    the declared scope is refused."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        overwrite_where,
    )

    m0 = load_manifest(dv_table)
    untouched_before = [f["path"] for f in m0["files"]
                        if f["stats"]["n_nationkey"]["max"] < 10]
    assert untouched_before
    repl = spark.createDataFrame(
        [(k, f"NEW{k}") for k in range(10, 20)],
        "n_nationkey long, n_name string")
    overwrite_where(repl, dv_table, "n_nationkey", 10, 19,
                    ["n_nationkey"])
    rows = {r["n_nationkey"]: r["n_name"]
            for r in _read(spark, dv_table).collect()}
    assert set(rows) == set(range(25))
    for k in range(10, 20):
        assert rows[k] == f"NEW{k}"
    for k in list(range(0, 10)) + list(range(20, 25)):
        assert not rows[k].startswith("NEW")
    m1 = load_manifest(dv_table)
    live1 = {f["path"] for f in m1["files"] if not f.get("dead")}
    assert set(untouched_before) <= live1  # out-of-scope files kept
    with pytest.raises(Exception, match="outside the declared scope"):
        overwrite_where(
            spark.createDataFrame([(50, "BAD")],
                                  "n_nationkey long, n_name string"),
            dv_table, "n_nationkey", 10, 19, ["n_nationkey"])


def test_overwrite_where_honors_deletion_vectors(spark, dv_table):
    """An out-of-scope row that was DV-deleted in an intersecting file
    must NOT be resurrected by the scope rewrite (masked carry)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        overwrite_where,
    )

    delete_vectors_from_manifest(
        _keys(spark, [9]), dv_table, ["n_nationkey"], ["n_nationkey"])
    repl = spark.createDataFrame(
        [(k, f"NEW{k}") for k in range(10, 20)],
        "n_nationkey long, n_name string")
    overwrite_where(repl, dv_table, "n_nationkey", 10, 19,
                    ["n_nationkey"])
    keys = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert 9 not in keys
    assert set(range(10, 20)) <= keys


def test_dv_delete_txn_replay_is_noop(spark, dv_table):
    """The foreachBatch exactly-once contract for DV deletes: a replay
    with the same (app, batch) watermark lands NOTHING — same version,
    same vectors — and the next batch id proceeds normally."""
    m1 = delete_vectors_from_manifest(
        _keys(spark, [4]), dv_table, ["n_nationkey"], ["n_nationkey"],
        txn=("eraser", 0))
    v1 = m1["version"]
    m2 = delete_vectors_from_manifest(
        _keys(spark, [8]), dv_table, ["n_nationkey"], ["n_nationkey"],
        txn=("eraser", 0))  # replayed batch id: must no-op
    assert m2["version"] == v1
    keys = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert 4 not in keys and 8 in keys
    m3 = delete_vectors_from_manifest(
        _keys(spark, [8]), dv_table, ["n_nationkey"], ["n_nationkey"],
        txn=("eraser", 1))
    assert m3["version"] == v1 + 1
    keys3 = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert 8 not in keys3


def test_merge_with_delete_clause_is_one_commit(spark, dv_table):
    """MERGE's delete clause: upserts + deletes land in ONE atomic
    version — no merged-but-not-yet-deleted intermediate state exists
    in the history."""
    v0 = load_manifest(dv_table)["version"]
    ups = spark.createDataFrame(
        [(3, "PATCHED"), (30, "BRANDNEW")],
        "n_nationkey long, n_name string")
    dels = _keys(spark, [7, 8])
    merge_into_manifest(ups, dv_table, ["n_nationkey"],
                        ["n_nationkey"], delete_keys=dels)
    m = load_manifest(dv_table)
    assert m["version"] == v0 + 1  # exactly one commit
    rows = {r["n_nationkey"]: r["n_name"]
            for r in _read(spark, dv_table).collect()}
    assert rows[3] == "PATCHED" and rows[30] == "BRANDNEW"
    assert 7 not in rows and 8 not in rows
    assert len(rows) == 25 + 1 - 2
    # the pre-merge snapshot has neither the upsert nor the deletes
    pre = {r["n_nationkey"]: r["n_name"]
           for r in _read(spark, dv_table, versionAsOf=v0).collect()}
    assert 7 in pre and 8 in pre and 30 not in pre
    assert pre[3] != "PATCHED"


def test_concurrent_dv_commits_on_disjoint_files_both_land(
        spark, dv_table, monkeypatch):
    """Two DV deletes racing on DIFFERENT files both succeed: the
    loser's CAS rebases onto the winner's snapshot (its touched file's
    dvGen is unchanged there) and lands at the next version — no lost
    deletes, no spurious conflict."""
    import data_engineering_pipeline_project_cloud_spark.sources.manifest_source as ms

    real = ms._files_possibly_containing
    fired = {"done": False}

    def race_then_plan(files, key_cols, bounds, keys_sorted):
        out = real(files, key_cols, bounds, keys_sorted)
        if not fired["done"]:
            fired["done"] = True
            # racer deletes key 20 (last range file) while we are
            # planning a delete of key 2 (first range file)
            delete_vectors_from_manifest(
                _keys(spark, [20]), dv_table,
                ["n_nationkey"], ["n_nationkey"])
        return out

    monkeypatch.setattr(ms, "_files_possibly_containing", race_then_plan)
    delete_vectors_from_manifest(
        _keys(spark, [2]), dv_table, ["n_nationkey"], ["n_nationkey"])
    m = load_manifest(dv_table)
    assert m["version"] == 2  # both commits landed
    keys = {r["n_nationkey"] for r in _read(spark, dv_table).collect()}
    assert keys == set(range(25)) - {2, 20}


def test_overwrite_where_preserves_null_scope_rows(spark, tmp_path):
    """Schema-evolution interplay: rows from files that predate the
    scope column (NULL scope) are NOT in any [lo, hi] and must survive
    the rewrite; a replacement row with NULL scope is refused."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        overwrite_where,
    )

    path = str(tmp_path / "rwnull")
    write_manifest_table(
        spark.range(5).select(F.col("id").alias("k")).coalesce(1),
        path, ["k"])  # v0: no scope column yet
    (spark.range(5, 10)
     .select(F.col("id").alias("k"), F.col("id").cast("int").alias("yr"))
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "k,yr").save())
    register(spark)
    overwrite_where(
        spark.createDataFrame([(100, 6)], "k long, yr int"),
        path, "yr", 6, 7, ["k", "yr"])
    rows = {(r["k"], r["yr"]) for r in
            (spark.read.format("graft_manifest")
             .option("path", path).load().collect())}
    assert rows == {(0, None), (1, None), (2, None), (3, None),
                    (4, None), (5, 5), (8, 8), (9, 9), (100, 6)}
    with pytest.raises(Exception, match="outside the declared scope"):
        overwrite_where(
            spark.createDataFrame([(101, None)], "k long, yr int"),
            path, "yr", 6, 7, ["k", "yr"])
