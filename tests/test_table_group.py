"""Multi-table atomic commit groups (sources/table_group.py):
all-or-nothing cross-table visibility, group time travel, rebase under
concurrent group commits, and isolation from out-of-band writers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources import table_group as tg
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    load_manifest,
    register,
    write_manifest_table,
)


@pytest.fixture()
def group(spark, sf_dir, tmp_path):
    """Two member tables seeded with nation keys < 10, group at v0."""
    register(spark)
    t1 = str(tmp_path / "t1")
    t2 = str(tmp_path / "t2")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name")
    write_manifest_table(nat.filter("n_nationkey < 10").coalesce(1),
                         t1, ["n_nationkey"])
    write_manifest_table(nat.filter("n_nationkey < 10").coalesce(1),
                         t2, ["n_nationkey"])
    gpath = str(tmp_path / "grp")
    tg.create_group(gpath, {"a": t1, "b": t2})
    return gpath, t1, t2, nat


def _counts(spark, gpath, version=None):
    return {n: tg.read_group_table(spark, gpath, n, version).count()
            for n in ("a", "b")}


def test_group_commit_is_all_or_nothing(spark, group, monkeypatch):
    """A failure after table A's write but before the group publish
    leaves the GROUP cut unchanged: A's new table version exists
    (time-travelable orphan) but neither member advances through the
    group — rolled-back-transaction semantics."""
    gpath, t1, t2, nat = group
    batch = nat.filter("n_nationkey >= 10").coalesce(1)

    real = tg._version_of_txn
    calls = {"n": 0}

    def fail_second(tpath, app_id, txn_version):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before group publish")
        return real(tpath, app_id, txn_version)

    monkeypatch.setattr(tg, "_version_of_txn", fail_second)
    with pytest.raises(RuntimeError, match="injected"):
        tg.group_commit(gpath, {"a": (batch, ["n_nationkey"]),
                                "b": (batch, ["n_nationkey"])},
                        txn_id="grp-retry-test")
    assert tg.load_group(gpath)["version"] == 0
    assert _counts(spark, gpath) == {"a": 10, "b": 10}
    # the orphan commits DID land on the tables, just unreferenced
    assert load_manifest(t1)["version"] == 1
    monkeypatch.setattr(tg, "_version_of_txn", real)
    # retry with the SAME txn id: the orphan appends replay as no-ops
    # (manifest (app, version) watermark), the resolution finds the
    # original commits, and the cut flips both members exactly once
    tg.group_commit(gpath, {"a": (batch, ["n_nationkey"]),
                            "b": (batch, ["n_nationkey"])},
                    txn_id="grp-retry-test")
    assert _counts(spark, gpath) == {"a": 25, "b": 25}
    assert load_manifest(t1)["version"] == 1  # no duplicate append


def test_group_time_travel_reproduces_cut(spark, group):
    gpath, t1, t2, nat = group
    batch = nat.filter("n_nationkey >= 10").coalesce(1)
    g1 = tg.group_commit(gpath, {"a": (batch, ["n_nationkey"]),
                                 "b": (batch, ["n_nationkey"])})
    assert g1["version"] == 1
    assert _counts(spark, gpath) == {"a": 25, "b": 25}
    assert _counts(spark, gpath, version=0) == {"a": 10, "b": 10}


def test_group_isolated_from_out_of_band_writes(spark, group):
    """A direct (non-group) append to a member advances the TABLE but
    not the group cut: group readers keep the pinned version until the
    next group commit re-pins."""
    gpath, t1, t2, nat = group
    (nat.filter("n_nationkey >= 20").coalesce(1)
     .write.format("graft_manifest").mode("append")
     .option("path", t1).option("statCols", "n_nationkey").save())
    assert load_manifest(t1)["version"] == 1
    assert _counts(spark, gpath) == {"a": 10, "b": 10}


def test_concurrent_group_commits_rebase(spark, group, monkeypatch):
    """A group CAS lost to a racing committer rebases and lands at the
    next version; the final cut carries BOTH commits' writes (each to
    its own member)."""
    gpath, t1, t2, nat = group
    real = tg._publish
    fired = {"done": False}

    def race_then_publish(path, g):
        if not fired["done"]:
            fired["done"] = True
            # a competing group commit claims this version first
            tg.group_commit(gpath, {"b": (
                nat.filter("n_nationkey >= 20").coalesce(1),
                ["n_nationkey"])})
        return real(path, g)

    monkeypatch.setattr(tg, "_publish", race_then_publish)
    tg.group_commit(gpath, {"a": (
        nat.filter("n_nationkey >= 10").coalesce(1), ["n_nationkey"])})
    g = tg.load_group(gpath)
    assert g["version"] == 2
    got = _counts(spark, gpath)
    assert got == {"a": 25, "b": 15}  # racer's b-write AND our a-write


def test_vacuum_group_respects_pins(spark, group):
    """Group-aware retention: expiring old group snapshots lets member
    versions below every retained pin vacuum away, while every version
    a retained group snapshot pins survives — consistent-cut reads
    through the kept snapshots keep working after the sweep."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _list_versions,
    )

    gpath, t1, t2, nat = group
    tg.group_commit(gpath, {"a": (
        nat.filter("n_nationkey >= 10").coalesce(1), ["n_nationkey"])})
    tg.group_commit(gpath, {"b": (
        nat.filter("n_nationkey >= 20").coalesce(1), ["n_nationkey"])})
    assert tg.load_group(gpath)["version"] == 2
    rep = tg.vacuum_group(gpath, keep_groups=2)
    # group v0 expired; v1 and v2 retained
    with pytest.raises(Exception, match="not available"):
        tg.load_group(gpath, 0)
    # v1 pins a@1, b@0; v2 pins a@1, b@1 → t1 keeps version 1 (floor),
    # t2 keeps versions 0 and 1 (floor 0 — still pinned by v1)
    assert min(_list_versions(t1)) == 1
    assert min(_list_versions(t2)) == 0
    # retained cuts still fully readable
    assert _counts(spark, gpath, version=1) == {"a": 25, "b": 10}
    assert _counts(spark, gpath, version=2) == {"a": 25, "b": 15}
    assert rep["removed_groups"]


def test_three_interleaved_group_commits_all_land(spark, group,
                                                  monkeypatch):
    """CAS stress for the group pointer: three group commits racing
    through nested publish interleavings all land, versions serialize
    1..3, and the final cut reflects every write."""
    gpath, t1, t2, nat = group
    real = tg._publish
    depth = {"n": 0}

    def nested_race(path, g):
        depth["n"] += 1
        if depth["n"] == 1:
            tg.group_commit(gpath, {"b": (
                nat.filter("n_nationkey >= 20").coalesce(1),
                ["n_nationkey"])})
        elif depth["n"] == 2:
            tg.group_commit(gpath, {"a": (
                nat.filter("(n_nationkey >= 10) AND (n_nationkey < 15)")
                .coalesce(1), ["n_nationkey"])})
        return real(path, g)

    monkeypatch.setattr(tg, "_publish", nested_race)
    tg.group_commit(gpath, {"a": (
        nat.filter("n_nationkey >= 15").coalesce(1), ["n_nationkey"])})
    g = tg.load_group(gpath)
    assert g["version"] == 3
    got = _counts(spark, gpath)
    # a received [10,15) from racer-2 and [15,25) from ours: 10+15
    # b received [20,25) from racer-1: 10+5
    assert got == {"a": 25, "b": 15}


def test_group_txn_id_reuse_refused(spark, group):
    """Round-6 ADVICE: reusing a txn_id a PUBLISHED group snapshot
    already consumed must fail loudly — under the old behavior the
    member appends silently no-op'd via replay detection and the
    group re-pinned the FIRST commit's cuts, losing the new writes."""
    gpath, t1, t2, nat = group
    b1 = nat.filter("n_nationkey >= 10").coalesce(1)
    tg.group_commit(gpath, {"a": (b1, ["n_nationkey"])},
                    txn_id="grp-once")
    assert _counts(spark, gpath) == {"a": 25, "b": 10}
    with pytest.raises(ValueError, match="already consumed"):
        tg.group_commit(gpath, {"b": (b1, ["n_nationkey"])},
                        txn_id="grp-once")
    # the refused commit wrote nothing: member b and the cut unchanged
    assert _counts(spark, gpath) == {"a": 25, "b": 10}
    assert load_manifest(t2)["version"] == 0


def test_group_commit_writes_through_native_path(spark, group):
    """Round 9: member appends route through write_frame's JVM-native
    staging (Spark's own parquet writer), not the Python-Arrow
    DataSource writer — pinned by the parquet footers' created_by
    (parquet-mr = the JVM writer), the same evidence
    tests/test_native_write.py uses for every other write leg."""
    import pyarrow.parquet as pq

    gpath, t1, t2, nat = group
    pre = {f["path"] for f in load_manifest(t1)["files"]}
    batch = nat.filter("n_nationkey >= 10").coalesce(1)
    tg.group_commit(gpath, {"a": (batch, ["n_nationkey"]),
                            "b": (batch, ["n_nationkey"])})
    added = [f for f in load_manifest(t1)["files"]
             if f["path"] not in pre and not f.get("dead")]
    assert added, "group commit appended nothing to member a"
    for f in added:
        created_by = pq.ParquetFile(f["path"]).metadata.created_by
        assert "parquet-mr" in created_by, created_by
    # and the commit is still txn-tagged + group-pinned as before
    assert _counts(spark, gpath) == {"a": 25, "b": 25}
