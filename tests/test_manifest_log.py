"""Log-structured manifest metadata (round 6): per-commit delta
records, periodic parquet checkpoints, payload sidecars, pluggable
put-if-absent claims.

The contract under test is the one that matters at 100 TB: commit
metadata is O(the commit's change set), never O(table files), and
payload bytes (bloom filters, deletion vectors) are written exactly
once — later commits and checkpoints carry references, not copies.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    CHECKPOINT_EVERY,
    _checkpoint_file,
    _delta_file,
    load_manifest,
    register,
    set_claim_backend,
    vacuum_manifest,
    write_manifest_table,
)


def _one_row_append(spark, path: str, key: int) -> None:
    (spark.createDataFrame([(key, f"row{key}")],
                           "n_nationkey int, n_name string")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())


def _delta_size(path: str, version: int) -> int:
    return os.path.getsize(os.path.join(path, _delta_file(version)))


def test_append_metadata_is_o_commit_not_o_table(spark, sf_dir, tmp_path):
    """The writer spy: a 1-file append to a MANY-file table writes the
    same few hundred bytes of metadata as a 1-file append to a 2-file
    table — commit cost is O(commit delta).  Under the old
    full-snapshot scheme the big table's append re-serialized every
    entry (~15× the small table's bytes)."""
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    small = str(tmp_path / "small")
    big = str(tmp_path / "big")
    write_manifest_table(nat.coalesce(2), small, ["n_nationkey"])
    write_manifest_table(nat.repartition(24), big, ["n_nationkey"])
    n_big = len(load_manifest(big)["files"])
    assert n_big >= 20
    _one_row_append(spark, small, 900)
    _one_row_append(spark, big, 900)
    s_small = _delta_size(small, 1)
    s_big = _delta_size(big, 1)
    # identical change-set shape → near-identical metadata bytes; the
    # factor-2 headroom is for path-length noise, nothing else
    assert s_big < 2 * s_small, (
        f"1-file append wrote {s_big}B of metadata on a {n_big}-file "
        f"table vs {s_small}B on a 2-file table — O(table) regression")
    # both tables read correctly after the append
    got = (spark.read.format("graft_manifest").option("path", big)
           .load().count())
    assert got == 25 + 1


def test_checkpoint_written_and_reads_replay_bounded_tail(
        spark, sf_dir, tmp_path):
    """After CHECKPOINT_EVERY commits a parquet checkpoint exists;
    latest reads and mid-tail time travel reconstruct correctly from
    checkpoint + delta tail."""
    path = str(tmp_path / "ckpt")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])  # v0
    for i in range(CHECKPOINT_EVERY + 2):  # v1..v18
        _one_row_append(spark, path, 1000 + i)
    assert os.path.exists(
        os.path.join(path, _checkpoint_file(CHECKPOINT_EVERY)))
    total = (spark.read.format("graft_manifest").option("path", path)
             .load().count())
    assert total == 25 + CHECKPOINT_EVERY + 2
    # time travel to a version INSIDE the tail (after the checkpoint)
    mid = (spark.read.format("graft_manifest").option("path", path)
           .option("versionAsOf", str(CHECKPOINT_EVERY + 1)).load())
    assert mid.count() == 25 + CHECKPOINT_EVERY + 1
    # ... and BEFORE the checkpoint (replayed from the truncate base)
    early = (spark.read.format("graft_manifest").option("path", path)
             .option("versionAsOf", "2").load())
    assert early.count() == 27


def test_bloom_payload_written_once_and_still_prunes(
        spark, sf_dir, tmp_path):
    """Bloom payload bytes land in ONE sidecar file at creation;
    subsequent commits' metadata never re-copies them (the old scheme
    re-serialized every file's bloom into every snapshot), and the
    resolved manifest still carries the bloom for point-lookup
    pruning."""
    path = str(tmp_path / "bloom")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    (nat.coalesce(1).write.format("graft_manifest").mode("overwrite")
     .option("path", path).option("statCols", "n_nationkey")
     .option("bloomCols", "n_nationkey").save())
    m0 = load_manifest(path)
    enc = m0["files"][0]["bloom"]["n_nationkey"]
    assert m0["files"][0]["bloomRef"], "payload must be sidecar-backed"
    for i in range(3):
        _one_row_append(spark, path, 2000 + i)
    # the payload string exists in exactly one metadata file on disk
    holders = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".json"):
            with open(os.path.join(path, name)) as fh:
                if enc in fh.read():
                    holders.append(name)
    assert len(holders) == 1 and holders[0].startswith("payload-"), (
        f"bloom payload copied into {holders}")
    # resolution: the latest manifest still inlines the SAME bloom
    m3 = load_manifest(path)
    by_path = {f["path"]: f for f in m3["files"]}
    assert by_path[m0["files"][0]["path"]]["bloom"]["n_nationkey"] == enc


def test_dv_payload_sidecar_and_masked_read(spark, sf_dir, tmp_path):
    """A deletion-vector commit's delta record carries only the DV
    reference + accounting; the bitmap lives in the commit's sidecar,
    and reads mask through it exactly as before."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_vectors_from_manifest,
    )

    path = str(tmp_path / "dv")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    keys = spark.createDataFrame([(3,), (7,)], "n_nationkey long")
    delete_vectors_from_manifest(keys, path, ["n_nationkey"],
                                 ["n_nationkey"])
    with open(os.path.join(path, _delta_file(1))) as fh:
        d = json.load(fh)
    (entry,) = d["dvUpdate"].values()
    assert "dv" not in entry and entry["dvRef"][0].startswith("payload-")
    assert entry["dvRows"] == 2
    got = {r["n_nationkey"] for r in
           (spark.read.format("graft_manifest").option("path", path)
            .load().collect())}
    assert 3 not in got and 7 not in got and len(got) == 23


def test_legacy_full_snapshot_table_remains_readable(
        spark, sf_dir, tmp_path):
    """Migration: a table whose history is a pre-round-6 FULL snapshot
    (manifest-v{N}.json) reads as-is, and a new delta commit lands on
    top of it — the snapshot serves as the reconstruction base."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _invalidate_caches,
        _manifest_file,
    )

    path = str(tmp_path / "legacy")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])  # v0
    # rewrite history into the legacy layout: full snapshot, no delta
    m0 = load_manifest(path)
    with open(os.path.join(path, _manifest_file(0)), "w") as fh:
        json.dump(m0, fh)
    os.remove(os.path.join(path, _delta_file(0)))
    _invalidate_caches()
    assert load_manifest(path)["version"] == 0
    _one_row_append(spark, path, 3000)  # delta-v1 on a legacy base
    assert os.path.exists(os.path.join(path, _delta_file(1)))
    got = (spark.read.format("graft_manifest").option("path", path)
           .load().count())
    assert got == 26
    # and the pre-append version still travels
    assert (spark.read.format("graft_manifest").option("path", path)
            .option("versionAsOf", "0").load().count()) == 25


def test_vacuum_anchors_floor_with_checkpoint(spark, sf_dir, tmp_path):
    """Vacuum on a delta-only history writes a checkpoint at the
    retention floor before deleting the chain below it — every kept
    version stays reconstructible, expired ones raise."""
    path = str(tmp_path / "vfloor")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])  # v0
    for i in range(4):  # v1..v4
        _one_row_append(spark, path, 4000 + i)
    vacuum_manifest(path, keep_versions=3, min_age_seconds=0)
    assert os.path.exists(os.path.join(path, _checkpoint_file(2)))
    for v, n in ((2, 27), (3, 28), (4, 29)):
        assert (spark.read.format("graft_manifest").option("path", path)
                .option("versionAsOf", str(v)).load().count()) == n
    with pytest.raises(Exception, match="not available"):
        (spark.read.format("graft_manifest").option("path", path)
         .option("versionAsOf", "1").load().collect())


def test_vacuum_default_min_age_spares_young_files(
        spark, sf_dir, tmp_path):
    """Round-6 default hardening: with no explicit min_age_seconds the
    in-flight-writer guard is ON — young unreferenced data/staging
    files survive the sweep (they may belong to a commit between file
    publish and delta claim)."""
    import shutil

    path = str(tmp_path / "vdefault")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    src = load_manifest(path)["files"][0]["path"]
    orphan = os.path.join(path, "part-v9999-cafebabe-00000.parquet")
    shutil.copy(src, orphan)
    staging = os.path.join(path, ".part-y.77.tmp")
    with open(staging, "w") as fh:
        fh.write("x")
    res = vacuum_manifest(path, keep_versions=1)  # default min_age
    assert orphan not in res["removed_files"]
    assert staging not in res["removed_files"]
    assert os.path.exists(orphan) and os.path.exists(staging)


def test_claim_backend_is_pluggable_and_rebases_on_conflict(
        spark, sf_dir, tmp_path):
    """set_claim_backend substitutes the put-if-absent primitive (the
    S3-conditional-PUT seam) for every driver-side commit path.  A
    refused claim makes the committer re-read latest and REBASE:
    here the injected backend lands a real competing commit at the
    contested version before refusing our drop-column claim, and the
    drop retries and lands at the next version on top of it."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        LocalFSClaimBackend,
        _invalidate_caches,
        drop_column_from_manifest,
    )

    path = str(tmp_path / "claims")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", F.lit("x").alias("extra"))
    register(spark)
    write_manifest_table(nat.coalesce(1), path,
                         ["n_nationkey"])  # v0

    class _RaceOnce:
        def __init__(self, inner):
            self.inner = inner
            self.raced = False
            self.claims: list[str] = []

        def put_if_absent(self, directory, name, payload):
            self.claims.append(name)
            if not self.raced and name == _delta_file(1):
                self.raced = True
                # the "other writer": land a competing metadata commit
                # at v1 (txn watermark only), then refuse our claim
                d = json.loads(payload)
                competing = {"version": 1, "schema": load_manifest(
                    directory)["schema"], "txn": {"racer": 1},
                    "droppedCols": {}, "committedAt": d["committedAt"]}
                self.inner.put_if_absent(directory, name,
                                         json.dumps(competing))
                _invalidate_caches()
                return False
            return self.inner.put_if_absent(directory, name, payload)

    racer = _RaceOnce(LocalFSClaimBackend())
    old = set_claim_backend(racer)
    try:
        m = drop_column_from_manifest(path, "extra")
    finally:
        set_claim_backend(old)
    # routed through the injected backend, lost v1, rebased to v2
    assert racer.claims == [_delta_file(1), _delta_file(2)]
    assert m["version"] == 2
    # the racer's commit is preserved underneath ours
    assert load_manifest(path, 1)["txn"] == {"racer": 1}
    got = (spark.read.format("graft_manifest").option("path", path)
           .load())
    assert "extra" not in got.columns and got.count() == 25


def test_compaction_preserves_bloom_columns(spark, sf_dir, tmp_path):
    """OPTIMIZE on a bloom-indexed table rebuilds blooms for the
    rewritten files (in a fresh sidecar) instead of silently dropping
    point-lookup skipping — and vacuum then expires the superseded
    inputs' sidecar while sparing the live one."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        compact_manifest,
    )

    path = str(tmp_path / "cb")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    for lo, hi in ((0, 12), (12, 25)):
        (nat.filter(f"n_nationkey >= {lo} AND n_nationkey < {hi}")
         .coalesce(1)
         .write.format("graft_manifest").mode("append")
         .option("path", path).option("statCols", "n_nationkey")
         .option("bloomCols", "n_nationkey").save())
    m = compact_manifest(spark, path, ["n_nationkey"],
                         small_file_rows=100)
    live = [f for f in m["files"] if not f.get("dead")]
    assert live and all("n_nationkey" in (f.get("bloom") or {})
                        for f in live)
    # read path still correct post-compaction
    assert (spark.read.format("graft_manifest").option("path", path)
            .load().count()) == 25
    # vacuum: the inputs' sidecars expire, the live files' survive
    before = {n for n in os.listdir(path) if n.startswith("payload-")}
    vacuum_manifest(path, keep_versions=1, min_age_seconds=0)
    after = {n for n in os.listdir(path) if n.startswith("payload-")}
    assert after and after < before
    m2 = load_manifest(path)
    assert all("n_nationkey" in (f.get("bloom") or {})
               for f in m2["files"] if not f.get("dead"))


def test_checkpoint_across_schema_evolution_and_drop(
        spark, sf_dir, tmp_path):
    """Evolution × checkpoint interplay (the seam class that bit in
    round 5): an add-column commit and a metadata-only drop inside the
    checkpointed window must survive reconstruction from checkpoint +
    tail — latest reads carry the evolved schema, pre-evolution time
    travel carries the old one, and the droppedCols re-add refusal
    survives a checkpoint + vacuum."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        drop_column_from_manifest,
    )

    path = str(tmp_path / "evock")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])  # v0
    for i in range(CHECKPOINT_EVERY - 3):
        _one_row_append(spark, path, 1100 + i)
    # add-column evolution just before the checkpoint boundary
    (spark.createDataFrame([(7000, "evo", 1.5)],
                           "n_nationkey int, n_name string, score double")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    for i in range(4):  # crosses the CHECKPOINT_EVERY boundary
        _one_row_append(spark, path, 1200 + i)
    assert os.path.exists(
        os.path.join(path, _checkpoint_file(CHECKPOINT_EVERY)))
    df = (spark.read.format("graft_manifest").option("path", path)
          .load())
    assert "score" in df.columns
    assert df.filter("score IS NOT NULL").count() == 1
    assert df.count() == 25 + (CHECKPOINT_EVERY - 3) + 1 + 4
    # pre-evolution travel: the old schema, reconstructed via the tail
    pre = (spark.read.format("graft_manifest").option("path", path)
           .option("versionAsOf", "3").load())
    assert "score" not in pre.columns and pre.count() == 28
    # drop + vacuum past a checkpoint: the drop registry survives and
    # a re-add through it stays masked (no resurrection)
    drop_column_from_manifest(path, "score")
    vacuum_manifest(path, keep_versions=1, min_age_seconds=0)
    assert "score" not in (spark.read.format("graft_manifest")
                           .option("path", path).load().columns)
    (spark.createDataFrame([(7001, "x", 2.0)],
                           "n_nationkey int, n_name string, score double")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    readd = (spark.read.format("graft_manifest").option("path", path)
             .load())
    got = readd.filter(F.col("score").isNotNull()).collect()
    assert len(got) == 1 and got[0]["score"] == 2.0, \
        "pre-drop 'score' values must stay masked after the re-add"


def test_vacuum_dead_sidecar_expiry_keeps_table_readable(
        spark, sf_dir, tmp_path):
    """A bloom-indexed file tombstoned in every kept version has its
    payload sidecar expired by vacuum — and the table must STAY
    readable from a fresh process: reconstruction resolves dead
    entries' payload refs tolerantly instead of raising 'sidecar
    payload file missing' (the floor checkpoint still carries the
    dead entry with its bloomRef)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _invalidate_caches,
        delete_from_manifest,
    )

    path = str(tmp_path / "vdead")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"), "n_name")
    register(spark)
    for lo, hi in ((0, 12), (12, 25)):  # v0, v1: bloom-indexed files
        (nat.filter(f"n_nationkey >= {lo} AND n_nationkey < {hi}")
         .coalesce(1).write.format("graft_manifest").mode("append")
         .option("path", path).option("statCols", "n_nationkey")
         .option("bloomCols", "n_nationkey").save())
    doomed = spark.range(0, 12).select(
        F.col("id").cast("int").alias("n_nationkey"))
    delete_from_manifest(doomed, path, ["n_nationkey"],
                         ["n_nationkey"])          # v2: tombstones file A
    _one_row_append(spark, path, 99)               # v3
    sidecars_before = {n for n in os.listdir(path)
                       if n.startswith("payload-")}
    vacuum_manifest(path, keep_versions=2, min_age_seconds=0)
    sidecars_after = {n for n in os.listdir(path)
                      if n.startswith("payload-")}
    # the dead-everywhere file's bloom sidecar really expired
    assert sidecars_after < sidecars_before
    # fresh process: no state cache masking the reconstruction path
    _invalidate_caches()
    m = load_manifest(path)  # must not raise
    assert any(f.get("dead") for f in m["files"])
    got = (spark.read.format("graft_manifest").option("path", path)
           .load())
    assert got.count() == 14  # 13 survivors + the v3 append
    # bloom skipping on the LIVE file still works after expiry
    assert got.filter("n_nationkey = 13").count() == 1


def test_vacuum_dry_run_reports_without_deleting(spark, sf_dir, tmp_path):
    """VACUUM DRY RUN: reports exactly the set a real run removes —
    same floor, same age guard — while touching nothing (no
    deletions, no floor checkpoint, no cache invalidation)."""
    path = str(tmp_path / "vdr")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    register(spark)
    for lo, hi in ((0, 9), (9, 17), (17, 25)):
        (nat.filter(f"n_nationkey >= {lo} AND n_nationkey < {hi}")
         .coalesce(1).write.format("graft_manifest").mode("append")
         .option("path", path).option("statCols", "n_nationkey").save())
    before = sorted(os.listdir(path))
    dry = vacuum_manifest(path, keep_versions=1, min_age_seconds=0,
                          dry_run=True)
    assert sorted(os.listdir(path)) == before  # nothing touched
    assert dry["removed_manifests"]  # v0/v1 metadata is past retention
    real = vacuum_manifest(path, keep_versions=1, min_age_seconds=0)
    assert sorted(real["removed_files"]) == sorted(dry["removed_files"])
    assert sorted(real["removed_manifests"]) == sorted(
        dry["removed_manifests"])
    # table still fully readable after the real run
    assert (spark.read.format("graft_manifest").option("path", path)
            .load().count()) == 25
