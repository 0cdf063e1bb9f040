"""Forward-only partition spec evolution (round 8,
`evolve_partition_spec`): a metadata commit replaces the table's
hidden-partition spec; old files keep pruning under their era's
transforms, new files under the new ones — no data rewritten, the
Iceberg spec-evolution contract.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    describe_manifest,
    evolve_partition_spec,
    load_manifest,
    manifest_operations,
    read_manifest,
    register,
    write_frame,
)


def _frame(spark):
    rows = [(i, dt.datetime(2024, 1 + i % 3, 1 + i % 5, i % 24),
             float(i)) for i in range(30)]
    return spark.createDataFrame(rows, "id long, ts timestamp, v double")


@pytest.fixture()
def evolved(spark, tmp_path):
    """Era 1: 15 rows month-partitioned; evolve; era 2: 15 rows
    day-partitioned."""
    register(spark)
    path = str(tmp_path / "t")
    df = _frame(spark)
    write_frame(df.filter("id < 15"), path, "overwrite", statCols="id",
                partitionGen="pmonth=month(ts)")
    evolve_partition_spec(path, "pday=date(ts)")
    write_frame(df.filter("id >= 15"), path, "append", statCols="id")
    return path


def test_mixed_era_files_prune_under_their_own_spec(spark, evolved):
    m = load_manifest(evolved)
    live = [f for f in m["files"] if not f.get("dead")]
    era1 = [f for f in live if "pmonth" in (f.get("partition") or {})]
    era2 = [f for f in live if "pday" in (f.get("partition") or {})]
    assert era1 and era2, "both eras must hold live files"
    # a source-column predicate prunes BOTH eras: era-1 via the
    # archived month transform, era-2 via the current date transform
    flt = [("ts", ">=", dt.datetime(2024, 3, 1))]
    pruned = read_manifest(spark, evolved, filters=flt)
    opened = set(pruned.inputFiles())
    assert len(opened) < len(live)
    kept_e1 = [f for f in era1 if any(f["path"] in p for p in opened)]
    kept_e2 = [f for f in era2 if any(f["path"] in p for p in opened)]
    assert len(kept_e1) < len(era1), "era-1 files must prune too"
    assert len(kept_e2) < len(era2), "era-2 files must prune too"
    # and results stay exact
    got = (pruned.filter(F.col("ts") >= dt.datetime(2024, 3, 1))
           .count())
    want = (_frame(spark)
            .filter(F.col("ts") >= dt.datetime(2024, 3, 1)).count())
    assert got == want
    assert read_manifest(spark, evolved).count() == 30


def test_state_and_introspection(spark, evolved):
    m = load_manifest(evolved)
    assert m["partitionGen"] == [
        {"name": "pday", "src": "ts", "transform": "date"}]
    assert m["partitionSpecs"] == [[
        {"name": "pmonth", "src": "ts", "transform": "month"}]]
    d = describe_manifest(evolved)
    assert d["partitionSpecs"] == m["partitionSpecs"]
    ops = {o["version"]: o["operation"]
           for o in manifest_operations(evolved)}
    assert ops[1] == "EVOLVE PARTITION SPEC"


def test_name_reuse_with_different_definition_refused(spark, evolved):
    with pytest.raises(ValueError, match="fresh name"):
        evolve_partition_spec(evolved, "pmonth=date(ts)")
    # same name + same definition is the idempotent no-op case
    before = load_manifest(evolved)["version"]
    evolve_partition_spec(evolved, "pday=date(ts)")
    assert load_manifest(evolved)["version"] == before


def test_stale_writer_fails_after_evolution(spark, tmp_path):
    """A write PLANNED under the old spec must fail at commit time
    (its files were split under the wrong layout) — the existing
    partitionGen CAS guard covers evolution commits too."""
    register(spark)
    path = str(tmp_path / "t")
    df = _frame(spark)
    write_frame(df.filter("id < 10"), path, "overwrite",
                statCols="id", partitionGen="pmonth=month(ts)")
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        ManifestArrowWriter,
        _FileCommit,
    )

    # plan a writer under the CURRENT (old) spec, then evolve
    w = ManifestArrowWriter({"path": path, "statcols": "id"},
                            df.schema, overwrite=False)
    assert w._partition_gen  # inherited the month spec
    evolve_partition_spec(path, "pday=date(ts)")
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    staged = os.path.join(path, ".stale.tmp")
    pq.write_table(pa.table({"id": [99], "ts": [None], "v": [0.0]}),
                   staged)
    msg = _FileCommit(tmp_path=staged,
                      final_path=os.path.join(
                          path, "part-v9999-stale-00000.parquet"),
                      rows=1, stats={}, bloom={},
                      partition={"pmonth": "2024-01"})
    with pytest.raises(ValueError, match="partitionGen spec changed"):
        w.commit([msg])
    # nothing published
    m = load_manifest(path)
    assert all("stale" not in os.path.basename(f["path"])
               for f in m["files"])


def test_evolution_survives_checkpoint_restore_and_overwrite(
        spark, tmp_path):
    """partitionSpecs is table state: checkpoints carry it, restore
    rolls it back with the version, and an overwrite resets it."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _STATE_CACHE,
        _invalidate_caches,
        _load_state,
        _write_checkpoint,
        restore_manifest,
    )

    register(spark)
    path = str(tmp_path / "t")
    df = _frame(spark)
    write_frame(df.filter("id < 10"), path, "overwrite",
                statCols="id", partitionGen="pmonth=month(ts)")
    evolve_partition_spec(path, "pday=date(ts)")      # v1
    write_frame(df.filter("id >= 10"), path, "append",
                statCols="id")                         # v2
    # checkpoint the latest state, then reload from a cold cache
    import os

    _write_checkpoint(path, _load_state(os.path.abspath(path), 2))
    _STATE_CACHE.clear()
    _invalidate_caches()
    m = load_manifest(path)
    assert m["partitionSpecs"] == [[
        {"name": "pmonth", "src": "ts", "transform": "month"}]]
    # restore to v0: the spec rolls back and the archive empties
    restore_manifest(path, 0)
    m0 = load_manifest(path)
    assert m0["partitionGen"] == [
        {"name": "pmonth", "src": "ts", "transform": "month"}]
    assert m0["partitionSpecs"] == []
    # overwrite resets everything
    write_frame(df.limit(3), path, "overwrite", statCols="id")
    m1 = load_manifest(path)
    assert m1["partitionGen"] == [] and m1["partitionSpecs"] == []


def test_merge_schema_evolution_widens_table(spark, tmp_path):
    """merge_into_manifest(schema_evolution=True): one atomic commit
    upserts and ADDS the new column; untouched files null-fill at
    read time; a non-evolution merge still refuses implicit widening
    (extra columns are dropped by the conform step)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        merge_into_manifest,
        read_manifest,
        write_manifest_table,
    )

    register(spark)
    path = str(tmp_path / "mse")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k long, v double")
    write_manifest_table(base.repartitionByRange(4, "k"), path, ["k"])
    ups = spark.createDataFrame(
        [(3, 99.0, "x"), (25, 1.0, "y")], "k long, v double, tag string")
    m = merge_into_manifest(ups, path, ["k"], ["k"],
                            schema_evolution=True)
    names = [f["name"] for f in
             __import__("json").loads(m["schema"])["fields"]]
    assert names == ["k", "v", "tag"]
    out = {r["k"]: (r["v"], r["tag"])
           for r in read_manifest(spark, path).collect()}
    assert out[3] == (99.0, "x") and out[25] == (1.0, "y")
    assert out[0] == (0.0, None), "untouched rows null-fill"
    assert len(out) == 21
    # without the flag, an extra column is dropped (no implicit
    # evolution) and the schema stays put
    ups2 = spark.createDataFrame([(4, 5.0, "z", 1)],
                                 "k long, v double, tag string, extra int")
    m2 = merge_into_manifest(ups2, path, ["k"], ["k"])
    names2 = [f["name"] for f in
              __import__("json").loads(m2["schema"])["fields"]]
    assert names2 == ["k", "v", "tag"]


def test_metadata_count_is_dv_and_travel_aware(spark, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        count_manifest,
        delete_vectors_from_manifest,
        read_manifest,
        write_manifest_table,
    )

    register(spark)
    path = str(tmp_path / "cnt")
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    write_manifest_table(df.repartitionByRange(4, "k"), path, ["k"])
    assert count_manifest(path) == 100
    delete_vectors_from_manifest(
        spark.createDataFrame([(i,) for i in range(0, 100, 10)],
                              "k long"), path, ["k"], ["k"])
    assert count_manifest(path) == 90
    assert count_manifest(path) == read_manifest(spark, path).count()
    assert count_manifest(path, version=0) == 100
