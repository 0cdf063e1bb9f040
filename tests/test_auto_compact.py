"""Auto-compaction (Delta autoCompact analog): a plain append that
leaves >= autoCompact small files triggers an inline bin-pack;
rewrites never recurse; compaction failure never fails the append.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    load_manifest,
    manifest_operations,
    read_manifest,
    register,
    set_table_properties,
    write_frame,
    write_manifest_table,
)


def _live(path):
    return [f for f in load_manifest(path)["files"]
            if not f.get("dead")]


@pytest.fixture()
def table(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    write_manifest_table(
        spark.range(0, 100).select(F.col("id").alias("k"),
                                   (F.col("id") * 2.0).alias("v"))
        .coalesce(1),
        path, ["k"])
    set_table_properties(path, {"autoCompact": 4,
                                "targetFileRows": 100})
    return path


def test_appends_compact_at_threshold(spark, table):
    # three small appends: 1 base small? base has 100 rows (not small);
    # appends of 5 rows each are small
    for i in range(3):
        write_frame(spark.range(i * 5, i * 5 + 5).select(
            F.col("id").alias("k"), F.lit(0.0).alias("v"))
            .coalesce(1),
            table, "append", statCols="k")
        # below threshold (4 small files): debt accumulates
    assert sum(1 for f in _live(table) if f["rows"] < 100) == 3
    # the 4th small append crosses the threshold -> inline bin-pack
    write_frame(spark.range(100, 105).select(
        F.col("id").alias("k"), F.lit(0.0).alias("v")).coalesce(1),
        table, "append", statCols="k")
    small = [f for f in _live(table) if f["rows"] < 100]
    assert len(small) <= 1, small  # 20 rows repacked into one file
    assert read_manifest(spark, table).count() == 120
    ops = [o["operation"] for o in manifest_operations(table)]
    assert "REWRITE" in ops  # the compaction commit


def test_rewrites_do_not_recurse(spark, table):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        merge_into_manifest,
    )
    # a keyed rewrite (replacePaths) must not trigger auto-compact
    v0 = load_manifest(table)["version"]
    ups = spark.createDataFrame([(1, 999.0)], "k long, v double")
    merge_into_manifest(ups, table, ["k"], ["k"])
    # exactly one commit landed (the merge), no trailing compaction
    assert load_manifest(table)["version"] == v0 + 1


def test_without_properties_no_compaction(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "plain")
    write_manifest_table(
        spark.range(10).select(F.col("id").alias("k")).coalesce(1),
        path, ["k"])
    for i in range(5):
        write_frame(spark.range(i, i + 1).select(
            F.col("id").alias("k")).coalesce(1),
            path, "append", statCols="k")
    # 5 tiny appends stay 5 files — no properties, no surprises
    assert len(_live(path)) == 6
