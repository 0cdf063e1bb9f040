"""Per-entry NULL counts (round 11): both write paths record
``nulls[col]`` for stat columns (Arrow validity buffers / footer
statistics — no extra data pass), powering ``IS [NOT] NULL`` file
pruning (`_file_survives`) and metadata-only ``COUNT(col)``
(`count_manifest`).  Never prune on doubt: entries without null
counts always survive.
"""

from __future__ import annotations

import pytest
from pyspark.sql.datasource import IsNotNull, IsNull

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    _file_survives,
    count_manifest,
    delete_where_dv,
    load_manifest,
    read_manifest,
    register,
    rename_column_in_manifest,
    write_frame,
)


def _frame(spark):
    return spark.sql(
        "SELECT CAST(id AS BIGINT) k, "
        "CASE WHEN id < 50 THEN CAST(id AS DOUBLE) END v, "
        "CASE WHEN id >= 50 THEN 'tail' END s FROM range(100)")


@pytest.fixture()
def path(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "t")
    write_frame(_frame(spark).repartitionByRange(4, "k"), p,
                "overwrite", statCols="k,v,s")
    return p


def test_native_write_records_null_counts(spark, path):
    m = load_manifest(path)
    got = sorted(tuple(sorted(f["nulls"].items()))
                 for f in m["files"])
    # k-ranged layout: two files all-null in s, two all-null in v
    assert got == sorted([
        (("k", 0), ("s", 25), ("v", 0)),
        (("k", 0), ("s", 25), ("v", 0)),
        (("k", 0), ("s", 0), ("v", 25)),
        (("k", 0), ("s", 0), ("v", 25))])


def test_datasource_writer_records_null_counts(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "ds")
    (_frame(spark).repartitionByRange(2, "k")
     .write.format("graft_manifest").mode("append")
     .option("path", p).option("statCols", "k,v,s").save())
    m = load_manifest(p)
    assert all("nulls" in f for f in m["files"])
    assert sum(f["nulls"]["v"] for f in m["files"]) == 50
    assert sum(f["nulls"]["s"] for f in m["files"]) == 50
    assert count_manifest(p, col="v") == 50


def test_metadata_count_col_and_refusals(spark, path):
    assert count_manifest(path, col="k") == 100
    assert count_manifest(path, col="v") == 50
    assert count_manifest(path, col="s") == 50
    with pytest.raises(ValueError, match="no null count"):
        count_manifest(path, col="nope")
    delete_where_dv(spark, path, "k = 10")
    with pytest.raises(ValueError, match="deletion vector"):
        count_manifest(path, col="v")
    assert count_manifest(path) == 99  # COUNT(*) stays DV-exact


def test_is_null_file_pruning(spark, path):
    # correctness through the pruned planner
    assert read_manifest(spark, path,
                         filters=[("v", "isnotnull", None)]) \
        .where("v IS NOT NULL").count() == 50
    assert read_manifest(spark, path,
                         filters=[("s", "isnull", None)]) \
        .where("s IS NULL").count() == 50
    # and the pruning itself: all-null file excluded for IsNotNull,
    # zero-null file excluded for IsNull; absent info always survives
    assert not _file_survives({}, [IsNotNull(("v",))], None,
                              nulls={"v": 25}, rows=25)
    assert not _file_survives({}, [IsNull(("v",))], None,
                              nulls={"v": 0}, rows=25)
    assert _file_survives({}, [IsNotNull(("v",))], None,
                          nulls={"v": 24}, rows=25)
    assert _file_survives({}, [IsNull(("v",))], None,
                          nulls={"v": 1}, rows=25)
    assert _file_survives({}, [IsNull(("v",))], None,
                          nulls=None, rows=25)
    assert _file_survives({}, [IsNull(("w",))], None,
                          nulls={"v": 0}, rows=25)


def test_null_counts_follow_renames(spark, path):
    rename_column_in_manifest(path, "v", "val")
    assert count_manifest(path, col="val") == 50
    assert read_manifest(spark, path,
                         filters=[("val", "isnotnull", None)]) \
        .where("val IS NOT NULL").count() == 50


def test_sql_null_predicates_exact(spark, path):
    spark.read.format("graft_manifest").option("path", path).load() \
        .createOrReplaceTempView("nulls_tv")
    assert spark.sql("SELECT COUNT(*) AS n FROM nulls_tv "
                     "WHERE v IS NULL").collect()[0]["n"] == 50
    assert spark.sql("SELECT COUNT(*) AS n FROM nulls_tv "
                     "WHERE v IS NOT NULL AND k < 10") \
        .collect()[0]["n"] == 10


def test_reused_dataframe_never_loses_rows(spark, path):
    """Round-11 regression (pre-existing, latent since round-7 stats
    pruning): Spark caches a Python data source's pushdown-computed
    partitions on the relation and REUSES them for later scans of the
    same loaded DataFrame — so any pruning baked at pushdown time
    silently lost rows for the next query on the same frame.  The
    batch DataSource therefore no longer prunes via pushFilters; a
    filtered query followed by broader queries on one frame must see
    every row."""
    df = spark.read.format("graft_manifest").option("path", path) \
        .load()
    assert df.filter("k <= 10").count() == 11
    assert df.count() == 100          # was 25 with baked pruning
    assert df.filter("k >= 90").count() == 10
    assert df.filter("v IS NULL").count() == 50
    assert df.count() == 100


def test_dml_derives_null_filters(spark, path):
    from data_engineering_pipeline_project_cloud_spark import graft_sql
    from data_engineering_pipeline_project_cloud_spark.statements import (
        _derive_filters,
    )

    assert _derive_filters(spark, path,
                           "v IS NOT NULL AND k <= 10") == \
        [("v", "isnotnull", None), ("k", "<=", 10)]
    assert _derive_filters(spark, path, "s IS NULL") == \
        [("s", "isnull", None)]
    # OR disables derivation entirely (soundness)
    assert _derive_filters(spark, path,
                           "v IS NULL OR k = 1") is None
    # end-to-end through the statements
    graft_sql(spark, f"UPDATE `{path}` SET v = v + 1 "
                     f"WHERE v IS NOT NULL AND k <= 10")
    rows = {r["k"]: r["v"] for r in read_manifest(spark, path)
            .collect()}
    assert rows[5] == 6.0 and rows[20] == 20.0 and rows[60] is None
    graft_sql(spark, f"DELETE FROM `{path}` WHERE v IS NULL")
    assert read_manifest(spark, path).count() == 50


def test_stats_count_fallback(spark, path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        stats_count,
    )

    assert stats_count(spark, path, "v") == (50, "metadata")
    delete_where_dv(spark, path, "k = 5")  # v[5] was non-null
    n, source = stats_count(spark, path, "v")
    assert source == "scan" and n == 49
