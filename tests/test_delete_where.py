"""Predicate copy-on-write DELETE
(sources/manifest_source.py:delete_where — the Delta ``DELETE FROM
... WHERE`` statement): matched rows vanish, FALSE and NULL rows
survive (ANSI three-valued logic), only files containing matches are
rewritten, a fully-matched file commits pure tombstones, a no-match
delete commits nothing, and time travel still sees the pre-delete
snapshot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    delete_where,
    load_manifest,
    read_manifest,
    register,
    write_manifest_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("grp"),
        (F.col("id") * 1.5).alias("val"))
    write_manifest_table(df.repartitionByRange(5, "k"), path,
                         ["k", "grp"])
    return path


def test_delete_removes_matching_rows(spark, table):
    delete_where(spark, table, "grp = 7")
    rows = read_manifest(spark, table).collect()
    assert len(rows) == 90
    assert all(r["grp"] != 7 for r in rows)


def test_null_predicate_keeps_rows(spark, table):
    # ANSI DELETE: a row is deleted only when the predicate is TRUE
    delete_where(spark, table,
                 "IF(grp = 3, true, CAST(NULL AS boolean))")
    rows = read_manifest(spark, table).collect()
    assert len(rows) == 90
    assert all(r["grp"] != 3 for r in rows)


def test_delete_rewrites_only_matching_files(spark, table):
    files0 = {f["path"] for f in load_manifest(table)["files"]
              if not f.get("dead")}
    delete_where(spark, table, "k = 50")  # one range file holds it
    m1 = load_manifest(table)
    live1 = {f["path"] for f in m1["files"] if not f.get("dead")}
    assert len(files0 - live1) == 1, "exactly one file rewritten"
    assert len(files0 & live1) == len(files0) - 1
    assert read_manifest(spark, table).count() == 99


def test_delete_emptying_a_file_commits_tombstones(spark, table):
    n_files0 = sum(1 for f in load_manifest(table)["files"]
                   if not f.get("dead"))
    delete_where(spark, table, "k < 20")  # the whole first range file
    m = load_manifest(table)
    live = [f for f in m["files"] if not f.get("dead")]
    rows = read_manifest(spark, table).collect()
    assert len(rows) == 80 and all(r["k"] >= 20 for r in rows)
    # the emptied file is gone from the live set; no zero-row
    # replacement is required for correctness, but live entries must
    # never claim rows the data lacks
    assert sum(f["rows"] - int(f.get("dvRows", 0)) for f in live) == 80
    assert len(live) <= n_files0


def test_no_match_delete_commits_nothing(spark, table):
    v0 = load_manifest(table)["version"]
    delete_where(spark, table, "k = 12345")
    assert load_manifest(table)["version"] == v0


def test_filters_prune_candidates_and_time_travel(spark, table):
    v0 = load_manifest(table)["version"]
    delete_where(spark, table, "grp = 2 AND k < 40",
                 filters=[("k", "<", 40)])
    now = read_manifest(spark, table).collect()
    assert len(now) == 96
    assert all(not (r["grp"] == 2 and r["k"] < 40) for r in now)
    # pre-delete snapshot intact
    assert read_manifest(spark, table, version=v0).count() == 100


def test_delete_where_dv_masks_without_rewrite(spark, table):
    """Merge-on-read predicate DELETE (round 9, delete_where_dv):
    matched positions mask via deletion vectors — no data file
    written or rewritten — and the read path hides them."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_where_dv,
    )

    files0 = {f["path"] for f in load_manifest(table)["files"]}
    v0 = load_manifest(table)["version"]
    delete_where_dv(spark, table, "grp = 7")
    m = load_manifest(table)
    assert {f["path"] for f in m["files"]} == files0, \
        "metadata-only: no file added or removed"
    assert any(f.get("dv") for f in m["files"])
    rows = read_manifest(spark, table).collect()
    assert len(rows) == 90 and all(r["grp"] != 7 for r in rows)
    # time travel still sees the rows; NULL predicates keep rows
    assert read_manifest(spark, table, version=v0).count() == 100
    delete_where_dv(spark, table,
                    "IF(grp = 3, true, CAST(NULL AS boolean))")
    assert read_manifest(spark, table).count() == 80


def test_delete_where_dv_falls_back_to_rewrite(spark, table):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_where_dv,
    )

    files0 = {f["path"] for f in load_manifest(table)["files"]
              if not f.get("dead")}
    delete_where_dv(spark, table, "grp < 5", max_dv_rows=10)
    m = load_manifest(table)
    live = {f["path"] for f in m["files"] if not f.get("dead")}
    assert live != files0, "over-threshold delete paid the rewrite"
    assert read_manifest(spark, table).count() == 50


def test_delete_where_dv_respects_earlier_masks_and_renames(
        spark, table):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_where_dv,
        rename_column_in_manifest,
    )

    delete_where_dv(spark, table, "k = 10")
    # re-running an overlapping predicate must not re-collect the
    # dead position (mask idempotence) and must see renamed columns
    rename_column_in_manifest(table, "grp", "bucket")
    m = delete_where_dv(spark, table, "k IN (10, 11) AND bucket >= 0")
    rows = read_manifest(spark, table).collect()
    assert len(rows) == 98
    assert all(r["k"] not in (10, 11) for r in rows)


def test_truncate_is_metadata_only_and_keeps_contract(spark, table):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_check_constraint,
        truncate_manifest,
        write_frame,
    )

    add_check_constraint(spark, table, "pos_val", "val >= 0")
    v0 = load_manifest(table)["version"]
    paths0 = {f["path"] for f in load_manifest(table)["files"]}
    truncate_manifest(table)
    m = load_manifest(table)
    assert {f["path"] for f in m["files"]} == paths0, "metadata only"
    assert not [f for f in m["files"] if not f.get("dead")]
    assert read_manifest(spark, table).count() == 0
    # contract survives: schema, CHECK constraint
    assert any(c.get("name") == "pos_val" for c in m["constraints"])
    with pytest.raises(Exception, match="pos_val"):
        write_frame(spark.createDataFrame(
            [(1, 1, -1.0, "bad")],
            "k long, grp long, val double, name string"),
            table, "append", statCols="k")
    # time travel below the truncate still sees the rows
    assert read_manifest(spark, table, version=v0).count() == 100
    # idempotent: truncating an empty table commits nothing
    v1 = load_manifest(table)["version"]
    truncate_manifest(table)
    assert load_manifest(table)["version"] == v1
