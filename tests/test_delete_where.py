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
