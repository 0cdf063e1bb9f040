"""Copy-on-write UPDATE ... SET ... WHERE
(sources/manifest_source.py:update_manifest): matched rows take the
assignments, unmatched rows survive byte-identical, only files
containing matches are rewritten, deletion vectors and rename epochs
are honored, and a no-match update commits nothing.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    delete_vectors_from_manifest,
    load_manifest,
    read_manifest,
    register,
    rename_column_in_manifest,
    update_manifest,
    write_manifest_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
        F.concat(F.lit("row"), F.col("id")).alias("name"))
    write_manifest_table(df.repartitionByRange(5, "k"), path,
                         ["k", "grp"])
    return path


def test_update_applies_assignments_under_where(spark, table):
    update_manifest(spark, table,
                    {"val": "val * 2", "name": "upper(name)"},
                    "grp = 7")
    rows = {r["k"]: (r["val"], r["name"])
            for r in read_manifest(spark, table).collect()}
    assert rows[7] == (7 * 1.5 * 2, "ROW7")
    assert rows[17] == (17 * 1.5 * 2, "ROW17")
    # unmatched rows byte-identical
    assert rows[8] == (8 * 1.5, "row8")
    assert len(rows) == 100


def test_update_rewrites_only_matching_files(spark, table):
    m0 = load_manifest(table)
    files0 = {f["path"] for f in m0["files"] if not f.get("dead")}
    # k = 50 lives in exactly one range-partitioned file
    update_manifest(spark, table, {"name": "'hit'"}, "k = 50")
    m1 = load_manifest(table)
    live1 = {f["path"] for f in m1["files"] if not f.get("dead")}
    untouched = files0 & live1
    assert len(files0 - live1) == 1, "exactly one file rewritten"
    assert len(untouched) == len(files0) - 1
    # untouched entries are the SAME files (no data movement)
    for f in m1["files"]:
        if f["path"] in untouched:
            assert os.path.exists(f["path"])


def test_update_assignments_read_original_row(spark, table):
    # {"k": "grp", "grp": "k"} must SWAP, not chain
    update_manifest(spark, table, {"k": "grp", "grp": "k"}, "k = 42")
    r = read_manifest(spark, table).filter(F.col("grp") == 42).collect()
    assert len(r) == 1
    assert r[0]["k"] == 2


def test_no_match_update_commits_nothing(spark, table):
    v0 = load_manifest(table)["version"]
    update_manifest(spark, table, {"val": "0.0"}, "grp = 999")
    assert load_manifest(table)["version"] == v0


def test_update_honors_deletion_vectors_and_renames(spark, table):
    delete_vectors_from_manifest(
        spark.createDataFrame([(3,), (97,)], "k long"),
        table, ["k"], ["k", "grp"])
    rename_column_in_manifest(table, "val", "value")
    update_manifest(spark, table, {"value": "value + 100"}, "grp = 3")
    rows = {r["k"]: r["value"]
            for r in read_manifest(spark, table).collect()}
    # the DV-deleted row (k=3, grp=3) must NOT be resurrected by the
    # rewrite of its file
    assert 3 not in rows and 97 not in rows
    assert rows[13] == 13 * 1.5 + 100
    assert rows[14] == 14 * 1.5
    assert len(rows) == 98


def test_update_filters_prune_candidate_scan(spark, table):
    # stats filters restrict the FIND scan; result is still exact
    update_manifest(spark, table, {"name": "'pruned'"}, "k = 60",
                    filters=[("k", ">=", 60), ("k", "<=", 60)])
    r = read_manifest(spark, table).filter(F.col("k") == 60).collect()
    assert r[0]["name"] == "pruned"


def test_update_null_where_leaves_row(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, None), (2, 5)], "k long, flag int")
    write_manifest_table(df, path, ["k"])
    # three-valued logic: NULL predicate does not fire the assignment
    update_manifest(spark, path, {"k": "k + 100"}, "flag > 1")
    assert {r["k"] for r in read_manifest(spark, path).collect()} \
        == {1, 102}


def test_update_unknown_column_refused(spark, table):
    with pytest.raises(ValueError, match="unknown column"):
        update_manifest(spark, table, {"nope": "1"}, "true")


def test_update_preserves_hidden_partition_layout(spark, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        write_frame,
    )
    register(spark)
    path = str(tmp_path / "hp")
    df = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 3}-15 00:00:00", float(i))
         for i in range(12)],
        "k long, ts_s string, val double").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts"), "val")
    write_frame(df, path, "append", statCols="k",
                partitionGen="pm=month(ts)")
    update_manifest(spark, path, {"val": "val + 100"}, "k = 4")
    m = load_manifest(path)
    live = [f for f in m["files"] if not f.get("dead")]
    # every rewritten file still carries its hidden partition value
    assert all(f.get("partition") and "pm" in f["partition"]
               for f in live), live
    rows = {r["k"]: r["val"]
            for r in read_manifest(spark, path).collect()}
    assert rows[4] == 104.0 and rows[5] == 5.0 and len(rows) == 12


@pytest.mark.parametrize("pred_kind", ["grp_eq", "val_gt", "conj"])
def test_update_matches_python_reference_randomized(
        spark, tmp_path_factory, pred_kind):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 3),
                  st.one_of(st.none(), st.integers(-5, 5))),
        min_size=1, max_size=12, unique_by=lambda r: r[0])

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(rows=rows_strategy, g=st.integers(0, 3),
           v=st.integers(-5, 5))
    def run(rows, g, v):
        pred = {"grp_eq": f"grp = {g}",
                "val_gt": f"val > {v}",
                "conj": f"k % 2 = 0 AND grp = {g}"}[pred_kind]

        def matches(k, grp, val):
            if pred_kind == "grp_eq":
                return grp == g
            if pred_kind == "val_gt":
                return val is not None and val > v
            return k % 2 == 0 and grp == g

        path = str(tmp_path_factory.mktemp("prop") / "t")
        df = spark.createDataFrame(rows,
                                   "k long, grp long, val long")
        write_manifest_table(df.repartition(2), path, ["k"])
        update_manifest(spark, path,
                        {"val": "k * 10", "k": "k + 100"}, pred)
        got = {(r["k"], r["grp"], r["val"])
               for r in read_manifest(spark, path).collect()}
        want = {((k + 100, grp, k * 10) if matches(k, grp, val)
                 else (k, grp, val))
                for k, grp, val in rows}
        assert got == want

    run()


def test_update_carries_bloom_filters_through_rewrite(spark, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        write_frame,
    )
    register(spark)
    path = str(tmp_path / "bloom")
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    write_frame(df.repartitionByRange(2, "k"), path, "append",
                statCols="k", bloomCols="k")
    update_manifest(spark, path, {"v": "v + 1"}, "k = 10")
    live = [f for f in load_manifest(path)["files"]
            if not f.get("dead")]
    # every live file — including the rewritten one — keeps its bloom
    assert all(f.get("bloom") or f.get("bloomRef") for f in live), live


def test_update_preserves_first_class_partition_values(spark, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        write_frame,
    )
    register(spark)
    path = str(tmp_path / "fcp")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(12)],
        "k long, region long, val double")
    write_frame(df, path, "append", statCols="k",
                partitionCols="region")
    update_manifest(spark, path, {"val": "val + 100"}, "k = 4")
    live = [f for f in load_manifest(path)["files"]
            if not f.get("dead")]
    # rewritten files keep their partition values (one combo per file)
    assert all((f.get("partition") or {}).get("region") is not None
               for f in live), live
    rows = {r["k"]: r["val"]
            for r in read_manifest(spark, path).collect()}
    assert rows[4] == 104.0 and len(rows) == 12


def test_update_recomputes_generated_columns(spark, tmp_path):
    # Delta UPDATE semantics: a generated column whose SOURCE the
    # update touches is recomputed from the post-assignment row —
    # without this the rewrite carries the stale stored value and
    # write_frame's synthetic `<=>` verification refuses the commit
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_generated_column,
    )

    register(spark)
    path = str(tmp_path / "gen")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_manifest_table(df.repartitionByRange(4, "k"), path,
                         ["k", "v"])
    add_generated_column(spark, path, "v10", "v * 10",
                         dtype="bigint", backfill=True)
    update_manifest(spark, path, {"v": "v + 1"}, "k < 10")
    rows = {r["k"]: (r["v"], r["v10"])
            for r in read_manifest(spark, path).collect()}
    assert rows[3] == (7, 70)      # matched: v updated, v10 recomputed
    assert rows[20] == (40, 400)   # unmatched: byte-identical
    assert len(rows) == 40


def test_update_explicit_generated_assignment_still_verified(
        spark, tmp_path):
    # assigning the generated column DIRECTLY writes as given — and
    # an inconsistent value is still refused pre-publish
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_generated_column,
    )

    register(spark)
    path = str(tmp_path / "gen2")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    write_manifest_table(df, path, ["k"])
    add_generated_column(spark, path, "v10", "v * 10",
                         dtype="bigint", backfill=True)
    with pytest.raises(Exception, match="violated"):
        update_manifest(spark, path, {"v10": "999"}, "k = 1")
    # the refused rewrite left the table untouched
    rows = {r["k"]: r["v10"]
            for r in read_manifest(spark, path).collect()}
    assert rows[1] == 20
