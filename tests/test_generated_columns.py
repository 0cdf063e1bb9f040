"""Generated columns
(sources/manifest_source.py:add_generated_column): omitted columns are
computed at write, supplied ones verified pre-publish, inconsistent
values refused, source renames/drops guarded, backfill rewrites, and
dropping the declaration demotes to an ordinary column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    add_generated_column,
    drop_generated_column_decl,
    load_manifest,
    read_manifest,
    register,
    rename_column_in_manifest,
    update_manifest,
    write_frame,
    write_manifest_table,
)


@pytest.fixture()
def declared(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)],
                               "k long, v double")
    write_manifest_table(df.withColumn("v2", F.col("v") * 2), path,
                         ["k"])
    add_generated_column(spark, path, "v2", "v * 2")
    return path


def test_omitted_column_is_computed(spark, declared):
    write_frame(spark.createDataFrame([(3, 30.0)],
                                      "k long, v double"),
                declared, "append", statCols="k")
    rows = {r["k"]: r["v2"]
            for r in read_manifest(spark, declared).collect()}
    assert rows[3] == 60.0


def test_supplied_value_verified(spark, declared):
    # consistent passes
    write_frame(spark.createDataFrame(
        [(4, 1.0, 2.0)], "k long, v double, v2 double"),
        declared, "append", statCols="k")
    # inconsistent refused, nothing published
    with pytest.raises(ValueError, match="_generated_v2"):
        write_frame(spark.createDataFrame(
            [(5, 1.0, 99.0)], "k long, v double, v2 double"),
            declared, "append", statCols="k")
    assert read_manifest(spark, declared).count() == 3


def test_update_must_keep_generated_consistent(spark, declared):
    # updating a SOURCE column recomputes the generated column from
    # the post-assignment row (Delta UPDATE semantics; round-9 fix —
    # previously the stale stored value was carried and the commit
    # refused, making UPDATE unusable on such tables)
    update_manifest(spark, declared, {"v": "v + 1"}, "k = 1")
    r = read_manifest(spark, declared).filter("k = 1").collect()[0]
    assert (r["v"], r["v2"]) == (11.0, 22.0)
    # an explicit CONSISTENT assignment of the generated column is
    # written as given and verified
    update_manifest(spark, declared,
                    {"v": "v + 1", "v2": "(v + 1) * 2"}, "k = 1")
    r = read_manifest(spark, declared).filter("k = 1").collect()[0]
    assert (r["v"], r["v2"]) == (12.0, 24.0)
    # an explicit INCONSISTENT assignment is still refused pre-publish
    with pytest.raises(ValueError, match="_generated_v2"):
        update_manifest(spark, declared, {"v2": "999"}, "k = 1")


def test_declare_existing_violating_data_refused(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "bad")
    df = spark.createDataFrame([(1, 10.0)], "k long, v double")
    write_manifest_table(df.withColumn("v2", F.lit(0.0)), path, ["k"])
    with pytest.raises(ValueError, match="disagrees"):
        add_generated_column(spark, path, "v2", "v * 2")
    assert not load_manifest(path).get("generatedCols")


def test_backfill_adds_and_computes(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "bf")
    write_manifest_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)],
                              "k long, v double"), path, ["k"])
    with pytest.raises(ValueError, match="backfill"):
        add_generated_column(spark, path, "v3", "v + 5")
    add_generated_column(spark, path, "v3", "v + 5", backfill=True)
    rows = {r["k"]: r["v3"]
            for r in read_manifest(spark, path).collect()}
    assert rows == {1: 15.0, 2: 25.0}
    # re-run (crash recovery) is idempotent
    add_generated_column(spark, path, "v3", "v + 5", backfill=True)
    assert read_manifest(spark, path).count() == 2


def test_source_rename_refused_generated_rename_carries(spark, declared):
    with pytest.raises(ValueError, match="source of generated"):
        rename_column_in_manifest(declared, "v", "value")
    rename_column_in_manifest(declared, "v2", "double_v")
    assert load_manifest(declared)["generatedCols"] == \
        {"double_v": "v * 2"}


def test_drop_declaration_demotes_to_ordinary(spark, declared):
    drop_generated_column_decl(declared, "v2")
    write_frame(spark.createDataFrame(
        [(9, 1.0, 123.0)], "k long, v double, v2 double"),
        declared, "append", statCols="k")
    r = read_manifest(spark, declared).filter("k = 9").collect()[0]
    assert r["v2"] == 123.0
    with pytest.raises(ValueError, match="no generated"):
        drop_generated_column_decl(declared, "v2")


def test_history_labels_and_describe_surface_round8_ops(spark, tmp_path):
    import glob
    import os
    import shutil

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_check_constraint,
        copy_into,
        describe_manifest,
        drop_table_constraint,
        manifest_operations,
        set_column_default,
    )
    register(spark)
    t = str(tmp_path / "hist")
    write_manifest_table(
        spark.createDataFrame([(1, 10.0)], "k long, v double"), t, ["k"])
    add_check_constraint(spark, t, "vpos", "v > 0")
    set_column_default(spark, t, "v", "1.5")
    add_generated_column(spark, t, "v2", "v * 2", backfill=True)
    src = str(tmp_path / "landing")
    os.makedirs(src)
    (spark.createDataFrame([(5, 1.0, 2.0)],
                           "k long, v double, v2 double")
     .coalesce(1).write.mode("overwrite").parquet(src + "/_t"))
    shutil.move(glob.glob(src + "/_t/*.parquet")[0], src + "/x.parquet")
    copy_into(spark, t, src + "/x.parquet")
    set_column_default(spark, t, "v", None)
    drop_generated_column_decl(t, "v2")
    drop_table_constraint(t, "vpos")
    labels = [o["operation"] for o in manifest_operations(t)]
    for want in ("CREATE", "ADD CONSTRAINT", "SET DEFAULT",
                 "ADD GENERATED COLUMN", "COPY INTO", "UNSET DEFAULT",
                 "DROP GENERATED COLUMN", "DROP CONSTRAINT"):
        assert want in labels, (want, labels)
    d = describe_manifest(t)
    assert d["numCopiedFiles"] == 1
    assert d["columnDefaults"] == {} and d["generatedCols"] == {}


def test_python_datasource_write_refused_on_generated_table(
        spark, declared):
    df = spark.createDataFrame([(50, 1.0, 2.0)],
                               "k long, v double, v2 double")
    with pytest.raises(Exception, match="write_frame"):
        (df.write.format("graft_manifest").mode("append")
         .option("path", declared).option("statCols", "k").save())
