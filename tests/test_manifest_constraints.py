"""Persisted table CHECK constraints (Delta `ALTER TABLE ... ADD
CONSTRAINT` semantics): one metadata commit, enforced executor-side
on every future write by every writer — violating commits fail before
a byte publishes and leave no orphans.
"""

from __future__ import annotations

import glob
import os

import pytest

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    add_table_constraint,
    clone_manifest,
    drop_column_from_manifest,
    drop_table_constraint,
    load_manifest,
    register,
    rename_column_in_manifest,
    restore_manifest,
    write_manifest_table,
)


def _read(spark, path):
    return (spark.read.format("graft_manifest").option("path", path)
            .load())


def _append(df, path):
    (df.coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "k").save())


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    register(spark)
    path = str(tmp_path / "cons")
    write_manifest_table(
        spark.createDataFrame([(1, 10.0)], "k long, v double")
        .coalesce(1), path, ["k"])
    add_table_constraint(path, {"col": "v", "min": 0.0, "max": 100.0})
    return path


def test_violating_append_fails_and_unpublishes(spark, sf_dir, table):
    with pytest.raises(Exception, match="constraint violated"):
        _append(spark.createDataFrame([(2, -5.0)], "k long, v double"),
                table)
    m = load_manifest(table)
    live = {os.path.basename(f["path"]) for f in m["files"]}
    on_disk = {os.path.basename(p)
               for p in glob.glob(os.path.join(table, "*.parquet"))}
    assert on_disk == live, "failed commit must leave no orphan files"
    assert _read(spark, table).count() == 1
    # a conforming append still lands — by a FRESH writer that learned
    # the constraint from table state, not from a write option
    _append(spark.createDataFrame([(2, 55.0)], "k long, v double"),
            table)
    assert _read(spark, table).count() == 2


def test_not_null_constraint(spark, sf_dir, table):
    add_table_constraint(table, {"col": "k", "notNull": True})
    with pytest.raises(Exception, match="NULL"):
        _append(spark.createDataFrame([(None, 5.0)],
                                      "k long, v double"), table)
    assert _read(spark, table).count() == 1


def test_constraint_follows_rename_and_blocks_drop(spark, sf_dir,
                                                   table):
    rename_column_in_manifest(table, "v", "value")
    m = load_manifest(table)
    assert m["constraints"] == [{"col": "value", "min": 0.0,
                                 "max": 100.0}]
    with pytest.raises(Exception, match="constraint violated: value"):
        (spark.createDataFrame([(3, 999.0)], "k long, value double")
         .coalesce(1).write.format("graft_manifest").mode("append")
         .option("path", table).option("statCols", "k").save())
    with pytest.raises(ValueError, match="persisted constraint"):
        drop_column_from_manifest(table, "value")
    drop_table_constraint(table, "value")
    (spark.createDataFrame([(3, 999.0)], "k long, value double")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", table).option("statCols", "k").save())
    assert _read(spark, table).count() == 2


def test_write_planned_before_constraint_fails_at_commit(
        spark, sf_dir, table, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        ManifestArrowWriter,
        _FileCommit,
    )

    schema = StructType([StructField("k", LongType()),
                         StructField("v", DoubleType())])
    w = ManifestArrowWriter({"path": table, "statcols": "k"},
                            schema, overwrite=False)  # plans now
    add_table_constraint(table, {"col": "k", "notNull": True})
    staged = os.path.join(table, ".late.parquet.tmp")
    pq.write_table(pa.table({"k": [5], "v": [1.0]}), staged)
    msg = _FileCommit(tmp_path=staged,
                      final_path=os.path.join(table, "late.parquet"),
                      rows=1, stats={"k": {"min": 5, "max": 5}})
    with pytest.raises(ValueError, match="constraints changed"):
        w.commit([msg])


def test_constraints_carry_through_clone_and_restore(spark, sf_dir,
                                                     table, tmp_path):
    dst = str(tmp_path / "cons_clone")
    clone_manifest(table, dst)
    with pytest.raises(Exception, match="constraint violated"):
        _append(spark.createDataFrame([(9, -1.0)], "k long, v double"),
                dst)
    # dropping the constraint then restoring to the constrained
    # version brings the contract back
    v_cons = load_manifest(table)["version"]
    drop_table_constraint(table, "v")
    _append(spark.createDataFrame([(9, -1.0)], "k long, v double"),
            table)
    restore_manifest(table, v_cons)
    with pytest.raises(Exception, match="constraint violated"):
        _append(spark.createDataFrame([(10, -2.0)],
                                      "k long, v double"), table)


def test_add_drop_validation(spark, sf_dir, table):
    with pytest.raises(ValueError, match="not in table schema"):
        add_table_constraint(table, {"col": "zzz", "min": 0})
    with pytest.raises(ValueError, match="notNull and/or min/max"):
        add_table_constraint(table, {"col": "v"})
    with pytest.raises(ValueError, match="no constraint"):
        drop_table_constraint(table, "k")
    # idempotent re-add is a no-op commit
    v = load_manifest(table)["version"]
    add_table_constraint(table, {"col": "v", "min": 0.0, "max": 100.0})
    assert load_manifest(table)["version"] == v


def test_manifest_operations_labels(spark, sf_dir, tmp_path):
    """DESCRIBE HISTORY operation labels across one of everything."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        clone_manifest,
        compact_manifest,
        delete_vectors_from_manifest,
        drop_column_from_manifest,
        manifest_operations,
        rename_column_in_manifest,
        restore_manifest,
    )

    register(spark)
    path = str(tmp_path / "ops")
    write_manifest_table(
        spark.createDataFrame([(i, float(i), "x") for i in range(40)],
                              "k long, v double, tag string")
        .coalesce(2), path, ["k"])                      # v0 WRITE
    _append(spark.createDataFrame([(100, 1.0, "y")],
                                  "k long, v double, tag string"),
            path)                                       # v1 WRITE
    rename_column_in_manifest(path, "v", "value")       # v2 RENAME
    add_table_constraint(path, {"col": "k", "notNull": True})  # v3 ADD
    drop_table_constraint(path, "k")                    # v4 DROP CONS
    drop_column_from_manifest(path, "tag")              # v5 DROP COL
    delete_vectors_from_manifest(
        spark.createDataFrame([(3,)], "k long"), path, ["k"],
        ["k"])                                          # v6 DELETE (DV)
    compact_manifest(spark, path, ["k"], 10**9)         # v7 REWRITE
    restore_manifest(path, 5)                           # v8 RESTORE
    ops = {o["version"]: o["operation"]
           for o in manifest_operations(path)}
    assert ops[0] == "CREATE" and ops[1] == "WRITE"
    assert ops[2] == "RENAME COLUMN"
    assert ops[3] == "ADD CONSTRAINT"
    assert ops[4] == "DROP CONSTRAINT"
    assert ops[5] == "DROP COLUMN"
    assert ops[6] == "DELETE (DV)"
    assert ops[7] == "REWRITE"
    assert ops[8] == "RESTORE"
    labeled = {o["version"]: o for o in manifest_operations(path)}
    assert labeled[2]["detail"] == {"from": "v", "to": "value"}
    assert labeled[8]["detail"] == {"of": 5}
    # clone labels v0 of the new table
    dst = str(tmp_path / "ops_clone")
    clone_manifest(path, dst)
    assert manifest_operations(dst)[0]["operation"] == "CLONE"


def test_overwrite_labels_as_overwrite(spark, sf_dir, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        manifest_operations,
    )

    register(spark)
    path = str(tmp_path / "ovw")
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    write_manifest_table(df.coalesce(1), path, ["k"])
    (df.coalesce(1).write.format("graft_manifest").mode("overwrite")
     .option("path", path).option("statCols", "k").save())
    ops = manifest_operations(path)
    assert ops[-1]["operation"] == "OVERWRITE"
