"""SQL CHECK constraints
(sources/manifest_source.py:add_check_constraint): arbitrary boolean
predicates persisted in table state, validated against existing data
at ADD, enforced on every native write before publish, NULL-passing
(ANSI CHECK), and guarding rename/drop of referenced columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    add_check_constraint,
    drop_column_from_manifest,
    drop_table_constraint,
    load_manifest,
    read_manifest,
    register,
    rename_column_in_manifest,
    update_manifest,
    write_frame,
    write_manifest_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    df = spark.range(1, 21).select(
        F.col("id").alias("k"),
        (F.col("id") * 10.0).alias("amount"),
        F.concat(F.lit("c"), (F.col("id") % 3)).alias("cat"))
    write_manifest_table(df, path, ["k"])
    return path


def test_add_validates_existing_data(spark, table):
    with pytest.raises(ValueError, match="violated by existing rows"):
        add_check_constraint(spark, table, "amount_big", "amount > 50")
    # satisfied contract lands as metadata
    m = add_check_constraint(spark, table, "amount_pos",
                             "amount > 0 AND k < 1000")
    assert {"name": "amount_pos",
            "check": "amount > 0 AND k < 1000"} in m["constraints"]


def test_add_refuses_unknown_column(spark, table):
    with pytest.raises(Exception):  # Spark analysis error
        add_check_constraint(spark, table, "bad", "nope > 0")
    assert not load_manifest(table).get("constraints")


def test_violating_append_fails_and_publishes_nothing(spark, table):
    add_check_constraint(spark, table, "amount_pos", "amount > 0")
    v0 = load_manifest(table)["version"]
    good = spark.createDataFrame([(100, 5.0, "c1")],
                                 "k long, amount double, cat string")
    write_frame(good, table, "append", statCols="k")
    bad = spark.createDataFrame([(101, -1.0, "c1")],
                                "k long, amount double, cat string")
    with pytest.raises(ValueError, match="amount_pos"):
        write_frame(bad, table, "append", statCols="k")
    m = load_manifest(table)
    assert m["version"] == v0 + 1  # only the good append landed
    assert read_manifest(spark, table).count() == 21


def test_null_predicate_passes(spark, table):
    # ANSI CHECK: violated only when FALSE — NULL rows pass
    add_check_constraint(spark, table, "cat_known",
                         "cat IN ('c0', 'c1', 'c2')")
    nulls = spark.createDataFrame([(200, 1.0, None)],
                                  "k long, amount double, cat string")
    write_frame(nulls, table, "append", statCols="k")
    assert read_manifest(spark, table).count() == 21


def test_update_rewrite_enforces_check(spark, table):
    add_check_constraint(spark, table, "amount_pos", "amount > 0")
    with pytest.raises(ValueError, match="amount_pos"):
        update_manifest(spark, table, {"amount": "-amount"}, "k <= 3")
    # table unchanged by the refused update
    assert read_manifest(spark, table).filter(
        F.col("amount") < 0).count() == 0
    # a compliant update still works
    update_manifest(spark, table, {"amount": "amount + 1"}, "k = 1")
    assert read_manifest(spark, table).filter(
        F.col("k") == 1).collect()[0]["amount"] == 11.0


def test_python_datasource_write_refused(spark, table):
    add_check_constraint(spark, table, "amount_pos", "amount > 0")
    df = spark.createDataFrame([(300, 1.0, "c0")],
                               "k long, amount double, cat string")
    with pytest.raises(Exception, match="write_frame"):
        (df.write.format("graft_manifest").mode("append")
         .option("path", table).option("statCols", "k").save())


def test_rename_and_drop_of_referenced_column_refused(spark, table):
    add_check_constraint(spark, table, "amount_pos", "amount > 0")
    with pytest.raises(ValueError, match="amount_pos"):
        rename_column_in_manifest(table, "amount", "amt")
    with pytest.raises(ValueError, match="amount_pos"):
        drop_column_from_manifest(table, "amount")
    # unreferenced columns stay renamable
    rename_column_in_manifest(table, "cat", "category")
    # dropping the constraint BY NAME re-enables the rename
    drop_table_constraint(table, "amount_pos")
    rename_column_in_manifest(table, "amount", "amt")
    assert "amt" in read_manifest(spark, table).columns


def test_duplicate_name_refused_same_definition_idempotent(spark, table):
    add_check_constraint(spark, table, "amount_pos", "amount > 0")
    v = load_manifest(table)["version"]
    add_check_constraint(spark, table, "amount_pos", "amount > 0")
    assert load_manifest(table)["version"] == v  # idempotent re-add
    with pytest.raises(ValueError, match="different check constraint"):
        add_check_constraint(spark, table, "amount_pos", "amount > 1")


def test_subset_schema_append_null_passes_check(spark, table):
    # CHECK references `cat`; an append omitting the column NULL-fills
    # it, and NULL passes ANSI CHECK — accepted, not an analysis error
    add_check_constraint(spark, table, "cat_known",
                         "cat IN ('c0', 'c1', 'c2')")
    write_frame(spark.createDataFrame([(500, 1.0)],
                                      "k long, amount double"),
                table, "append", statCols="k")
    row = read_manifest(spark, table).filter(
        F.col("k") == 500).collect()
    assert len(row) == 1 and row[0]["cat"] is None


def test_drop_constraint_refuses_ambiguous_name(spark, table):
    # a CHECK named after a column that also carries a bounds
    # constraint: one call must not silently drop both contracts
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_table_constraint,
        drop_check_constraint,
    )

    add_table_constraint(table, {"col": "amount", "notNull": True})
    add_check_constraint(spark, table, "amount", "amount >= 0")
    with pytest.raises(ValueError, match="both"):
        drop_table_constraint(table, "amount")
    drop_check_constraint(table, "amount")  # removes ONLY the CHECK
    cons = load_manifest(table).get("constraints") or []
    assert any(c.get("col") == "amount" and not c.get("check")
               for c in cons)
    assert not any(c.get("check") for c in cons)
    drop_table_constraint(table, "amount")  # now unambiguous
    assert not (load_manifest(table).get("constraints") or [])


def test_drop_check_constraint_by_name_only(spark, table):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        drop_check_constraint,
    )

    add_check_constraint(spark, table, "pos_amount", "amount > 0")
    with pytest.raises(ValueError, match="no constraint"):
        drop_check_constraint(table, "nope")
    drop_check_constraint(table, "pos_amount")
    assert not (load_manifest(table).get("constraints") or [])
