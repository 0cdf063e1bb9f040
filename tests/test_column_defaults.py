"""Column DEFAULT values
(sources/manifest_source.py:set_column_default): appends omitting the
column fill the default, frames carrying it (even NULL) write as
given, defaults are not retroactive, follow renames, die with drops,
reset on overwrite, and survive checkpoints.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    CHECKPOINT_EVERY,
    _invalidate_caches,
    drop_column_from_manifest,
    load_manifest,
    read_manifest,
    register,
    rename_column_in_manifest,
    set_column_default,
    write_frame,
    write_manifest_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)],
        "k long, tag string, score double")
    write_manifest_table(df, path, ["k"])
    return path


def test_append_omitting_column_fills_default(spark, table):
    set_column_default(spark, table, "score", "0.0")
    set_column_default(spark, table, "tag", "'untagged'")
    write_frame(spark.createDataFrame([(3,)], "k long"),
                table, "append", statCols="k")
    rows = {r["k"]: (r["tag"], r["score"])
            for r in read_manifest(spark, table).collect()}
    assert rows[3] == ("untagged", 0.0)
    assert rows[1] == ("a", 10.0)  # existing rows untouched


def test_frame_carrying_null_writes_null(spark, table):
    set_column_default(spark, table, "tag", "'untagged'")
    # SQL INSERT contract: explicit NULL is NULL, not the default
    write_frame(spark.createDataFrame(
        [(4, None, 1.0)], "k long, tag string, score double"),
        table, "append", statCols="k")
    rows = {r["k"]: r["tag"]
            for r in read_manifest(spark, table).collect()}
    assert rows[4] is None


def test_default_not_retroactive(spark, table):
    # a file written WITHOUT the column, before the default existed
    write_frame(spark.createDataFrame([(5, 1.0)],
                                      "k long, score double"),
                table, "append", statCols="k")
    set_column_default(spark, table, "tag", "'late'")
    write_frame(spark.createDataFrame([(6, 2.0)],
                                      "k long, score double"),
                table, "append", statCols="k")
    rows = {r["k"]: r["tag"]
            for r in read_manifest(spark, table).collect()}
    assert rows[5] is None   # pre-default file stays NULL
    assert rows[6] == "late"


def test_column_reference_refused(spark, table):
    with pytest.raises(Exception):  # analysis error: no columns exist
        set_column_default(spark, table, "score", "k + 1")
    with pytest.raises(ValueError, match="not in table schema"):
        set_column_default(spark, table, "nope", "1")


def test_rename_carries_drop_kills_overwrite_resets(spark, table):
    set_column_default(spark, table, "tag", "'x'")
    rename_column_in_manifest(table, "tag", "label")
    assert load_manifest(table)["columnDefaults"] == {"label": "'x'"}
    write_frame(spark.createDataFrame([(7, 1.0)],
                                      "k long, score double"),
                table, "append", statCols="k")
    rows = {r["k"]: r["label"]
            for r in read_manifest(spark, table).collect()}
    assert rows[7] == "x"
    drop_column_from_manifest(table, "label")
    assert load_manifest(table)["columnDefaults"] == {}
    set_column_default(spark, table, "score", "9.9")
    write_frame(spark.createDataFrame([(8, 1.0)],
                                      "k long, score double"),
                table, "overwrite", statCols="k")
    assert load_manifest(table)["columnDefaults"] == {}


def test_unset_default(spark, table):
    set_column_default(spark, table, "tag", "'x'")
    set_column_default(spark, table, "tag", None)
    assert load_manifest(table)["columnDefaults"] == {}
    with pytest.raises(ValueError, match="no default"):
        set_column_default(spark, table, "tag", None)
    write_frame(spark.createDataFrame([(9, 1.0)],
                                      "k long, score double"),
                table, "append", statCols="k")
    rows = {r["k"]: r["tag"]
            for r in read_manifest(spark, table).collect()}
    assert rows[9] is None


def test_default_survives_checkpoint_and_fresh_process(spark, table):
    set_column_default(spark, table, "tag", "'ck'")
    filler = spark.createDataFrame([(0, "f", 0.0)],
                                   "k long, tag string, score double")
    for _ in range(CHECKPOINT_EVERY + 1):
        write_frame(filler, table, "append", statCols="k")
    _invalidate_caches()
    assert load_manifest(table)["columnDefaults"] == {"tag": "'ck'"}


def test_defaults_change_after_planning_fails_commit(spark, table):
    # a SET DEFAULT landing between a write's planning snapshot and
    # its commit must FAIL the commit: the append filled (or skipped)
    # omitted columns under the OLD defaults, so publishing it would
    # write NULLs where the current contract fills a value
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        ManifestArrowWriter,
        _FileCommit,
    )

    schema = StructType([StructField("k", LongType()),
                         StructField("tag", StringType()),
                         StructField("score", DoubleType())])
    w = ManifestArrowWriter({"path": table, "statcols": "k"},
                            schema, overwrite=False)  # plans now
    set_column_default(spark, table, "score", "1.5")  # lands late
    staged = os.path.join(table, ".late.parquet.tmp")
    pq.write_table(
        pa.table({"k": [5], "tag": ["x"], "score": [2.0]}), staged)
    msg = _FileCommit(tmp_path=staged,
                      final_path=os.path.join(table, "late.parquet"),
                      rows=1, stats={"k": {"min": 5, "max": 5}})
    with pytest.raises(ValueError, match="column defaults changed"):
        w.commit([msg])
