"""Metadata-only MIN/MAX (round 11 — VERDICT r10 task 5):
`minmax_manifest` folds live-entry stats driver-side; it REFUSES —
and `stats_minmax` falls back to one exact scan — whenever metadata
cannot answer exactly (DV-masked file, missing stats, inexact type).
"""

from __future__ import annotations

import pytest

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    delete_where_dv,
    minmax_manifest,
    optimize_manifest,
    register,
    stats_minmax,
    write_frame,
)


@pytest.fixture()
def path(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "t")
    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) * 1.5 AS amt",
        "CONCAT('name-', id) AS name")
    write_frame(df.repartition(4), p, "overwrite",
                statCols="k,amt,name")
    return p


def test_metadata_path_exact(spark, path):
    assert minmax_manifest(path, ["k"]) == \
        {"k": {"min": 0, "max": 99}}
    vals, source = stats_minmax(spark, path, ["k"])
    assert source == "metadata"
    assert vals == {"k": {"min": 0, "max": 99}}


def test_dv_refuses_and_scan_fallback_is_exact(spark, path):
    # deletion-vector delete of both extremes: the masked files'
    # min/max rows are exactly the deleted ones — metadata MUST
    # refuse, and the scan fallback must see the post-delete extrema
    delete_where_dv(spark, path, "k = 0 OR k = 99")
    with pytest.raises(ValueError, match="deletion vector"):
        minmax_manifest(path, ["k"])
    vals, source = stats_minmax(spark, path, ["k"])
    assert source == "scan"
    assert vals == {"k": {"min": 1, "max": 98}}
    # OPTIMIZE materializes the DV debt -> metadata serves again
    optimize_manifest(spark, path, target_rows=1_000_000)
    vals, source = stats_minmax(spark, path, ["k"])
    assert source == "metadata"
    assert vals == {"k": {"min": 1, "max": 98}}


def test_missing_stats_refuses(spark, path):
    # a column outside statCols has no entry stats anywhere
    write_frame(spark.range(3).selectExpr(
        "id + 1000 AS k", "CAST(NULL AS DOUBLE) AS amt",
        "CAST(NULL AS STRING) AS name").coalesce(1),
        path, "append", statCols="amt")
    with pytest.raises(ValueError, match="no min/max stats"):
        minmax_manifest(path, ["k"])
    vals, source = stats_minmax(spark, path, ["k"])
    assert source == "scan"
    assert vals == {"k": {"min": 0, "max": 1002}}


def test_inexact_types_refuse_by_default(spark, path):
    with pytest.raises(ValueError, match="not metadata-servable"):
        minmax_manifest(path, ["name"])  # string: writer truncation
    with pytest.raises(ValueError, match="allow_float"):
        minmax_manifest(path, ["amt"])  # float: NaN ambiguity
    # explicit opt-in serves floats from metadata
    assert minmax_manifest(path, ["amt"], allow_float=True) == \
        {"amt": {"min": 0.0, "max": 148.5}}
    vals, source = stats_minmax(spark, path, ["name"])
    assert source == "scan"
    assert vals == {"name": {"min": "name-0", "max": "name-99"}}


def test_unknown_column_raises(spark, path):
    with pytest.raises(ValueError, match="unknown column"):
        minmax_manifest(path, ["nope"])


def test_empty_table_is_null(spark, tmp_path):
    from pyspark.sql.types import StructType

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        create_declared_table,
    )

    register(spark)
    p = str(tmp_path / "empty")
    create_declared_table(spark, p, StructType.fromDDL("k BIGINT"))
    assert minmax_manifest(p, ["k"]) == \
        {"k": {"min": None, "max": None}}
