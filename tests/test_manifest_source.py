"""Manifest-table source (sources/manifest_source.py): footer-stats
manifest build, file pruning under pushed filters, correctness vs the
plain scan, and the never-prune-on-doubt contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
    StringStartsWith,
)

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    ManifestReader,
    _file_survives,
    register,
    write_manifest_table,
)
from data_engineering_pipeline_project_cloud_spark.testing import diff_results


@pytest.fixture(scope="module")
def manifest_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("manifest_orders"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.year("o_orderdate").cast("int").alias("order_year"))
    m = write_manifest_table(
        orders.repartitionByRange(5, "order_year"), path,
        ["order_year", "o_orderkey"])
    return path, m


def test_manifest_has_files_and_stats(manifest_dir):
    _, m = manifest_dir
    assert len(m["files"]) >= 2, "range partitioning should yield >1 file"
    for f in m["files"]:
        assert f["rows"] > 0
        assert "order_year" in f["stats"]
        s = f["stats"]["order_year"]
        assert s["min"] <= s["max"]


def test_pushed_filter_prunes_files(manifest_dir):
    path, m = manifest_dir
    rd = ManifestReader({"path": path})
    total = len(rd.partitions())
    assert total == len(m["files"])
    cutoff = max(f["stats"]["order_year"]["min"] for f in m["files"])
    unsupported = list(rd.pushFilters(
        [GreaterThanOrEqual(("order_year",), cutoff)]))
    # every filter is declared unsupported (Spark re-applies row-wise)
    assert len(unsupported) == 1
    surviving = len(rd.partitions())
    assert surviving < total
    # exactly the stat-overlapping files survive
    want = sum(1 for f in m["files"]
               if f["stats"]["order_year"]["max"] >= cutoff)
    assert surviving == want


def test_scan_matches_plain_read(spark, sf_dir, manifest_dir):
    path, _ = manifest_dir
    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    got = (spark.read.format("graft_manifest").option("path", path).load()
           .filter(F.col("order_year") >= 1997)
           .groupBy("order_year").agg(F.count(F.lit(1)).alias("n")))
    want = (load_table(spark, sf_dir, "orders")
            .withColumn("order_year", F.year("o_orderdate").cast("int"))
            .filter(F.col("order_year") >= 1997)
            .groupBy("order_year").agg(F.count(F.lit(1)).alias("n")))
    problems = diff_results(got.columns, [tuple(r) for r in got.collect()],
                            want.columns, [tuple(r) for r in want.collect()])
    assert not problems, "; ".join(problems)


def test_never_prunes_on_doubt():
    stats = {"y": {"min": 10, "max": 20}}
    # disjoint range: pruned
    assert not _file_survives(stats, [LessThan(("y",), 10)])
    assert not _file_survives(stats, [EqualTo(("y",), 99)])
    # inside range: kept
    assert _file_survives(stats, [EqualTo(("y",), 15)])
    # unknown column, unsupported filter kinds, incomparable literal:
    # all kept
    assert _file_survives(stats, [EqualTo(("other",), 1)])
    assert _file_survives(stats, [IsNotNull(("y",))])
    assert _file_survives(stats, [StringStartsWith(("y",), "1")])
    assert _file_survives(stats, [EqualTo(("y",), "not-an-int")])


def test_registry_face_oracle_shape(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.plans.relational import (
        manifest_pruned_scan,
    )
    out = manifest_pruned_scan(spark, sf_dir)
    rows = {r["order_year"]: r["n_orders"] for r in out.collect()}
    assert rows and min(rows) >= 1997
