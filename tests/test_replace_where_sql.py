"""``INSERT INTO .. REPLACE WHERE`` (round 11 — Delta's replaceWhere
backfill statement over ``overwrite_where``): one atomic commit
replaces exactly the scope's rows.
"""

from __future__ import annotations

import pytest

from data_engineering_pipeline_project_cloud_spark import graft_sql
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    load_manifest,
    register,
)


@pytest.fixture()
def path(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "t")
    spark.sql("SELECT CAST(id AS BIGINT) k, CAST(id % 5 AS INT) y, "
              "CAST(id AS DOUBLE) v FROM range(100)") \
        .createOrReplaceTempView("rw_src")
    graft_sql(spark, f"CREATE TABLE `{p}` AS SELECT * FROM rw_src")
    return p


def test_equality_scope_replaces_exactly(spark, path):
    spark.sql("SELECT CAST(id + 1000 AS BIGINT) k, CAST(2 AS INT) y, "
              "CAST(-1.0 AS DOUBLE) v FROM range(5)") \
        .createOrReplaceTempView("rw_bf")
    graft_sql(spark, f"INSERT INTO `{path}` REPLACE WHERE y = 2 "
                     f"SELECT * FROM rw_bf")
    got = {r["y"]: r["n"] for r in graft_sql(
        spark, f"SELECT y, COUNT(*) AS n FROM graft.`{path}` "
               f"GROUP BY y").collect()}
    assert got == {0: 20, 1: 20, 2: 5, 3: 20, 4: 20}


def test_between_scope_clears_whole_range(spark, path):
    # the backfill writes only y=3 rows, but the scope [3,4] clears
    # y=4 entirely — REPLACE semantics, not upsert
    spark.sql("SELECT CAST(id AS BIGINT) k, CAST(3 AS INT) y, "
              "CAST(9.0 AS DOUBLE) v FROM range(3)") \
        .createOrReplaceTempView("rw_bf2")
    graft_sql(spark, f"INSERT INTO `{path}` "
                     f"REPLACE WHERE y BETWEEN 3 AND 4 "
                     f"SELECT * FROM rw_bf2")
    got = {r["y"]: r["n"] for r in graft_sql(
        spark, f"SELECT y, COUNT(*) AS n FROM graft.`{path}` "
               f"GROUP BY y").collect()}
    assert got == {0: 20, 1: 20, 2: 20, 3: 3}


def test_out_of_scope_rows_refused_atomically(spark, path):
    v_before = load_manifest(path)["version"]
    spark.sql("SELECT CAST(id AS BIGINT) k, CAST(3 AS INT) y, "
              "CAST(9.0 AS DOUBLE) v FROM range(3)") \
        .createOrReplaceTempView("rw_bf3")
    with pytest.raises(Exception, match="outside the declared scope"):
        graft_sql(spark, f"INSERT INTO `{path}` REPLACE WHERE y = 1 "
                         f"SELECT * FROM rw_bf3")
    assert load_manifest(path)["version"] == v_before  # no commit


def test_grammar_refusals(spark, path):
    with pytest.raises(ValueError, match="not in table schema"):
        graft_sql(spark, f"INSERT INTO `{path}` "
                         f"REPLACE WHERE nope = 1 SELECT 1")
    with pytest.raises(ValueError, match="range forms"):
        graft_sql(spark, f"INSERT INTO `{path}` "
                         f"REPLACE WHERE y > 1 SELECT 1")
    with pytest.raises(ValueError, match="full column set"):
        graft_sql(spark, f"INSERT INTO `{path}` REPLACE WHERE y = 1 "
                         f"(k, y) SELECT CAST(1 AS BIGINT), "
                         f"CAST(1 AS INT)")
