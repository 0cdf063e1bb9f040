"""Differential oracle tests: every registry query vs its DuckDB SQL.

Mirrors the driver's t2 check (row count + column names +
order-insensitive canonical values) at sf0.001; queries without oracle
SQL get the weaker runs-and-returns-rows check.
"""

from __future__ import annotations

import pytest

from data_engineering_pipeline_project_cloud_spark.plans import (
    all_oracle_sql,
    all_queries,
)
from data_engineering_pipeline_project_cloud_spark.testing import diff_results

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = diff_results(sdf.columns, srows, ocols, orows)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
