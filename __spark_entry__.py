"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``data_engineering_pipeline_project_cloud_spark``
package; this module only adapts the registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_pipeline_project_cloud_spark.plans import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the master-table wide-fact build (the
    reference's transform-complex-full.py analog) at sf0.001."""
    from data_engineering_pipeline_project_cloud_spark.plans.parity import master_table

    # driver-owned session: pin the two runtime confs the engine's
    # timestamp semantics depend on (see plans/registry.py:_scope)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return master_table(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable
    query; keys absent here get the weaker rows-only check."""
    return all_oracle_sql()
