"""Data-quality expectations (dbt-test / Great-Expectations family).

The reference enforces exactly one data contract — the master-table
PK (``scripts/transform-complex-full.py:212-213``) — and relies on
Postgres to reject violations.  Spark has no constraints, so the
contract becomes a CHECK SUITE: each expectation is a distributed
aggregation returning a violation count; only the counts reach the
driver (never the violating rows — at 100 TB a "select the bad rows"
check is itself a job, run it only after the count says you must).

All expectations compose into one pass per table where possible:
``check_table`` unions the individual counts into a single report
DataFrame, so the whole suite is a handful of scans regardless of how
many expectations it carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(df: DataFrame, check: str, violation_expr: Column) -> DataFrame:
    """One expectation → a 1-row (check, n_violations) DataFrame via a
    conditional count (no filter-then-count double scan)."""
    return df.agg(
        F.lit(check).alias("check"),
        F.count(F.when(violation_expr, F.lit(1))).cast("long")
        .alias("n_violations"))


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    return _report(df, f"not_null:{col}", F.col(col).isNull())


def expect_accepted_values(df: DataFrame, col: str,
                           values: list) -> DataFrame:
    return _report(df, f"accepted_values:{col}",
                   ~F.col(col).isin(values) | F.col(col).isNull())


def expect_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    return _report(df, f"in_range:{col}",
                   (F.col(col) < lo) | (F.col(col) > hi))


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key uniqueness as a grouped count (the PK analog): number of
    key groups with more than one row."""
    dupes = (df.groupBy(*cols).count().filter(F.col("count") > 1)
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return dupes.select(
        F.lit("unique:" + ",".join(cols)).alias("check"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_violations"))


def expect_references(child: DataFrame, child_col: str,
                      parent: DataFrame, parent_col: str) -> DataFrame:
    """Referential integrity: child keys with no parent (anti join —
    only orphan COUNT leaves the executors)."""
    orphans = (child.select(F.col(child_col).alias("__k"))
               .join(parent.select(F.col(parent_col).alias("__k")),
                     "__k", "left_anti")
               .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return orphans.select(
        F.lit(f"references:{child_col}->{parent_col}").alias("check"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_violations"))


def union_reports(reports: list[DataFrame]) -> DataFrame:
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
