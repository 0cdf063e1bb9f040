"""As-of (point-in-time) join — an operator Spark lacks natively.

Two implementations per SURVEY.md's custom-operator ladder:

- ``asof_join_native`` (option a — composition of built-in ops, the
  DEFAULT): union both sides tagged, one sort-window pass per entity
  key taking the last non-null right value at or before each left
  time.  Entirely JVM (one shuffle + window), no Python workers.
- ``asof_join`` (option b — cogrouped ``applyInPandas`` merge): kept
  as the reference implementation of the Pandas-UDF ladder rung and
  cross-checked against the native one in pytest.  Both sides are
  hash-bucketed on the entity key into a bounded number of coarse
  buckets (ONE shuffle each); each bucket merges in a single Arrow
  batch with pandas ``merge_asof(by=key)``.  Bucketing amortizes the
  fixed Python/Arrow per-GROUP cost to ~one batch per core.

Skew note: a single hot key lands in one partition/bucket either way;
for that case pre-split the hot key by time range and stitch
boundaries (not needed at test scale).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_native(left: DataFrame, right: DataFrame, on_left: str,
                     on_right: str, by_left: str, by_right: str,
                     value_cols: list[str],
                     tolerance_seconds: float | None = None) -> DataFrame:
    """Backward as-of join (exact matches allowed, left-outer) as pure
    DataFrame ops: tag and union both sides, then per entity key one
    ordered window takes the most recent right-side values at or
    before each left row.  Right rows sort BEFORE left rows at equal
    timestamps (allow-exact-match semantics).

    ``right`` must be unique per (by_right, on_right) — same contract
    as ``asof_join``.  One shuffle on the entity key + in-partition
    sort; at 100 TB this is strictly cheaper than the cogrouped pandas
    path (no Arrow transfer, stays in codegen).

    ``tolerance_seconds``: like ``merge_asof(tolerance=...)`` — a
    match older than the tolerance is nulled out (stale
    point-in-time data treated as no data).
    """
    from pyspark.sql import Window

    left_cols = left.columns
    lhs = left.select(
        F.col(by_left).alias("__by"), F.col(on_left).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols])
    rhs = right.select(
        F.col(by_right).alias("__by"), F.col(on_right).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols])
    unioned = lhs.unionByName(rhs)
    w = (Window.partitionBy("__by")
         .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "__is_right", "__t", *left_cols,
        F.last(F.when(F.col("__is_right") == 1, F.col("__t")),
               ignorenulls=True).over(w).alias("__match_t"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
          for c in value_cols])
    out = filled.filter(F.col("__is_right") == 0)
    if tolerance_seconds is not None:
        from ..functions import epoch_seconds

        stale = (epoch_seconds("__t")
                 - epoch_seconds("__match_t")) > tolerance_seconds
        out = out.select(
            "__is_right", "__t", *left_cols, "__match_t",
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in value_cols])
    return out.drop("__is_right", "__t", "__match_t")


def asof_join(left: DataFrame, right: DataFrame, on_left: str, on_right: str,
              by_left: str, by_right: str, value_cols: list[str],
              num_buckets: int | None = None) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on_right`` <= ``on_left`` within the same ``by`` key (backward
    as-of, exact matches allowed).  Left rows with no match keep NULLs
    (left-outer).

    ``right`` must be unique per (by_right, on_right); callers dedup
    first so the match is deterministic.
    """
    if num_buckets is None:
        num_buckets = left.sparkSession.sparkContext.defaultParallelism
    left_cols = left.columns
    out_fields = [f"`{c}` {left.schema[c].dataType.simpleString()}"
                  for c in left_cols]
    out_fields += [f"`{c}` {right.schema[c].dataType.simpleString()}"
                   for c in value_cols]
    out_schema = ", ".join(out_fields)

    right_cols = list(dict.fromkeys([by_right, on_right, *value_cols]))
    merge_cols = list(dict.fromkeys([by_right, on_right, *value_cols]))

    lb = left.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(by_left)), F.lit(num_buckets)))
    rb = right.select(*right_cols).withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(by_right)), F.lit(num_buckets)))

    def merge(_key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.drop(columns="__bucket").sort_values([on_left, by_left])
        if rdf.empty:
            for c in value_cols:
                ldf[c] = None
            return ldf[left_cols + value_cols]
        rdf = rdf.drop(columns="__bucket").sort_values([on_right, by_right])
        if by_left != by_right:
            rdf = rdf.rename(columns={by_right: by_left})
        merged = pd.merge_asof(
            ldf, rdf,
            left_on=on_left, right_on=on_right,
            by=by_left, direction="backward", allow_exact_matches=True)
        return merged[left_cols + value_cols]

    return (
        lb.groupBy("__bucket")
        .cogroup(rb.groupBy("__bucket"))
        .applyInPandas(merge, out_schema)
    )
