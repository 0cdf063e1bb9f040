"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented per SURVEY.md's custom-operator ladder, option (b): a
cogrouped ``applyInPandas`` merge.  Both sides are hash-bucketed on the
entity key into a bounded number of coarse buckets (ONE shuffle each);
each bucket is merged in a single Arrow batch with pandas
``merge_asof(by=key)`` — a sorted backward search per key.

Why buckets instead of cogrouping on the raw key: applyInPandas pays a
fixed Python/Arrow cost per GROUP; millions of small entity groups
would serialize millions of tiny batches.  Bucketing amortizes that to
~one batch per core while merge_asof's ``by=`` argument keeps per-key
semantics exact.  This is the same layout a 1000-executor cluster
wants: shuffle once by hash(key), sort within partition by time.

Skew note: a single hot key still lands in one bucket; for that case
pre-split the hot key by time range and stitch boundaries (not needed
at test scale).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
