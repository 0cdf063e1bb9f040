"""Skew mitigation and shuffle co-location (SURVEY.md §4 scale list).

Two standard levers for the shuffles AQE can't fully save:

- **Salted join** for a skewed build side: the hot keys of the big
  side are split across ``salt_buckets`` sub-keys, and the small side
  is replicated once per bucket.  Turns one straggler task into
  ``salt_buckets`` parallel tasks.  AQE's skew-join split handles most
  cases at runtime; explicit salting remains the tool when a single
  key exceeds what one task can hold (AQE splits partitions, not
  keys... it does split keys for sort-merge, but not for hash
  aggregates or when the skewed side must build).
- **Bucketed tables** for repeated big-big equi-joins: pre-shuffled
  at write time (``bucketBy``); subsequent joins on the bucket key
  read co-located buckets with NO exchange on either side — at 100 TB
  the difference between a network-bound and an IO-bound join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated ``salt_buckets``×.

    Semantically identical to ``big.join(small, key, how)`` (asserted
    in tests); physically the join key becomes (key, salt) so one hot
    key spreads over ``salt_buckets`` reducers.  Use when ONE key's
    rows exceed a single task's capacity; otherwise prefer plain join
    + AQE.  Replication multiplies the small side — keep it
    broadcast-sized or keep salt_buckets low.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # right/full would duplicate unmatched replicated small-side
        # rows once per salt — not expressible with this technique
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt_buckets)).cast("int"))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   num_buckets: int, path: str) -> None:
    """Persist a table pre-shuffled on ``key`` (``bucketBy`` +
    ``sortBy``): every future equi-join/aggregation on ``key`` between
    same-bucketed tables runs with zero exchange."""
    (df.write.mode("overwrite")
     .option("path", path)
     .bucketBy(num_buckets, key)
     .sortBy(key)
     .saveAsTable(table_name))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two pre-bucketed tables on their bucket key — planned as a
    sort-merge join over co-located buckets, no Exchange on either
    side (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    bucketized dimensions.  Sorting/range-partitioning the table by
    this key clusters rows that are close in BOTH dimensions into the
    same files, so parquet min/max row-group stats prune scans for
    predicates on EITHER column — the multi-dimensional data-skipping
    layout (Delta/Iceberg OPTIMIZE ZORDER) built from plain column
    arithmetic.  Callers bucketize raw values into [0, 2^bits) first;
    the expression is a fixed chain of shift/or ops in codegen, and
    2 × 16 bits keeps the key in a BIGINT in any engine."""
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)) \
             .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
    return z
