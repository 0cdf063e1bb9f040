"""Generic relational operators the reference composes implicitly.

Covers SURVEY.md §2 rows A4 (argmax / top-1-per-group), A5+U1
(union-conform-dedup), and S4 (deterministic surrogate keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(df: DataFrame, group_keys: Sequence[str],
                   order_by: Sequence[Column]) -> DataFrame:
    """Top-1-per-group (argmax), A4.

    The reference implements this as a correlated scalar subquery with
    ``ORDER BY SUM(...) DESC LIMIT 1`` per order
    (``scripts/transform-complex-full.py:72-79``).  A correlated
    subquery re-executed per group is the row-store idiom; the
    Spark-first form is a single window pass — one shuffle on the group
    key, no re-scan.

    ``order_by`` MUST include a deterministic tie-break (the reference
    leaves ties nondeterministic — SURVEY.md §2.4 A4); callers append a
    unique secondary key.
    """
    w = Window.partitionBy(*group_keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def union_conform_dedup(dfs: Sequence[DataFrame], dropna: bool = True) -> DataFrame:
    """Union-all of conformed sources then global dedup (U1+A5+P3).

    Mirrors ``pd.concat([...]) → drop_duplicates() → dropna()``
    (``scripts/create_dimensions.py:49-51``).  ``unionByName`` because
    the reference aligns frames by column name after renames.
    ``distinct`` is a hash aggregate on all columns — partial (map-side)
    aggregation makes the shuffle carry only unique rows per partition,
    so this scales to arbitrarily wide inputs.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    out = out.distinct()
    if dropna:
        out = out.na.drop("any")
    return out


def add_surrogate_key(df: DataFrame, key_name: str,
                      canonical_order: Sequence[str]) -> DataFrame:
    """Deterministic surrogate key (S4).

    The reference uses the pandas row index as the key
    (``scripts/create_dimensions.py:67``) — i.e. load order, which is
    not reproducible.  Here the key is ``row_number() - 1`` over an
    explicit canonical sort, so rebuilds are bit-identical (SURVEY.md
    §5.3 determinism hardening).

    Scale note: a global row_number over an unpartitioned window is a
    single-reducer sort — fine for dimension tables (the only place
    surrogate keys are used); for billion-row keys use
    ``zipWithIndex``-style per-partition offsets instead.
    """
    w = Window.orderBy(*[F.col(c) for c in canonical_order])
    return df.withColumn(key_name, (F.row_number().over(w) - 1).cast("long"))
