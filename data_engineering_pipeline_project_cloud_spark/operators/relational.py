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


def cdc_apply(changelog: DataFrame, key_cols: Sequence[str],
              seq_cols: Sequence[str], op_col: str = "op",
              delete_op: str = "D") -> DataFrame:
    """Compact a CDC changelog (insert/update/delete records) to final
    table state: for every key the highest-sequence record wins, and a
    key whose winning record is a delete disappears.  This is the batch
    MERGE/upsert semantics every lakehouse ingest needs — the analog of
    the reference's full-overwrite loads when the source ships deltas
    instead of snapshots.

    ``seq_cols`` must totally order each key's records (callers append
    a unique tiebreaker) or "latest" is nondeterministic.

    Scale shape: one shuffle on the key, a per-key window that keeps
    row 1, and a map-side filter.  No join back to a base table is
    required for pure-changelog compaction; applying deltas ONTO an
    existing base is the same function over base-as-inserts UNION
    changelog.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols])
    return (changelog.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .filter(F.col(op_col) != delete_op)
            .drop("__rn", op_col))


def scd2_compact(obs: DataFrame, key_cols: Sequence[str], attr_col: str,
                 seq_cols: Sequence[str],
                 high_date: str = "9999-12-31 00:00:00") -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse a
    stream of per-key attribute observations into validity intervals —
    one row per consecutive run of an unchanged attribute value, with
    ``valid_from`` / ``valid_to`` / ``version`` / ``is_current``.  The
    open interval carries the standard high-date sentinel instead of
    NULL (canonical null-free output rule).

    Classic gaps-and-islands: a lag-compare marks change points, a
    running sum numbers the runs (both in ONE window pass over the same
    (key × seq) sort — Spark evaluates them in a single shuffle), then
    a hash agg collapses runs and a second tiny window (one row per
    run, not per observation) chains ``valid_to = next valid_from``.
    ``seq_cols[0]`` must be the event-time column; extra columns break
    ties deterministically.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(c).asc() for c in seq_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(attr_col)).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0)
    versioned = obs.withColumn(
        "version",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = (versioned.groupBy(*key_cols, "version", attr_col)
            .agg(F.min(seq_cols[0]).alias("valid_from")))
    wv = Window.partitionBy(*keys).orderBy(F.col("version").asc())
    valid_to = F.coalesce(
        F.lead("valid_from").over(wv),
        F.lit(high_date).cast("timestamp"))
    return (runs.select(
        *key_cols,
        F.col(attr_col),
        F.col("valid_from"),
        valid_to.alias("valid_to"),
        F.col("version").cast("long").alias("version"))
        .withColumn("is_current",
                    F.col("valid_to") == F.lit(high_date).cast("timestamp")))
