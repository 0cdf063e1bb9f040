"""Distributed frequent-items (heavy hitters): Misra–Gries candidate
summaries + an exact candidate-bounded verification pass.

The reference has no frequency operator at all (its only aggregation
surface is the SUM/AVG/argmax family, transform-complex-full.py:67-91);
this module adds the classic two-pass exact heavy-hitters pipeline a
100 TB corpus needs when "group by key, count" is the thing you are
trying to AVOID — a full shuffle of every row keyed by a
billion-cardinality column, to answer a question whose output is a
handful of keys.

Pass 1 — ``misra_gries_candidates``: each partition maintains at most
``capacity`` (key, weight) counters with the Misra–Gries update,
folding Arrow batches in via the MERGE rule proven in the mergeable-
summaries literature (Agarwal, Cormode, Huang, Phillips, Wei, Yi —
"Mergeable Summaries", PODS 2012): add the batch's exact counts, and
when more than ``capacity`` counters are live, subtract the
(capacity+1)-th largest weight from ALL counters and drop the
non-positive.  That rule preserves the MG guarantee under arbitrary
merging, so the per-partition summary underestimates every key by at
most n_p/(capacity+1) — and therefore ANY key with global count
> N/(capacity+1) survives with positive weight in at least one
partition's summary.  Output is O(partitions × capacity) rows — driver
metadata, never a table-wide shuffle.

Pass 2 — ``heavy_hitters_exact``: broadcast-semi-join the (tiny)
candidate set back onto the data and count exactly — only candidate
rows shuffle, so the result carries EXACT counts (no sketch error in
the answer) while the expensive full-cardinality groupBy never runs.
The completeness condition is ``min_fraction > 1/(capacity+1)``
(checked): below that, MG cannot promise the candidate set is a
superset of the answer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str,
                           capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries (≤ ``capacity`` counters
    each) over ``df[key_col]``; returns ``(key_col, est)`` rows whose
    union provably contains every key with global count
    > N/(capacity+1).  ``est`` underestimates the true count (MG only
    ever decrements).  Arrow-batched: each pandas batch contributes
    its exact value_counts, merged with the subtract-(k+1)-th-largest
    rule; per-batch work is O(distinct keys in batch)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    ktype = df.schema[key_col].dataType.simpleString()

    def summarize(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for k, v in pdf[key_col].value_counts().items():
                counts[k] = counts.get(k, 0) + int(v)
            if len(counts) > capacity:
                delta = sorted(counts.values(), reverse=True)[capacity]
                counts = {k: c - delta for k, c in counts.items()
                          if c > delta}
        yield pd.DataFrame({key_col: list(counts.keys()),
                            "est": list(counts.values())})

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {ktype}, est long")


def heavy_hitters_exact(df: DataFrame, key_col: str, min_fraction: float,
                        capacity: int = 256) -> DataFrame:
    """Exact heavy hitters: every key whose count ≥
    ``ceil(min_fraction · N)``, with its EXACT count — computed
    without a full-cardinality groupBy.  Misra–Gries candidates
    (complete by the MG bound whenever ``min_fraction >
    1/(capacity+1)``) are broadcast back for an exact count of
    candidate rows only.  Returns ``(key_col, n)``."""
    if min_fraction <= 1.0 / (capacity + 1):
        raise ValueError(
            f"min_fraction {min_fraction} must exceed 1/(capacity+1)="
            f"{1.0 / (capacity + 1):.6f} for the candidate set to be "
            "provably complete")
    total = df.count()
    threshold = math.ceil(min_fraction * total)
    cand = (misra_gries_candidates(df, key_col, capacity)
            .select(key_col).distinct())
    return (df.join(F.broadcast(cand), key_col, "left_semi")
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .filter(F.col("n") >= threshold))
