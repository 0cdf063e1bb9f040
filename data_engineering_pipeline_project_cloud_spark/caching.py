"""Session-scoped cache registry.

Operators persist() intermediates that are consumed more than once
downstream (MinHash signatures before a banding self-join, shingle
sets before the two-sided Jaccard join).  The returned DataFrame is
lazy, so the operator itself can never unpersist — the cache must
outlive the call.  Without bookkeeping, every registry/bench run in a
long-lived session stacks more cached blocks onto the executors
(round-1 advisory): eviction pressure builds exactly where other code
is counting on its own caches staying resident.

``scoped_persist`` persists and records the frame; ``release_scoped``
unpersists everything recorded.  The query registry calls
``release_scoped`` before each query run, so at most one query's
intermediates are ever live — recompute-on-touch afterwards is safe
because every source here is deterministic (parquet + pure
expressions), so unpersist can only cost time, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() a DataFrame and register it for deferred release."""
    df = df.persist()
    _LIVE.append(df)
    return df


def scope_register(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for deferred release."""
    _LIVE.append(df)
    return df


def release_scoped() -> int:
    """Unpersist every registered frame; returns how many were live."""
    n = len(_LIVE)
    while _LIVE:
        _LIVE.pop().unpersist(False)
    return n
