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

Frames materialized with ``localCheckpoint`` (jaccard_pairs'
candidate table, connected_components' per-round labels) are OUTSIDE
this registry by design: a checkpointed frame has no lineage, so an
eager unpersist would make a still-referenced frame unrecomputable.
Their blocks are dropped by the ContextCleaner as the Python/JVM
references die — a GC-paced (not query-paced) lifecycle that is safe
here because every such table is id-pair-grain (bounded small), never
corpus-payload-grain.

Default storage level: ``persist()`` = MEMORY_AND_DESERIALIZED with
disk overflow (MEMORY_AND_DISK) — intermediates larger than the
executors' storage fraction spill to local disk instead of evicting
hot blocks or OOMing, which is the right degradation for the
corpus-derived caches here (winnowed fingerprints, interval
endpoints): at 100 TB inputs those projections are multi-TB, and
recompute-vs-cache stays a per-operator decision documented at each
call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame,
                   level: StorageLevel | None = None) -> DataFrame:
    """persist() a DataFrame and register it for deferred release.
    ``level`` defaults to Spark's DataFrame default (MEMORY_AND_DISK,
    deserialized); call sites caching corpus-derived projections pass
    it explicitly with a sizing note."""
    df = df.persist(level) if level is not None else df.persist()
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
