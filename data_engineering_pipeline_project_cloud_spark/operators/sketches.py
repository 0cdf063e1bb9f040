"""Count-min sketch: fixed-size frequency estimation over unbounded
key domains.

Completes the mergeable-sketch family next to the HLL rollup (distinct
counts, plans/relational.py:hll_rollup_users) and the fixed-bin
quantile sketch (plans/relational.py:quantile_sketch_rollup): CMS
answers "how often did key k occur" with O(depth × width) state no
matter how many distinct keys exist — the heavy-hitter / frequency
primitive every large-scale profiling pass wants when a per-key
groupBy would produce a billion-row result for a handful of
interesting keys.

Guarantees (standard CMS): estimates never undercount; with width w
and depth d the overcount is ≤ εN with probability 1-δ for ε=e/w,
δ=e^-d.  Counters are plain sums, so sketches MERGE by elementwise
addition — per-partition sketches partial-aggregate map-side and
roll up across corpora/days without touching rows again
(pytest-asserted).

100 TB shape: the build is one scan exploding each row to ``depth``
(d, bucket) pairs (tiny fixed-width rows) and one shuffle bounded by
d×w counter rows, not by |keys|; estimation joins the query keys
against the d×w counter table — broadcast-sized by construction.
Hashes are the cross-engine portable md5 fold (functions/scalar.py),
so a DuckDB oracle reproduces every counter and estimate exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable_hash64

DEPTH = 4
WIDTH = 256


def cms_build(df: DataFrame, key_col: str, depth: int = DEPTH,
              width: int = WIDTH) -> DataFrame:
    """Build the counter table ``(d, bucket, cnt)`` — the sketch's
    entire state, ``depth × width`` rows max."""
    hashes = [
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(portable_hash64(F.col(key_col), salt=f"cms{d}|"),
                   F.lit(width)).alias("bucket"))
        for d in range(depth)
    ]
    return (df.select(F.explode(F.array(*hashes)).alias("h"))
            .groupBy(F.col("h.d").alias("d"),
                     F.col("h.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-shaped sketches: elementwise counter addition
    (full outer on (d, bucket), missing counters are 0)."""
    return (a.unionByName(b)
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def cms_estimate(keys: DataFrame, sketch: DataFrame, key_col: str,
                 depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Point-estimate each distinct key in ``keys``: min over its
    ``depth`` counters (CMS guarantee: ≥ the true count).  The sketch
    is broadcast — it is ≤ depth×width rows by construction."""
    hashes = [
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(portable_hash64(F.col(key_col), salt=f"cms{d}|"),
                   F.lit(width)).alias("bucket"))
        for d in range(depth)
    ]
    probes = (keys.select(key_col).distinct()
              .select(key_col, F.explode(F.array(*hashes)).alias("h"))
              .select(key_col, F.col("h.d").alias("d"),
                      F.col("h.bucket").alias("bucket")))
    # left join + 0-fill: a bucket no key ever touched is an implicit
    # zero counter, so a NEVER-SEEN key estimates 0 (or a small
    # collision overcount) instead of silently dropping out
    return (probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est_count")))
