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


# --- portable HyperLogLog ---------------------------------------------
#
# The Datasketches HLL face (plans/relational.py:hll_rollup_users) is
# rows-only by nature: its register layout is engine-specific.  This
# variant rebuilds HLL from first principles on the portable md5 fold,
# so EVERY register value — and therefore the estimate double — is
# reproducible in any ANSI engine: the sketch family's oracle gap,
# closed.  Exactness discipline: the harmonic denominator Σ2^(−M_j) is
# summed as the INTEGER Σ2^(55−M_j) (≤ 64·2^55 < 2^63), so no
# order-dependent float accumulation exists anywhere in the estimate.

HLL_BUCKETS = 64          # m = 2^6 registers
HLL_W_BITS = 54           # 60-bit hash − 6 bucket bits
#: alpha_m · m² · 2^55 precomputed in ONE Python double so both engines
#: divide the identical literal by the identical integer.
HLL_EST_NUM = (0.7213 / (1 + 1.079 / HLL_BUCKETS)) \
    * HLL_BUCKETS * HLL_BUCKETS * float(1 << (HLL_W_BITS + 1))


def hll_portable_registers(df: DataFrame, key_col: str,
                           group_cols: list[str]) -> DataFrame:
    """Per-group HLL registers ``(group…, bucket, m)``: bucket = low 6
    hash bits, m = max over keys of (leading-zero count of the
    remaining 54 bits) + 1.  Registers MERGE by elementwise max —
    the same partial-agg/rollup algebra as counters."""
    h = portable_hash64(F.col(key_col).cast("string"), salt="hll|")
    w = F.shiftright(h, 6)
    rho = (F.when(w > 0,
                  F.lit(HLL_W_BITS + 1) - F.length(F.conv(w, 10, 2)))
           .otherwise(F.lit(HLL_W_BITS + 1)))
    return (df.select(*group_cols, h.bitwiseAND(F.lit(63)).alias("bucket"),
                      rho.alias("rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").cast("int").alias("m")))


def hll_portable_estimate(regs: DataFrame,
                          group_cols: list[str]) -> DataFrame:
    """Registers → distinct-count estimate per group, with the
    standard small-range correction (E ≤ 2.5m and empty registers →
    linear counting m·ln(m/V)).  Missing buckets count as register 0
    — the group frame is completed against the full bucket range
    first, so a group seen in few buckets estimates correctly."""
    spark = regs.sparkSession
    groups = regs.select(*group_cols).distinct()
    buckets = spark.range(HLL_BUCKETS).select(
        F.col("id").cast("int").alias("bucket"))
    full = groups.crossJoin(F.broadcast(buckets))
    filled = (full.join(regs, [*group_cols, "bucket"], "left")
              .select(*group_cols, "bucket",
                      F.coalesce(F.col("m"), F.lit(0)).alias("m")))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                  f"CAST({HLL_W_BITS + 1} - m AS INT))")
    agg = (filled.groupBy(*group_cols)
           .agg(F.sum(term).cast("long").alias("s"),
                F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
                .cast("long").alias("v")))
    e_raw = F.lit(HLL_EST_NUM) / F.col("s").cast("double")
    est = F.when((e_raw <= 2.5 * HLL_BUCKETS) & (F.col("v") > 0),
                 F.lit(float(HLL_BUCKETS))
                 * F.log(F.lit(float(HLL_BUCKETS))
                         / F.col("v").cast("double"))).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est_count"))
