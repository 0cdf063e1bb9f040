"""Interval overlap join: all pairs of time intervals that intersect.

Completes the temporal-join family next to the as-of join
(operators/asof.py: latest-at-or-before) and the non-equi range join
(plans/relational.py:range_join_value_tiers: point-in-band): overlap
semantics — ``a.start <= b.end AND b.start <= a.end`` — are the
sessions-vs-campaigns / outage-vs-deploy / validity-window question
none of the other two answer.

A naive implementation is a theta join (broadcast nested loop — one
side must fit in memory, quadratic work).  The scale pattern is
BINNING: each interval explodes to the fixed-width time bins it
covers, candidates pair via an EQUI join on the bin (shuffle on bin
keys — Catalyst-planned, AQE-skew-splittable), then the exact overlap
predicate verifies candidates and ``distinct`` collapses multi-bin
matches.  Fan-out per interval is ``len/bin_width + 1`` rows — pick
``bin_days`` near the typical interval length so most intervals
explode to 1-2 bins.

Long-outlier routing (``max_bins``): at validity-table scale the
years-long interval is the norm, not the exception — one unbounded
row per entity — and binning it explodes to ``len/bin_days`` rows.
With ``max_bins`` set, intervals covering more bins are ROUTED OUT of
the binned path entirely: they join by the exact predicate as a
broadcast side against the other input (long intervals are rare and
wide, so the long set is small — dimension-sized — while each long
interval would match huge bin ranges anyway, exactly when binning
stops paying).  Short×short stays the shuffled equi join;
long_a×(all b) and short_a×long_b are broadcast theta joins; the
union is exact-verified and ``distinct``-collapsed like the pure
binned path, so routing never changes the result set (property-tested
against brute force in tests/test_operators.py).  The same
short/long split is how published interval-join schemes (e.g. genomic
binning; Flink's interval join with bounded ranges) handle the
unbounded tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EPOCH = "1970-01-01"


def _eday(c: Column) -> Column:
    return F.datediff(c.cast("date"), F.lit(EPOCH).cast("date"))


def interval_overlap_join(a: DataFrame, b: DataFrame,
                          a_id: str, a_start: str, a_end: str,
                          b_id: str, b_start: str, b_end: str,
                          bin_days: int = 7,
                          max_bins: int | None = None,
                          max_broadcast_rows: int = 1_000_000) -> DataFrame:
    """All (a_id, b_id) whose [start, end] day-granularity intervals
    intersect (closed ends: touching endpoints DO overlap), with the
    overlap length in days.  Self-pairs (equal ids) are excluded —
    callers joining a set to itself get proper pairs only.

    ``max_bins``: intervals spanning more than this many bins bypass
    binning and join as a broadcast side by the exact predicate (see
    module docstring); ``None`` bins everything (only safe when the
    caller knows no interval is orders of magnitude longer than
    ``bin_days``).

    ``max_broadcast_rows`` makes the routing SELF-DEFENDING: the
    broadcast-residual path assumes long intervals are rare
    (dimension-sized); one cheap metadata aggregate counts them, and
    when the count exceeds this bound — an adversarial input where
    long is the norm — the operator falls back to binning EVERYTHING
    at a coarser width (chosen so the longest interval explodes to at
    most ``max_bins`` bins) instead of broadcasting a big side.
    Coarser bins trade candidate precision for bounded fan-out; the
    result set is unchanged either way (exact verify + distinct).

    Returns ``(a_id, b_id, overlap_days)``, deterministic row set.
    """
    def prep(df: DataFrame, id_col: str, s: str, e: str,
             out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).cast("long").alias(out_id),
            _eday(F.col(s)).alias(f"{out_id}_s"),
            _eday(F.col(e)).alias(f"{out_id}_e"))

    def bins(df: DataFrame, out_id: str, width: int) -> DataFrame:
        lo = F.floor(F.col(f"{out_id}_s") / width)
        hi = F.floor(F.col(f"{out_id}_e") / width)
        return df.select(
            out_id, f"{out_id}_s", f"{out_id}_e",
            F.explode(F.sequence(lo, hi)).alias("bin"))

    def n_bins(out_id: str) -> Column:
        return (F.floor(F.col(f"{out_id}_e") / bin_days)
                - F.floor(F.col(f"{out_id}_s") / bin_days) + 1)

    ap = prep(a, a_id, a_start, a_end, "a_id")
    bp = prep(b, b_id, b_start, b_end, "b_id")
    if max_bins is not None:
        # the routing path reads each prepped side THREE times (the
        # metadata aggregate, the short filter, the long filter), and
        # real inputs often embed upstream work (the validity face's b
        # side is itself an aggregate) — persist the 3-long endpoint
        # projection (24 B/row, the minimal interval metadata) so each
        # side is computed once (r11: measured 3.48 s → 2.67 s on the
        # validity face, identical result set; session-scoped,
        # released by the registry before the next query).
        # Sizing at extreme scale (r12): 24 B/row over BOTH inputs is
        # ~24 GB per billion intervals — far under the text corpus it
        # derives from, but beyond the memory storage fraction on
        # small clusters, so the level is pinned to MEMORY_AND_DISK
        # explicitly: overflow spills to local disk rather than
        # evicting hot blocks, and recompute stays cheaper only for
        # trivial upstreams (this cache exists precisely because the
        # upstream is often an aggregate).
        from pyspark.storagelevel import StorageLevel

        from ..caching import scoped_persist
        ap = scoped_persist(ap, StorageLevel.MEMORY_AND_DISK)
        bp = scoped_persist(bp, StorageLevel.MEMORY_AND_DISK)
    exact = (F.col("a_id_s") <= F.col("b_id_e")) \
        & (F.col("b_id_s") <= F.col("a_id_e"))
    if max_bins is None:
        cand = bins(ap, "a_id", bin_days).join(
            bins(bp, "b_id", bin_days), "bin")
    else:
        def side_stats(df: DataFrame, out_id: str) -> DataFrame:
            return df.select(
                (n_bins(out_id) > max_bins).cast("long").alias("l"),
                (F.col(f"{out_id}_e") - F.col(f"{out_id}_s"))
                .alias("len"))

        # ONE metadata job for the routing decision (long count + max
        # interval length over both inputs)
        row = (side_stats(ap, "a_id").unionAll(side_stats(bp, "b_id"))
               .agg(F.sum("l").alias("n_long"),
                    F.max("len").alias("max_len")).collect()[0])
        n_long, max_len = row["n_long"] or 0, row["max_len"] or 0
        if n_long > max_broadcast_rows:
            # the rare-and-wide assumption failed: re-bin everything
            # at a width that fits the longest interval in max_bins
            coarse = max(bin_days, -(-(max_len + 1) // max_bins))
            cand = bins(ap, "a_id", coarse).join(
                bins(bp, "b_id", coarse), "bin").drop("bin")
        else:
            a_short = ap.filter(n_bins("a_id") <= max_bins)
            a_long = ap.filter(n_bins("a_id") > max_bins)
            b_short = bp.filter(n_bins("b_id") <= max_bins)
            b_long = bp.filter(n_bins("b_id") > max_bins)
            binned = (bins(a_short, "a_id", bin_days)
                      .join(bins(b_short, "b_id", bin_days), "bin")
                      .drop("bin"))
            # long outliers: rare + wide → broadcast theta join with
            # the exact predicate; long_a pairs against ALL of b
            # (covers long×long), short_a against long_b covers the
            # rest
            residual = (F.broadcast(a_long).join(bp, exact)
                        .unionByName(
                            a_short.join(F.broadcast(b_long), exact)))
            cand = binned.unionByName(residual)
    overlap = (F.least(F.col("a_id_e"), F.col("b_id_e"))
               - F.greatest(F.col("a_id_s"), F.col("b_id_s")) + 1)
    return (cand
            .filter(exact & (F.col("a_id") != F.col("b_id")))
            .select("a_id", "b_id", overlap.cast("long")
                    .alias("overlap_days"))
            .distinct())
