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
explode to 1-2 bins; intervals orders of magnitude longer than the
bin (a years-long validity row) should be capped or routed to a
broadcast side by the caller, the same long-outlier caveat every
binned overlap join (e.g. genomic binning schemes) carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EPOCH = "1970-01-01"


def _eday(c: Column) -> Column:
    return F.datediff(c.cast("date"), F.lit(EPOCH).cast("date"))


def interval_overlap_join(a: DataFrame, b: DataFrame,
                          a_id: str, a_start: str, a_end: str,
                          b_id: str, b_start: str, b_end: str,
                          bin_days: int = 7) -> DataFrame:
    """All (a_id, b_id) whose [start, end] day-granularity intervals
    intersect (closed ends: touching endpoints DO overlap), with the
    overlap length in days.  Self-pairs (equal ids) are excluded —
    callers joining a set to itself get proper pairs only.

    Returns ``(a_id, b_id, overlap_days)``, deterministic row set.
    """
    def bins(df: DataFrame, id_col: str, s: str, e: str,
             out_id: str) -> DataFrame:
        lo = F.floor(_eday(F.col(s)) / bin_days)
        hi = F.floor(_eday(F.col(e)) / bin_days)
        return df.select(
            F.col(id_col).cast("long").alias(out_id),
            _eday(F.col(s)).alias(f"{out_id}_s"),
            _eday(F.col(e)).alias(f"{out_id}_e"),
            F.explode(F.sequence(lo, hi)).alias("bin"))

    ab = bins(a, a_id, a_start, a_end, "a_id")
    bb = bins(b, b_id, b_start, b_end, "b_id")
    cand = ab.join(bb, "bin")
    overlap = (F.least(F.col("a_id_e"), F.col("b_id_e"))
               - F.greatest(F.col("a_id_s"), F.col("b_id_s")) + 1)
    return (cand
            .filter((F.col("a_id_s") <= F.col("b_id_e"))
                    & (F.col("b_id_s") <= F.col("a_id_e"))
                    & (F.col("a_id") != F.col("b_id")))
            .select("a_id", "b_id", overlap.cast("long")
                    .alias("overlap_days"))
            .distinct())
