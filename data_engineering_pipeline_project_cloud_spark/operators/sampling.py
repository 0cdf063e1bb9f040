"""Deterministic corpus sampling for training-data mixing.

Training mixes are specified as per-stratum fractions (language,
source, domain).  ``sample`` decisions here are pure functions of the
document id — a hash threshold, not ``rand()`` — so a re-run, a retry
after executor loss, or an incremental rebuild selects the SAME
documents.  Nondeterministic sampling breaks exactly-once semantics at
scale (a retried task would sample a different subset) and is
impossible to oracle-check; hash-threshold sampling is both stable and
reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash64

SAMPLE_SCALE = 1_000_000  # hash-threshold resolution (ppm)


def sample_decision(id_col: str, threshold_col: str,
                    salt: str = "sample|") -> F.Column:
    """True iff hash(id) mod SAMPLE_SCALE < threshold (ppm)."""
    h = F.pmod(portable_hash64(F.col(id_col).cast("string"), salt=salt),
               F.lit(SAMPLE_SCALE))
    return h < F.col(threshold_col)


def stratified_sample(docs: DataFrame, strata_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Balance the corpus across strata: downsample every stratum to
    (approximately) the size of the smallest one.  Per-stratum keep
    rates are computed FROM the data (min count / stratum count, in
    exact integer ppm), then applied as a deterministic hash threshold
    per document.  Returns the sampled rows as (id, stratum).

    Scale shape: stratum counts are one partial-aggregated groupBy
    (|strata| rows), the rate table broadcasts back onto the corpus,
    and the filter is map-side — one scan, one tiny shuffle, no
    corpus-grain repartition.
    """
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    rates = (counts.crossJoin(F.broadcast(min_n))
             .select(strata_col,
                     F.floor(F.lit(SAMPLE_SCALE) * F.col("min_n")
                             / F.col("n")).cast("long").alias("keep_ppm")))
    return (docs.join(F.broadcast(rates), strata_col)
            .filter(sample_decision(id_col, "keep_ppm"))
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col(strata_col)))
