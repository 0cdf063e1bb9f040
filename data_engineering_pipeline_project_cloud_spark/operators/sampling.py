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


def fixed_k_per_stratum(docs: DataFrame, k: int, strata_col: str = "lang",
                        id_col: str = "doc_id",
                        salt: str = "ksample|") -> DataFrame:
    """Exactly-k-per-stratum deterministic sample — the eval-holdout
    builder: order each stratum by id hash (a stable shuffle) and keep
    the first ``k``.  Unlike rate-based sampling the output size is
    exact, and unlike ``ORDER BY rand()`` it never moves documents
    between runs, re-shards, or engines.

    One shuffle on the stratum key; the per-stratum window ranks by
    (hash, id) so ties are impossible.  At scale prefer rate-based
    ``stratified_sample`` when strata are huge (a single-stratum window
    sorts that stratum on one reducer); k-exact holdouts are for eval
    sets, where k is small by construction.
    """
    from pyspark.sql import Window

    h = F.pmod(portable_hash64(F.col(id_col).cast("string"), salt=salt),
               F.lit(SAMPLE_SCALE))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (docs.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k)
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col(strata_col),
                    F.col("sample_rank").cast("long").alias("sample_rank")))
