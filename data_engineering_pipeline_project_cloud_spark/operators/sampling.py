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

from ..caching import scoped_persist
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


def temperature_sample(docs: DataFrame, alpha: float = 0.5,
                       strata_col: str = "lang",
                       id_col: str = "doc_id",
                       salt: str = "temp|") -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-pretraining
    sampler: p(stratum) ∝ n^alpha): per-stratum keep rate
    ``(n_min / n_s) ** (1 - alpha)``, so ``alpha=1`` keeps the natural
    distribution, ``alpha=0`` balances every stratum down to the
    smallest (= ``stratified_sample``), and values between damp the
    head's dominance without discarding it wholesale.

    Rates are materialized as integer ppm thresholds — double-rounded
    through 1e9 first, so a last-ulp ``pow`` difference between engines
    cannot flip the floor — then applied as the usual deterministic
    id-hash decision.  Same scale shape as ``stratified_sample``: one
    tiny groupBy + a broadcast of |strata| rows + a map-side filter.
    """
    if not 0.0 <= alpha <= 1.0:
        # alpha > 1 flips the exponent sign, producing keep rates > 1
        # that would silently clamp to keep-everything; alpha < 0
        # over-suppresses the head the same silent way.  This sampler
        # only downsamples — reject anything outside the documented
        # interpolation range.
        raise ValueError(
            f"temperature_sample alpha must be in [0, 1], got {alpha}")
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    rate = F.pow(F.col("min_n") / F.col("n"), F.lit(1.0 - alpha))
    keep_ppm = F.floor(F.round(rate * F.lit(1e9), 0) / F.lit(1000)) \
        .cast("long")
    rates = (counts.crossJoin(F.broadcast(min_n))
             .select(strata_col, keep_ppm.alias("keep_ppm")))
    return (docs.join(F.broadcast(rates), strata_col)
            .filter(sample_decision(id_col, "keep_ppm", salt=salt))
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col(strata_col), F.col("keep_ppm")))


def token_budget_select(docs: DataFrame, budget_tokens: int,
                        text_col: str = "text", id_col: str = "doc_id",
                        bucket_scale: int = 1000,
                        salt: str = "budget|") -> DataFrame:
    """Greedy quality-first corpus selection under a global token
    budget: documents are bucketed by quality (``floor(q * 1000)``),
    whole buckets are taken from the top until the next bucket no
    longer fits, and the boundary bucket is filled document-by-document
    in deterministic id-hash order until the budget is exhausted.

    This is the scale-correct form of "sort the corpus by quality and
    take a prefix": a global sort would be one total-order shuffle of
    the whole corpus, while here the only per-document work is a
    map-side bucket assignment + one partial-aggregated groupBy over
    ≤ ``bucket_scale``+1 buckets; the single-partition window runs on
    the bucket histogram (bounded rows), and the document-level
    running-sum window touches ONLY the boundary bucket (~1/1000 of
    the quality span; a pathological corpus with all mass in one
    bucket degrades to the sort it replaces).

    Output: kept documents as (doc_id, quality_bucket, n_tokens,
    is_boundary), where ``sum(n_tokens) <= budget_tokens`` and every
    kept full-bucket doc outranks every dropped doc on quality bucket.
    """
    from pyspark.sql import Window

    from .textstats import quality_expr

    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    # consumed three times below (histogram, full-bucket branch,
    # boundary branch): persist the narrow projection so the
    # regex-heavy quality signals run in ONE corpus scan
    scored = scoped_persist(docs.select(
        F.col(id_col).cast("long").alias(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.least(F.lit(bucket_scale),
                F.floor(quality_expr(text_col) * bucket_scale))
        .cast("long").alias("quality_bucket")))

    hist = scored.groupBy("quality_bucket").agg(
        F.sum("n_tokens").alias("btok"))
    wd = (Window.orderBy(F.col("quality_bucket").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    marked = hist.select(
        "quality_bucket", "btok",
        F.coalesce(F.sum("btok").over(wd), F.lit(0)).alias("cum_before"))
    # highest bucket that does NOT fully fit; sentinel (-1, 0 budget
    # left) when the whole corpus fits.  One tiny row, broadcast.
    ctl = F.broadcast(
        marked.filter(F.col("cum_before") + F.col("btok") > budget_tokens)
        .agg(F.max_by(F.struct("quality_bucket", "cum_before"),
                      "quality_bucket").alias("b"))
        .select(F.coalesce(F.col("b.quality_bucket"), F.lit(-1))
                .alias("b_bucket"),
                F.coalesce(F.lit(budget_tokens) - F.col("b.cum_before"),
                           F.lit(0)).alias("b_remaining")))

    with_ctl = scored.crossJoin(ctl)
    kept_full = (with_ctl.filter(F.col("quality_bucket") > F.col("b_bucket"))
                 .select(id_col, "quality_bucket", "n_tokens",
                         F.lit(False).alias("is_boundary")))
    h = F.pmod(portable_hash64(F.col(id_col).cast("string"), salt=salt),
               F.lit(SAMPLE_SCALE))
    wb = (Window.partitionBy("quality_bucket")
          .orderBy(h.asc(), F.col(id_col).asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    kept_boundary = (
        with_ctl.filter(F.col("quality_bucket") == F.col("b_bucket"))
        .withColumn("run", F.sum("n_tokens").over(wb))
        .filter(F.col("run") <= F.col("b_remaining"))
        .select(id_col, "quality_bucket", "n_tokens",
                F.lit(True).alias("is_boundary")))
    return kept_full.unionByName(kept_boundary)


def quantile_quality_filter(docs: DataFrame, q: float = 0.5,
                            strata_col: str = "lang",
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-stratum quantile quality cut: keep documents at or above
    their stratum's q-th quality percentile — the relative filter that
    survives domain shift (an absolute quality bar tuned on English
    web text throws away most of a code or low-resource-language
    corpus; a per-stratum quantile keeps the best half of EACH).

    One narrow corpus-grain projection (id, stratum, quality — no
    text) persisted so quality is computed in a single scan, a
    |strata|-row exact-percentile aggregate (at 100 TB:
    ``approx_percentile``, same call shape), broadcast back, map-side
    filter.  Thresholds are rounded to 4 places so the linear
    interpolation inside percentile stays cross-engine stable.
    """
    from .textstats import quality_expr

    scored = scoped_persist(docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(strata_col),
        quality_expr(text_col).alias("quality")))
    thr = scored.groupBy(strata_col).agg(
        F.round(F.percentile("quality", F.lit(q)), 4).alias("q_threshold"))
    return (scored.join(F.broadcast(thr), strata_col)
            .filter(F.col("quality") >= F.col("q_threshold"))
            .select(id_col, strata_col, "quality", "q_threshold"))


def mixture_resample(docs: DataFrame, weights: dict[str, float],
                     default_weight: float = 1.0,
                     source_col: str = "source",
                     id_col: str = "doc_id",
                     salt: str = "mix|",
                     strict: bool = False) -> DataFrame:
    """Resample the corpus toward a TARGET mixture: given per-source
    weights (relative, not necessarily normalized), downsample each
    source so the kept corpus's source shares are proportional to the
    weights — the data-mixing step that turns `source_mix`'s report
    into an actual rebalanced corpus.

    Down-sampling only (no duplication): with ``c = min_s(n_s / w_s)``
    the keep rate for source ``s`` is ``c * w_s / n_s`` — at least one
    source keeps everything and expected kept counts are exactly
    proportional to the weights.  Rates materialize as integer ppm
    (double-rounded through 1e9, same guard as ``temperature_sample``)
    and apply as the deterministic id-hash threshold, so the selection
    is reproducible across runs, retries, and engines.

    Sources absent from ``weights`` get ``default_weight`` (so a
    literal weight table for the head sources composes with a uniform
    tail).  Scale shape: the weight lookup is a literal CASE chain
    (map-side, no join); source counts are one partial-aggregated
    groupBy at |sources| grain, broadcast back; the filter is
    map-side.  One corpus scan, no corpus-grain shuffle.
    """
    bad = {s: w for s, w in weights.items() if w <= 0}
    if bad or default_weight <= 0:
        raise ValueError(
            f"mixture weights must be > 0, got {bad or default_weight}")
    w_expr = F.lit(float(default_weight))
    for s, wt in sorted(weights.items(), reverse=True):
        w_expr = F.when(F.col(source_col) == s,
                        F.lit(float(wt))).otherwise(w_expr)
    counts = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n"), F.first(w_expr).alias("w"))
    if strict:
        # a typo'd weight key never matches any row and silently
        # degrades to default_weight everywhere; strict mode spends
        # one action on the |sources|-grain aggregate to surface it
        counts = scoped_persist(counts)
        present = {r[0] for r in counts.select(source_col).collect()}
        unknown = set(weights) - present
        if unknown:
            raise ValueError(
                f"mixture weights reference absent sources: "
                f"{sorted(unknown)}")
    c = counts.agg(F.min(F.col("n") / F.col("w")).alias("c"))
    keep_ppm = F.floor(
        F.round(F.least(F.col("c") * F.col("w") / F.col("n"), F.lit(1.0))
                * F.lit(1e9), 0) / F.lit(1000)).cast("long")
    rates = (counts.crossJoin(F.broadcast(c))
             .select(source_col, keep_ppm.alias("keep_ppm")))
    return (docs.join(F.broadcast(rates), source_col)
            .filter(sample_decision(id_col, "keep_ppm", salt=salt))
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col(source_col), F.col("keep_ppm")))


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


def weighted_sample(df: DataFrame, weight_col: str, id_col: str,
                    k: int) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis, IPL 2006): each row draws a reproducible
    uniform ``u ∈ (0, 1]`` from the portable hash of its id and is
    ranked by ``ln(u)/w`` descending — the top-``k`` rows are then a
    weight-proportional sample without replacement, with no RNG state
    and no second pass over the weights (no normalization needed).
    The same hash-not-rand discipline as every sampler here: retries
    and re-runs select the SAME rows, and an ANSI engine reproduces
    the draw.  Ranking uses the ROUNDED score with an id tie-break so
    cross-engine last-ulp ln() differences cannot reorder the cut.

    Scale shape: one scan computing a scalar per row, then a global
    top-k (TakeOrderedAndProject — no full sort)."""
    u = ((portable_hash64(F.col(id_col).cast("string"), salt="ws|")
          + F.lit(1)).cast("double") / F.lit(float(1 << 60)))
    # + 0.0 canonicalizes IEEE negative zero: round(-1e-7, 6) is -0.0
    # in some engines and 0.0 in others, and the driver hashes the
    # string form
    score = (F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
             + F.lit(0.0))
    return (df.select(F.col(id_col), F.col(weight_col),
                      score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))


def dsir_importance_weights(docs: DataFrame, target_cond: str,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            buckets: int = 4096,
                            alpha: float = 0.5) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023 — Data
    Selection via Importance Resampling): score every document by how
    much it resembles a TARGET slice of the corpus (``target_cond``, a
    SQL boolean over the doc frame, e.g. ``lang = 'en'``) relative to
    the raw corpus, under hashed-n-gram bag-of-features unigram
    models.  ``log_weight = Σ_f cnt_f · (ln p̂_target(f) − ln p̂_raw(f))``
    with Laplace-``alpha`` smoothing over ``buckets`` hashed features
    (unigrams + adjacent bigrams, the paper's construction).
    High-weight documents are target-like; a downstream resampler
    (``weighted_sample``) keeps them in proportion.

    Hashing is the portable md5 fold so the weights are reproducible
    in ANSI SQL; log sums round to 6 decimals (same cross-engine float
    discipline as ``unigram_lm_scores``).

    Scale shape: features explode once and collapse immediately to
    (doc, bucket) counts; both model fits are one partial-aggregated
    groupBy over that frame (bounded by ``buckets`` rows each — the
    hashed-feature trick is exactly what makes DSIR O(corpus) with a
    constant-size model); the bucket→log-ratio table broadcasts.  No
    step holds raw text after tokenization.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    head = F.slice(toks, F.lit(1), F.greatest(n - 1, F.lit(0)))
    tail = F.slice(toks, F.lit(2), F.greatest(n - 1, F.lit(0)))
    bigrams = F.zip_with(head, tail,
                         lambda a, b: F.concat_ws(" ", a, b))
    feats = docs.select(
        F.col(id_col),
        F.expr(target_cond).alias("__is_target"),
        F.explode(F.concat(toks, bigrams)).alias("f"))
    tf = scoped_persist(
        feats.groupBy(id_col, "__is_target",
                      F.pmod(portable_hash64(F.col("f")),
                             F.lit(buckets)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt")))
    # both model fits in ONE pivot aggregate over the (doc, bucket)
    # frame (r11: the former separate raw/target aggs + their join
    # collapsed — a bucket with no target rows gets the same
    # COALESCE(0) the old left join produced; the totals then roll up
    # from the 4096-row stats table instead of re-scanning tf)
    stats = tf.groupBy("bucket").agg(
        F.sum("cnt").alias("c_raw"),
        F.coalesce(F.sum(F.when(F.col("__is_target"), F.col("cnt"))),
                   F.lit(0)).alias("c_tgt"))
    totals = stats.agg(F.sum("c_raw").alias("n_raw"),
                       F.sum("c_tgt").alias("n_tgt"))
    lam = (stats.crossJoin(F.broadcast(totals))
           .select(
               "bucket",
               (F.log((F.col("c_tgt") + F.lit(alpha))
                      / (F.col("n_tgt") + F.lit(alpha * buckets)))
                - F.log((F.col("c_raw") + F.lit(alpha))
                        / (F.col("n_raw") + F.lit(alpha * buckets))))
               .alias("lam")))
    return (tf.join(F.broadcast(lam), "bucket")
            .groupBy(id_col)
            .agg(F.sum("cnt").cast("long").alias("n_feats"),
                 (F.round(F.sum(F.col("cnt") * F.col("lam")), 6)
                  + F.lit(0.0)).alias("log_weight")))
