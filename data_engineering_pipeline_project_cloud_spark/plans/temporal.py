"""Event-time operators over the ``events`` table (SURVEY.md §7 M5
batch faces; the streaming faces live in ``streaming/events.py`` and
are equivalence-tested against these in pytest).

Windows here are the batch expression of the same logical operators
Structured Streaming runs incrementally: tumbling/sliding via
``F.window``, sessions via gap-split windows, point-in-time enrichment
via the as-of operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import epoch_seconds, money
from ..operators.asof import asof_join_native
from ..sources import load_table

SESSION_GAP_MIN = 30


def tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type: the canonical
    streaming aggregation, expressed on the batch table.  ``F.window``
    is a projection + hash agg — one shuffle on (window, type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(money("value")).cast("double").alias("sum_value"),
             F.countDistinct("user_id").cast("long").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value", "n_users")
    )


def sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): each event lands in
    2 windows.  Spark expands window assignment map-side; the oracle
    reproduces it as a union of two bucket-shifted tumbling aggs."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(money("value")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min inactivity): the classic
    lag → new-session flag → running sum pattern.  Two window passes
    over ONE shuffle on user_id (same partitioning reused — Spark
    does not re-exchange between windows with identical keys)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    gap_s = SESSION_GAP_MIN * 60
    # epoch_seconds = fractional epoch; unix_timestamp would truncate
    # sub-second precision and disagree with the oracle's EPOCH().
    with_flag = ev.select(
        "user_id", "ts", "event_id", "value",
        F.when(
            (epoch_seconds("ts")
             - epoch_seconds(F.lag("ts", 1).over(w))) > gap_s,
            F.lit(1)).otherwise(F.lit(0)).alias("new_session"),
    )
    with_id = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(money("value")).cast("double").alias("sum_value"))
        .withColumn("session_seq", F.col("session_seq").cast("long"))
    )


def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event joined to the user's most
    recent order as of the event time (backward as-of; see
    operators/asof.py).  Right side deduped to one row per
    (customer, orderdate) — max orderkey — so the match is unique and
    deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderkey").alias("order_id"))
    # keep-max per (user, date) as a hash aggregate: cheaper than the
    # equivalent window (no per-partition sort), same deterministic row
    dedup = orders.groupBy("user_id", "order_date").agg(
        F.max("order_id").alias("order_id"))
    return _canon_asof(asof_join_native(
        ev, dedup, on_left="ts", on_right="order_date",
        by_left="user_id", by_right="user_id",
        value_cols=["order_date", "order_id"]))


#: epoch sentinel for "no order as of this event" — left-asof misses are
#: presented null-free (canonical output rule, plans/parity.py docstring)
_NO_MATCH_TS = "1970-01-01 00:00:00"


def _canon_asof(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id", "ts", "user_id", "event_type",
        F.coalesce("order_date", F.lit(_NO_MATCH_TS).cast("timestamp"))
        .alias("order_date"),
        F.coalesce("order_id", F.lit(-1)).cast("long").alias("order_id"))


def click_purchase_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-bounded event correlation: each purchase within 1 hour
    after a click by the same user (the batch face of the stream-stream
    join in ``streaming/joins.py``).  Equi-join on user + time-range
    predicate: Spark hashes on user and applies the range as a post-join
    filter — the same shape the streaming engine executes with
    watermark-bounded state."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"))
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts")
               <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")))
        .select("click_id", "purchase_id", "user_id", "click_ts",
                "purchase_ts",
                F.round(epoch_seconds("purchase_ts")
                        - epoch_seconds("click_ts"), 6)
                .alias("lag_seconds"))
    )


TOLERANCE_DAYS = 30


def asof_events_orders_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with staleness bound: matches older than 30 days are
    treated as no data (merge_asof ``tolerance`` semantics) — the
    point-in-time-correctness rule for feature stores."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderkey").alias("order_id"))
    dedup = orders.groupBy("user_id", "order_date").agg(
        F.max("order_id").alias("order_id"))
    return _canon_asof(asof_join_native(
        ev, dedup, on_left="ts", on_right="order_date",
        by_left="user_id", by_right="user_id",
        value_cols=["order_date", "order_id"],
        tolerance_seconds=TOLERANCE_DAYS * 86400.0))


def resample_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per user, a dense hourly
    grid from their first to last event, zero-filled where no events
    landed — the regularization step before any per-entity time-series
    model.  The grid is generated per user with ``sequence()`` and
    exploded (grid rows ≪ event rows when activity is bursty), then
    left-joined to the hourly aggregate.  Restricted to 20 users so
    the oracle compare stays small; the plan is user-count-invariant."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = (ev.groupBy("user_id",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                   F.sum(money("value")).cast("decimal(18,2)")
                   .alias("sum_value")))
    span = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("first_hour"),
        F.date_trunc("hour", F.max("ts")).alias("last_hour"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("first_hour", "last_hour",
                             F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    return (grid.join(hourly, ["user_id", "hour"], "left")
            .select("user_id", "hour",
                    F.coalesce("n_events", F.lit(0)).cast("long")
                    .alias("n_events"),
                    F.coalesce("sum_value", F.lit(0).cast("decimal(18,2)"))
                    .cast("double").alias("sum_value")))


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel view → click → purchase: each
    stage's timestamp must be at or after the previous stage's FIRST
    occurrence.  Three conditional-min aggregations over one shuffle
    on user_id (the CASE-inside-MIN trick — no joins, no window):
    stage 2 uses the stage-1 time computed in the same pass via a
    self-conditional re-aggregation."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    # first view per user (stage 1)
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .alias("first_view"))
    # first click at/after first view (stage 2)
    s2 = (ev.join(s1, "user_id")
          .groupBy("user_id", "first_view")
          .agg(F.min(F.when((F.col("event_type") == "click")
                            & (F.col("ts") >= F.col("first_view")),
                            F.col("ts"))).alias("first_click")))
    # first purchase at/after first click (stage 3)
    s3 = (ev.join(s2, "user_id")
          .groupBy("user_id", "first_view", "first_click")
          .agg(F.min(F.when((F.col("event_type") == "purchase")
                            & (F.col("ts") >= F.col("first_click")),
                            F.col("ts"))).alias("first_purchase")))
    return s3.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("first_view").cast("long").alias("n_viewed"),
        F.count("first_click").cast("long").alias("n_clicked_after_view"),
        F.count("first_purchase").cast("long").alias("n_purchased_after_click"),
    )


ROLL_DAYS = 7
DEBOUNCE_S = 60


def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by the week of their first
    event, activity counted per (cohort week, weeks-since-cohort) —
    the product-analytics staple.  Three shuffles, all at or below
    user grain: first-event per user, distinct (user, week) activity,
    and the final tiny (cohort, offset) aggregate; cohort sizes are
    aggregated BEFORE the broadcast join back (agg-below-join)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size"))
    activity = (ev.select("user_id",
                          F.date_trunc("week", "ts").cast("date")
                          .alias("week"))
                .distinct())
    offset = (F.datediff("week", "cohort_week") / F.lit(7)).cast("long")
    ret = (activity.join(firsts, "user_id")
           .groupBy("cohort_week", offset.alias("week_offset"))
           .agg(F.countDistinct("user_id").cast("long").alias("n_active")))
    return (ret.join(F.broadcast(sizes), "cohort_week")
            .select(F.col("cohort_week").cast("string").alias("cohort_week"),
                    "week_offset", "n_active", "cohort_size",
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))


OUTLIER_MIN_N = 5
OUTLIER_SIGMA = 2.0


def customer_spend_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend anomalies: orders above mean + 2σ of that
    customer's own history (population σ from raw power sums — the
    cross-engine-stable form, like ``stats_moments``), customers with
    < 5 orders skipped.  Stats aggregate below the join and broadcast
    back; the threshold and the compared total are both rounded so an
    engine's last-ulp difference cannot flip a boundary row."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("double")
    stats = (o.groupBy("o_custkey")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(p).alias("s"),
                  F.sum(p * p).alias("s2"))
             .filter(F.col("n") >= OUTLIER_MIN_N))
    mean = F.col("s") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    thr = stats.select(
        "o_custkey", F.col("n").cast("long").alias("n_orders"),
        F.round(mean + OUTLIER_SIGMA * F.sqrt(F.greatest(var, F.lit(0.0))), 4)
        .alias("threshold"))
    return (o.join(F.broadcast(thr), "o_custkey")
            .filter(F.round(p, 4) > F.col("threshold"))
            .select(F.col("o_custkey").alias("customer_id"),
                    F.col("o_orderkey").alias("order_id"),
                    F.round(p, 4).alias("order_total"),
                    "threshold", "n_orders"))


def rolling_7d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per customer, the trailing 7-day order
    total at every order — a RANGE frame over event time, not a ROWS
    frame (peers at the same timestamp aggregate together; gaps count
    as time, not rows).  Spark's range frame needs a numeric sort key,
    so the frame runs over epoch seconds — identical semantics to the
    oracle's ``RANGE BETWEEN INTERVAL 7 DAYS PRECEDING`` under the
    pinned UTC session.  One shuffle on the customer key."""
    o = load_table(spark, sf_dir, "orders")
    secs = epoch_seconds("o_orderdate").cast("long")
    w = (Window.partitionBy("o_custkey").orderBy(secs)
         .rangeBetween(-ROLL_DAYS * 86400, 0))
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").alias("order_date"),
        money("o_totalprice").cast("double").alias("order_total"),
        F.sum(money("o_totalprice")).over(w).cast("double")
        .alias("spend_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_7d"))


def debounce(ev: DataFrame, gap_s: float = DEBOUNCE_S) -> DataFrame:
    """Debounce per (user, event_type): drop any event within
    ``gap_s`` seconds of that key's previous event (kept or not — a
    debounce, not a throttle) — the telemetry duplicate-burst cleanup.
    One lag over one shuffle on the key; kept rows carry the gap to
    the previous event (-1 for the first)."""
    w = (Window.partitionBy("user_id", "event_type")
         .orderBy(F.col("ts").asc(), F.col("event_id").asc()))
    gap = epoch_seconds("ts") - epoch_seconds(F.lag("ts", 1).over(w))
    return (ev.select("event_id", "ts", "user_id", "event_type",
                      F.round(F.coalesce(gap, F.lit(-1.0)), 6)
                      .alias("gap_seconds"))
            .filter((F.col("gap_seconds") > gap_s)
                    | (F.col("gap_seconds") == -1.0)))


def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of ``debounce`` over the events table."""
    return debounce(load_table(spark, sf_dir, "events"))


SEQ_CAP = 50


def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user chronological event-type sequence — the
    training-example assembly shape (user history → one serialized
    sequence row).  The cap is applied before collection (ranked
    window, filter, THEN collect), so no user's aggregation buffer
    exceeds ``SEQ_CAP`` events however hot the key; total count and
    last-seen come from the same window pass.  The sequence is
    pipe-joined (harnesses serialize arrays inconsistently)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.row_number().over(
            w.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        .alias("__rn"),
        F.count(F.lit(1)).over(w).alias("__n"),
        F.max("ts").over(w).alias("__last_ts"))
    return (ranked.filter(F.col("__rn") <= SEQ_CAP)
            .groupBy("user_id")
            .agg(F.first("__n").cast("long").alias("n_events"),
                 F.first("__last_ts").alias("last_ts"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("__rn").alias("rn"),
                                      F.col("event_type").alias("et")))),
                         lambda s: s["et"]), "|").alias("event_seq")))


TS_SIM_QUERY_USERS = 5
TS_SIM_TOPK = 5
TS_SIM_DIM = 24


def ts_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the streaming-similarity-search
    family, re-expressed batch-first): each user's hour-of-day
    activity profile — a dense 24-dim event-count vector — compared by
    exact cosine, top-k nearest users per broadcast query user.

    Scale shape: profiles are ONE partial-aggregated groupBy (24
    conditional sums, map-side; the shuffle carries 24 doubles/user,
    never events), persisted because they feed both the corpus side
    and the query filter; the |Q|-row query set broadcasts; similarity
    is a single profile-table scan.  At larger user counts the vector
    schema is identical to ``embeddings`` — swap the scan for the
    LSH/IVF blocking in operators/similarity.py.
    """
    from ..caching import scoped_persist

    ev = load_table(spark, sf_dir, "events")
    hour = F.hour("ts")
    prof = ev.groupBy("user_id").agg(
        *[F.sum(F.when(hour == h, 1).otherwise(0)).cast("double")
          .alias(f"h{h}") for h in range(TS_SIM_DIM)])
    vec = F.array(*[F.col(f"h{h}") for h in range(TS_SIM_DIM)])
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    p = scoped_persist(prof.select(
        F.col("user_id"), vec.alias("v"), norm.alias("nrm")))
    q = (p.filter(F.col("user_id") < TS_SIM_QUERY_USERS)
         .select(F.col("user_id").alias("query_user"),
                 F.col("v").alias("qv"), F.col("nrm").alias("qn")))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0), lambda a, x: a + x)
    sims = (p.crossJoin(F.broadcast(q))
            .filter(F.col("user_id") != F.col("query_user"))
            .select("query_user",
                    F.col("user_id").alias("candidate_user"),
                    F.round(dot / (F.col("qn") * F.col("nrm")), 6)
                    .alias("cosine_sim")))
    w = Window.partitionBy("query_user").orderBy(
        F.col("cosine_sim").desc(), F.col("candidate_user").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TS_SIM_TOPK)
            .select("query_user", "candidate_user", "cosine_sim",
                    F.col("rank").cast("long").alias("rank")))


_TS_H = ", ".join(
    f"CAST(SUM(CASE WHEN hour(ts) = {h} THEN 1 ELSE 0 END) AS DOUBLE)"
    f" AS h{h}" for h in range(24))
_TS_VEC = "[" + ", ".join(f"h{h}" for h in range(24)) + "]"



def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: LAG pairs each event with its predecessor (one shuffle on
    user_id, ties pinned by event_id), transition counts aggregate at
    |types|² grain, and probabilities normalize per source type — the
    funnel/journey summary every product-analytics stack computes.  At
    100 TB the only corpus-grain work is the single user_id window
    pass; everything after runs on the tiny type×type frame.  Counts
    are exact; p rounds at 6dp after one double division (the
    established cross-engine-safe shape)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    seq = ev.select(F.lag("event_type").over(w).alias("from_type"),
                    F.col("event_type").alias("to_type"))
    t = (seq.filter(F.col("from_type").isNotNull())
         .groupBy("from_type", "to_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n_trans")))
    tot = t.groupBy("from_type").agg(F.sum("n_trans").alias("tot"))
    return (t.join(tot, "from_type")
            .select("from_type", "to_type", "n_trans",
                    F.round(F.col("n_trans").cast("double")
                            / F.col("tot").cast("double"), 6).alias("p")))

#: Rolling anomaly window: trailing days (exclusive of the current
#: day), minimum history before a z-score is emitted, and the flag
#: threshold.
ANOM_WINDOW_DAYS = 28
ANOM_MIN_DAYS = 7
ANOM_Z = 2.0


def order_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the daily order-count
    series per priority — the monitoring primitive over any metric
    stream: each day's count is compared against its own trailing
    ``ANOM_WINDOW_DAYS``-day baseline (EXCLUSIVE of the current day —
    the anomaly must not contaminate its own baseline) and flagged
    when |z| > ``ANOM_Z``.  The baseline runs as ONE range-frame
    window pass over the day-grain series (tiny after the daily
    pre-aggregation — the scale cost is the first groupBy, not the
    window).  Mean/variance come from integer power sums (counts are
    exact), so both engines compute identical doubles — the
    cross-engine-deterministic z-score idiom
    (``customer_spend_outliers``)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderpriority").alias("priority"),
                       F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    day = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = (Window.partitionBy("priority").orderBy(day)
         .rangeBetween(-ANOM_WINDOW_DAYS, -1))
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    c = F.count(F.lit(1)).over(w)
    mean = s1.cast("double") / c
    var = (s2.cast("double") - s1.cast("double") * s1 / c) / (c - 1)
    ok = (c >= ANOM_MIN_DAYS) & (s2 * c > s1 * s1)
    z = F.when(ok, F.round((F.col("n") - mean) / F.sqrt(var), 6))
    # dates present as ISO strings (canonical output rule: VARCHAR,
    # not engine-variant date serializations)
    return (daily
            .select("priority",
                    F.date_format("d", "yyyy-MM-dd").alias("d"),
                    F.col("n").alias("n_orders"),
                    z.alias("z"),
                    F.when(ok, F.abs(z) > ANOM_Z).alias("is_anomaly")))


#: ACF lags reported for the daily order series.
ACF_MAX_LAG = 10


def order_volume_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily order-count series at
    lags 1..ACF_MAX_LAG — the seasonality/persistence diagnostic run
    before fitting any forecast model (a weekly cycle shows as a
    lag-7 peak).  Exactness idiom: with integer counts, both the
    numerator and denominator of
    ``acf(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²`` expand into pure
    INTEGER sufficient statistics when scaled by n²::

        num·n² = n²·C_k − n·S·(A_k + B_k) + (n−k)·S²
        den·n² = n²·Q − n·S²

    (S = Σx, Q = Σx², C_k = Σ x_t·x_{t+k}, A_k/B_k the lagged pair
    margins) — so both engines compute identical doubles from one
    exact-integer division.  Scale shape: the day-grain aggregate is
    the only corpus-sized pass; the K-lag window and the final K-row
    arithmetic run on the tiny daily series."""
    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = Window.orderBy("d")  # day-grain series: tiny, single partition
    lagged = daily.select(
        "n", *[F.lead("n", k).over(w).alias(f"l{k}")
               for k in range(1, ACF_MAX_LAG + 1)])
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec).alias("cnt"),
            F.sum("n").cast(dec).alias("s"),
            F.sum(F.col("n") * F.col("n")).cast(dec).alias("q")]
    for k in range(1, ACF_MAX_LAG + 1):
        lk = F.col(f"l{k}")
        aggs += [
            F.sum(F.col("n") * lk).cast(dec).alias(f"c{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("n"))).cast(dec)
            .alias(f"a{k}"),
            F.sum(lk).cast(dec).alias(f"b{k}")]
    t = lagged.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(k).cast("int").alias("lag"),
            ((F.col("cnt") * F.col("cnt") * F.col(f"c{k}")
              - F.col("cnt") * F.col("s")
              * (F.col(f"a{k}") + F.col(f"b{k}"))
              + (F.col("cnt") - k) * F.col("s") * F.col("s"))
             .cast("double")).alias("num"),
            ((F.col("cnt") * F.col("cnt") * F.col("q")
              - F.col("cnt") * F.col("s") * F.col("s"))
             .cast("double")).alias("den"))
        for k in range(1, ACF_MAX_LAG + 1)])
    return (t.select(F.explode(rows).alias("r"))
            .select(F.col("r.lag").alias("lag"),
                    F.round(F.col("r.num") / F.col("r.den"), 6)
                    .alias("acf")))


#: Seasonal-naive backtest horizon: forecast each day with the value
#: one season (week) earlier.
BACKTEST_SEASON_DAYS = 7


def forecast_backtest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin BACKTEST of the seasonal-naive forecaster
    (ŷ_t = y_{t−7}) on the daily order-count series per priority — the
    evaluation harness any forecasting pipeline needs before trusting
    a model: every day that has a same-weekday predecessor is scored,
    and the per-priority error profile is reported as MAE, bias,
    weighted MAPE (Σ|e|/Σy — the ratio-of-sums form keeps it
    exact-integer, unlike per-term MAPE whose float sum is
    order-dependent) and RMSE.  All four metrics reduce to integer
    sufficient statistics (Σ|e|, Σe, Σe², Σy, n) → one deterministic
    double division each.  Scale shape: the day-grain aggregate is the
    only corpus pass; the forecast 'join' is the daily series against
    itself shifted one season — day-grain rows, negligible."""
    from ..caching import scoped_persist

    o = load_table(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderpriority").alias("priority"),
                       F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.count(F.lit(1)).cast("long").alias("y")))
    daily = scoped_persist(daily)
    lag = daily.select(
        "priority",
        F.date_add("d", BACKTEST_SEASON_DAYS).alias("d"),
        F.col("y").alias("yhat"))
    j = daily.join(lag, ["priority", "d"])
    e = F.col("y") - F.col("yhat")
    agg = (j.groupBy("priority")
           .agg(F.count(F.lit(1)).cast("long").alias("n_evals"),
                F.sum(F.abs(e)).cast("long").alias("sae"),
                F.sum(e).cast("long").alias("se"),
                F.sum(e * e).cast("long").alias("sse"),
                F.sum("y").cast("long").alias("sy")))
    return agg.select(
        "priority", "n_evals",
        F.round(F.col("sae").cast("double") / F.col("n_evals"), 6)
        .alias("mae"),
        F.round(F.col("se").cast("double") / F.col("n_evals"), 6)
        .alias("bias"),
        F.round(F.col("sae").cast("double") / F.col("sy"), 6)
        .alias("wmape"),
        F.round(F.sqrt(F.col("sse").cast("double") / F.col("n_evals")),
                6).alias("rmse"))


def events_scd2_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against an SCD Type-2 dimension (the
    feature-store primitive): each event is enriched with the status
    VERSION that was valid at the event's timestamp — the version
    whose [valid_from, valid_to) half-open window contains ``ts``.
    Because SCD2 validity windows PARTITION each key's timeline, the
    interval lookup reduces exactly to a backward as-of join on
    ``valid_from`` (operators/asof.py — one shuffle + window, no theta
    join); events before the key's first version get the NONE/-1
    sentinel.  The dimension is the same history
    ``scd2_order_status_history`` builds
    (operators/relational.py:scd2_compact); the oracle derives it
    relationally and joins by the explicit BETWEEN predicate, so the
    driver hash proves the as-of reduction is semantically identical
    to the interval join."""
    from ..operators import relational as rel

    orders = load_table(spark, sf_dir, "orders")
    obs = orders.select("o_custkey",
                        F.col("o_orderstatus").alias("status"),
                        "o_orderdate", "o_orderkey")
    hist = rel.scd2_compact(obs, ["o_custkey"], "status",
                            ["o_orderdate", "o_orderkey"],
                            high_date="9999-12-31 00:00:00")
    dim = hist.select(F.col("o_custkey").cast("long").alias("user_id"),
                      "valid_from", "status",
                      F.col("version").cast("long").alias("version"))
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts",
        F.col("user_id").cast("long").alias("user_id"))
    out = asof_join_native(ev, dim, on_left="ts", on_right="valid_from",
                           by_left="user_id", by_right="user_id",
                           value_cols=["status", "version"])
    return out.select(
        "event_id", "user_id",
        F.coalesce("status", F.lit("NONE")).alias("status"),
        F.coalesce("version", F.lit(-1)).cast("long").alias("version"))


ORACLE_SQL: dict[str, str] = {
    "order_volume_acf": f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1
        ),
        seq AS (
            SELECT n, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS cnt,
                   CAST(SUM(n) AS HUGEINT) AS s,
                   CAST(SUM(n * n) AS HUGEINT) AS q
            FROM seq
        ),
        agg AS (
            SELECT l.k,
                   CAST(SUM(CAST(a.n AS HUGEINT) * b.n) AS HUGEINT) AS ck,
                   CAST(SUM(a.n) AS HUGEINT) AS ak,
                   CAST(SUM(b.n) AS HUGEINT) AS bk
            FROM range(1, {ACF_MAX_LAG + 1}) l(k)
            CROSS JOIN seq a
            JOIN seq b ON b.rn = a.rn + l.k
            GROUP BY 1
        )
        SELECT CAST(k AS INT) AS lag,
               round(CAST(cnt * cnt * ck - cnt * s * (ak + bk)
                          + (cnt - k) * s * s AS DOUBLE)
                     / CAST(cnt * cnt * q - cnt * s * s AS DOUBLE),
                     6) AS acf
        FROM agg, tot
    """,
    "forecast_backtest_orders": f"""
        WITH daily AS (
            SELECT o_orderpriority AS priority,
                   CAST(o_orderdate AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM orders GROUP BY 1, 2
        ),
        j AS (
            SELECT a.priority, a.y, b.y AS yhat
            FROM daily a
            JOIN daily b ON b.priority = a.priority
                        AND b.d = a.d - INTERVAL {BACKTEST_SEASON_DAYS} DAYS
        ),
        agg AS (
            SELECT priority,
                   CAST(COUNT(*) AS BIGINT) AS n_evals,
                   CAST(SUM(ABS(y - yhat)) AS BIGINT) AS sae,
                   CAST(SUM(y - yhat) AS BIGINT) AS se,
                   CAST(SUM((y - yhat) * (y - yhat)) AS BIGINT) AS sse,
                   CAST(SUM(y) AS BIGINT) AS sy
            FROM j GROUP BY 1
        )
        SELECT priority, n_evals,
               round(CAST(sae AS DOUBLE) / n_evals, 6) AS mae,
               round(CAST(se AS DOUBLE) / n_evals, 6) AS bias,
               round(CAST(sae AS DOUBLE) / sy, 6) AS wmape,
               round(sqrt(CAST(sse AS DOUBLE) / n_evals), 6) AS rmse
        FROM agg
    """,
    "order_volume_anomalies": f"""
        WITH daily AS (
            SELECT o_orderpriority AS priority,
                   CAST(o_orderdate AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        ),
        win AS (
            SELECT priority, d, n,
                   SUM(n) OVER w AS s1,
                   SUM(n * n) OVER w AS s2,
                   COUNT(*) OVER w AS c
            FROM daily
            WINDOW w AS (PARTITION BY priority ORDER BY d
                         RANGE BETWEEN INTERVAL {ANOM_WINDOW_DAYS} DAYS
                               PRECEDING
                               AND INTERVAL 1 DAYS PRECEDING)
        )
        SELECT priority, strftime(d, '%Y-%m-%d') AS d, n AS n_orders,
               CASE WHEN c >= {ANOM_MIN_DAYS} AND s2 * c > s1 * s1
                    THEN round((n - CAST(s1 AS DOUBLE) / c)
                               / sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / c)
                                      / (c - 1)), 6)
               END AS z,
               CASE WHEN c >= {ANOM_MIN_DAYS} AND s2 * c > s1 * s1
                    THEN abs(round((n - CAST(s1 AS DOUBLE) / c)
                               / sqrt((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / c)
                                      / (c - 1)), 6)) > {ANOM_Z}
               END AS is_anomaly
        FROM win
    """,
    "events_scd2_status": """
        WITH obs AS (
            SELECT o_custkey, o_orderstatus AS status,
                   o_orderdate, o_orderkey
            FROM orders
        ),
        lagged AS (
            SELECT *, CASE WHEN lag(status) OVER w IS NULL
                             OR lag(status) OVER w <> status
                           THEN 1 ELSE 0 END AS chg
            FROM obs
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ),
        versioned AS (
            SELECT *, SUM(chg) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS version
            FROM lagged
        ),
        runs AS (
            SELECT o_custkey, version, status,
                   MIN(o_orderdate) AS valid_from
            FROM versioned GROUP BY o_custkey, version, status
        ),
        final AS (
            SELECT o_custkey, status, valid_from,
                   COALESCE(LEAD(valid_from) OVER (
                                PARTITION BY o_custkey ORDER BY version),
                            TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
                   version
            FROM runs
        )
        SELECT e.event_id,
               CAST(e.user_id AS BIGINT) AS user_id,
               COALESCE(f.status, 'NONE') AS status,
               CAST(COALESCE(f.version, -1) AS BIGINT) AS version
        FROM events e
        LEFT JOIN final f
          ON f.o_custkey = e.user_id
         AND e.ts >= f.valid_from AND e.ts < f.valid_to
    """,
    "event_transition_matrix": """
        WITH seq AS (
            SELECT event_type AS to_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS from_type
            FROM events
        ), t AS (
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
            FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
        ), tot AS (
            SELECT from_type, SUM(n_trans) AS tot FROM t GROUP BY 1
        )
        SELECT t.from_type, t.to_type, n_trans,
               CAST(round(CAST(n_trans AS DOUBLE)
                          / CAST(tot AS DOUBLE), 6) AS DOUBLE) AS p
        FROM t JOIN tot ON t.from_type = tot.from_type
    """,
    "ts_profile_similarity": f"""
        WITH prof AS (
            SELECT user_id, {_TS_H}
            FROM events GROUP BY user_id
        ),
        p AS (
            SELECT user_id, {_TS_VEC} AS v,
                   sqrt(list_sum(list_transform({_TS_VEC}, x -> x * x)))
                       AS nrm
            FROM prof
        ),
        q AS (
            SELECT user_id AS query_user, v AS qv, nrm AS qn
            FROM p WHERE user_id < {TS_SIM_QUERY_USERS}
        ),
        sims AS (
            SELECT q.query_user, p.user_id AS candidate_user,
                   round(
                       list_sum(list_transform(generate_series(1, 24),
                           i -> q.qv[i] * p.v[i])) / (q.qn * p.nrm),
                       6) AS cosine_sim
            FROM p CROSS JOIN q
            WHERE p.user_id <> q.query_user
        ),
        ranked AS (
            SELECT query_user, candidate_user, cosine_sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_user
                        ORDER BY cosine_sim DESC, candidate_user ASC)
                        AS BIGINT) AS rank
            FROM sims
        )
        SELECT * FROM ranked WHERE rank <= {TS_SIM_TOPK}
    """,
    "weekly_cohort_retention": """
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id
        ),
        sizes AS (
            SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
            FROM firsts GROUP BY cohort_week
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events
        ),
        ret AS (
            SELECT f.cohort_week,
                   CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT)
                       AS week_offset,
                   CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
            FROM activity a JOIN firsts f ON a.user_id = f.user_id
            GROUP BY 1, 2
        )
        SELECT CAST(r.cohort_week AS VARCHAR) AS cohort_week,
               r.week_offset, r.n_active, s.cohort_size,
               CAST(round(r.n_active / CAST(s.cohort_size AS DOUBLE), 6)
                    AS DOUBLE) AS retention
        FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
    """,
    "customer_spend_outliers": f"""
        WITH stats AS (
            SELECT o_custkey,
                   COUNT(*) AS n,
                   SUM(CAST(o_totalprice AS DOUBLE)) AS s,
                   SUM(CAST(o_totalprice AS DOUBLE)
                       * CAST(o_totalprice AS DOUBLE)) AS s2
            FROM orders GROUP BY o_custkey
            HAVING COUNT(*) >= {OUTLIER_MIN_N}
        ),
        thr AS (
            SELECT o_custkey, CAST(n AS BIGINT) AS n_orders,
                   round(s / n + {OUTLIER_SIGMA}
                         * sqrt(greatest(s2 / n - (s / n) * (s / n), 0.0)), 4)
                       AS threshold
            FROM stats
        )
        SELECT o.o_custkey AS customer_id,
               o.o_orderkey AS order_id,
               CAST(round(CAST(o.o_totalprice AS DOUBLE), 4) AS DOUBLE)
                   AS order_total,
               CAST(t.threshold AS DOUBLE) AS threshold,
               t.n_orders
        FROM orders o JOIN thr t ON o.o_custkey = t.o_custkey
        WHERE round(CAST(o.o_totalprice AS DOUBLE), 4) > t.threshold
    """,
    "rolling_7d_customer_spend": f"""
        SELECT o_custkey AS customer_id,
               o_orderkey AS order_id,
               o_orderdate AS order_date,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
                   AS order_total,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
                   AS spend_7d,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_7d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL {ROLL_DAYS} DAYS PRECEDING
                     AND CURRENT ROW)
    """,
    "event_debounce": f"""
        WITH gapped AS (
            SELECT event_id, ts, user_id, event_type,
                   round(COALESCE(EPOCH(ts) - EPOCH(LAG(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts ASC, event_id ASC)), -1.0), 6)
                       AS gap_seconds
            FROM events
        )
        SELECT * FROM gapped
        WHERE gap_seconds > {DEBOUNCE_S} OR gap_seconds = -1.0
    """,
    "user_event_sequences": f"""
        WITH ranked AS (
            SELECT user_id, event_type, ts,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n,
                   max(ts) OVER (PARTITION BY user_id) AS last_ts
            FROM events
        )
        SELECT user_id,
               CAST(MAX(n) AS BIGINT) AS n_events,
               MAX(last_ts) AS last_ts,
               string_agg(event_type, '|' ORDER BY rn ASC) AS event_seq
        FROM ranked WHERE rn <= {SEQ_CAP}
        GROUP BY user_id
    """,
    "resample_fill_hourly": """
        WITH ev AS (SELECT * FROM events WHERE user_id < 20),
        hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2))
                       AS sum_value
            FROM ev GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id,
                   date_trunc('hour', MIN(ts)) AS first_hour,
                   date_trunc('hour', MAX(ts)) AS last_hour
            FROM ev GROUP BY user_id
        ),
        grid AS (
            SELECT user_id,
                   unnest(range(first_hour, last_hour + INTERVAL 1 HOUR,
                                INTERVAL 1 HOUR)) AS hour
            FROM span
        )
        SELECT g.user_id, CAST(g.hour AS TIMESTAMP) AS hour,
               CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(h.sum_value, 0) AS DOUBLE) AS sum_value
        FROM grid g
        LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
    """,
    "event_funnel": """
        WITH s1 AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
            FROM events GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, s1.first_view,
                   MIN(CASE WHEN e.event_type = 'click'
                            AND e.ts >= s1.first_view THEN e.ts END) AS first_click
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            GROUP BY e.user_id, s1.first_view
        ),
        s3 AS (
            SELECT e.user_id, s2.first_view, s2.first_click,
                   MIN(CASE WHEN e.event_type = 'purchase'
                            AND e.ts >= s2.first_click THEN e.ts END) AS first_purchase
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            GROUP BY e.user_id, s2.first_view, s2.first_click
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(COUNT(first_view) AS BIGINT) AS n_viewed,
               CAST(COUNT(first_click) AS BIGINT) AS n_clicked_after_view,
               CAST(COUNT(first_purchase) AS BIGINT) AS n_purchased_after_click
        FROM s3
    """,
    "click_purchase_correlation": """
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id,
               c.ts AS click_ts,
               p.ts AS purchase_ts,
               CAST(round(EPOCH(p.ts) - EPOCH(c.ts), 6) AS DOUBLE) AS lag_seconds
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    "tumbling_hourly_events": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1, 2
    """,
    "sliding_events": """
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                   value
            FROM events
        )
        SELECT window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM assigned GROUP BY 1
    """,
    "sessionize_events": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        ids AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM ids GROUP BY user_id, session_seq
    """,
    "asof_events_orders_tolerance": """
        WITH dedup AS (
            SELECT o_custkey AS user_id, o_orderdate AS order_date,
                   MAX(o_orderkey) AS order_id
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.ts, e.user_id, e.event_type,
               COALESCE(CASE WHEN EPOCH(e.ts) - EPOCH(d.order_date) > 2592000.0
                             THEN NULL ELSE d.order_date END,
                        TIMESTAMP '1970-01-01 00:00:00') AS order_date,
               CAST(COALESCE(CASE WHEN EPOCH(e.ts) - EPOCH(d.order_date) > 2592000.0
                                  THEN NULL ELSE d.order_id END,
                             -1) AS BIGINT) AS order_id
        FROM events e
        ASOF LEFT JOIN dedup d
          ON e.user_id = d.user_id AND e.ts >= d.order_date
    """,
    "asof_events_orders": """
        WITH dedup AS (
            SELECT o_custkey AS user_id, o_orderdate AS order_date,
                   MAX(o_orderkey) AS order_id
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.ts, e.user_id, e.event_type,
               COALESCE(d.order_date, TIMESTAMP '1970-01-01 00:00:00')
                   AS order_date,
               CAST(COALESCE(d.order_id, -1) AS BIGINT) AS order_id
        FROM events e
        ASOF LEFT JOIN dedup d
          ON e.user_id = d.user_id AND e.ts >= d.order_date
    """,
}

QUERIES = {
    "event_transition_matrix": event_transition_matrix,
    "ts_profile_similarity": ts_profile_similarity,
    "weekly_cohort_retention": weekly_cohort_retention,
    "customer_spend_outliers": customer_spend_outliers,
    "rolling_7d_customer_spend": rolling_7d_customer_spend,
    "event_debounce": event_debounce,
    "user_event_sequences": user_event_sequences,
    "resample_fill_hourly": resample_fill_hourly,
    "event_funnel": event_funnel,
    "click_purchase_correlation": click_purchase_correlation,
    "tumbling_hourly_events": tumbling_hourly_events,
    "sliding_events": sliding_events,
    "sessionize_events": sessionize_events,
    "asof_events_orders": asof_events_orders,
    "asof_events_orders_tolerance": asof_events_orders_tolerance,
    "events_scd2_status": events_scd2_status,
    "order_volume_anomalies": order_volume_anomalies,
    "order_volume_acf": order_volume_acf,
    "forecast_backtest_orders": forecast_backtest_orders,
}
