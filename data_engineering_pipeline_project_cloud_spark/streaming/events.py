"""Structured Streaming over the ``events`` table (SURVEY.md §7 M5).

The reference is batch-only (SURVEY.md §2.7 ABSENT row: no watermarks,
no event windows, no state — ``scripts/pipeline.py`` is a one-shot
run); this module is the extension-mandate streaming surface.  Each
streaming face is the incremental form of a batch operator in
``plans/temporal.py`` and is equivalence-tested against it in pytest
(same input read via ``readStream`` + ``Trigger.AvailableNow``).

Scale notes (the part that matters at a real event firehose):
 - Watermarks bound state: without ``withWatermark`` a windowed agg
   keeps every window open forever; 2 h late-tolerance means state is
   ~2 h of windows per key, independent of stream length.
 - ``availableNow`` is the batch-parity trigger: processes the backlog
   incrementally (respecting maxFilesPerTrigger) then stops — the
   pattern for periodic catch-up jobs sharing code with the 24/7 path.
 - The stateful operator uses ``applyInPandasWithState``: state lives
   in the state store (RocksDB on a cluster), keyed by user — shuffle
   happens once on user_id, Arrow-batched per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import money

SESSION_GAP = "30 minutes"
WATERMARK = "2 hours"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    Schema is pinned from a batch scan of the same file (a streaming
    source cannot infer).  The nanosecond ``ts`` arrives as int64
    (``nanosAsLong``, see sources/catalog.py) and is converted to a
    microsecond timestamp exactly as the batch face does, so both
    faces see identical event times.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source lists a DIRECTORY; glob-filter to the one table
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .parquet(sf_dir))
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return stream


def stream_tumbling_hourly(events: DataFrame) -> DataFrame:
    """Streaming face of ``tumbling_hourly_events`` (minus the distinct
    user count — distinct aggregation is not incremental; the streaming
    profile uses ``approx_count_distinct``, checked for plausibility
    only)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(money("value")).cast("double").alias("sum_value"),
             F.approx_count_distinct("user_id").alias("approx_users"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value", "approx_users")
    )


def stream_sliding_counts(events: DataFrame) -> DataFrame:
    """Streaming face of ``sliding_events`` (1 h windows, 30 min slide)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(money("value")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def stream_session_windows(events: DataFrame) -> DataFrame:
    """Native ``session_window`` sessionization (30 min gap): merges
    events whose gap < 30 min per user — the incremental form of the
    batch lag→cumsum pattern in ``plans/temporal.py:sessionize_events``.

    Boundary semantics: a gap of EXACTLY the threshold starts a new
    session here, while the batch face's ``> gap`` keeps it — identical
    results whenever timestamps are sub-second-jittered (true for the
    driver's data; the equivalence test would catch a drift).
    """
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum(money("value")).cast("double").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "sum_value")
    )


_LIFETIME_STATE = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_cents", T.LongType()),
    T.StructField("last_seen_ns", T.LongType()),
])

_LIFETIME_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("last_seen", T.TimestampType()),
])


def _lifetime_fn(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user running lifetime profile.  State = (count, exact money
    cents, last event ns); each micro-batch folds its rows in and emits
    the updated row — the canonical custom stateful operator shape.

    Money is accumulated as integer cents (the input column is
    decimal(12,2) → Python Decimal through Arrow): float accumulation
    would be summation-order-dependent and drift from the oracle."""
    (user_id,) = key
    n, cents, last_ns = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(sum(pdf["value"]) * 100)
        batch_last = pdf["ts"].max()
        if pd.notna(batch_last):
            # integer nanoseconds: exact, unlike float epoch seconds
            last_ns = max(last_ns, pd.Timestamp(batch_last).value)
    state.update((n, cents, last_ns))
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "total_value": [cents / 100.0],
        "last_seen": [pd.Timestamp(last_ns)],
    })


def stream_user_lifetime_stats(events: DataFrame,
                               output_mode: str = "update") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user event count / value total / last-seen — the op Spark's
    built-in windows can't express (unbounded, per-key, incremental).

    ``output_mode``: "update" for sinks that upsert (memory/kafka);
    "append" when feeding the file sink (each micro-batch's emitted
    rows are appended; the latest row per key is the current state).
    """
    return (
        events.select("user_id", "ts", money("value").alias("value"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _lifetime_fn,
            outputStructType=_LIFETIME_OUT,
            stateStructType=_LIFETIME_STATE,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_events(events: DataFrame) -> DataFrame:
    """Streaming exact-once deduplication: drop re-deliveries of the
    same event_id arriving within the watermark.  State holds one key
    per event inside the watermark horizon and is evicted as the
    watermark advances — the at-least-once → exactly-once repair step
    in front of every downstream aggregate."""
    return (
        events.withWatermark("ts", WATERMARK)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "user_id", "event_type",
                money("value").alias("value"))
    )


def run_available_now(df: DataFrame, name: str, checkpoint: str,
                      output_mode: str = "complete") -> None:
    """Drain the whole backlog through the streaming engine into an
    in-memory table ``name`` (Trigger.AvailableNow), then stop.  The
    batch-equivalence harness: same plan, real incremental execution.
    """
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
