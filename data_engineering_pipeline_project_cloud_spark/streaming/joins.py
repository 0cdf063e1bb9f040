"""Stream-stream joins (Structured Streaming's hardest operator).

Both sides are unbounded; the join is only computable because the
time-range condition + watermarks bound how much of each side must be
retained in state: a click can only ever match purchases up to 1 hour
later, so once the watermark passes click_ts + 1 h + delay the click
row is evicted.  Without BOTH watermarks and a range on the event
times, state grows forever — Spark rejects such joins in append mode.

Batch face (identical semantics, equivalence-tested):
``plans/temporal.py:click_purchase_correlation``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import epoch_seconds

WATERMARK = "2 hours"


def stream_click_purchase_join(events: DataFrame) -> DataFrame:
    """Inner stream-stream join: purchases within 1 hour after a click
    by the same user.  State per side is bounded by
    watermark + range (≈3 h of events per user key)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", WATERMARK)
    )
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


def stream_click_purchase_left_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream join — the semantically hardest join
    mode Structured Streaming supports.  Matched pairs emit as soon as
    both sides arrive (inner-join behavior); an UNMATCHED click emits
    EXACTLY ONCE with NULL purchase columns, but only after the
    watermark passes the end of its match window — the engine must be
    able to prove no future purchase can match before releasing the
    NULL row (Spark SS programming guide, outer joins with watermark).
    A consequence every consumer must know: unmatched rows inside the
    final watermark gap are withheld until later input advances the
    watermark — tested by driving two batches through a checkpoint in
    tests/test_streaming.py.  State stays bounded by watermark + the
    1-hour range, same as the inner form."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", WATERMARK)
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts")
               <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
            "leftOuter")
        .select("click_id", "user_id", "click_ts", "purchase_id",
                "purchase_ts")
    )
