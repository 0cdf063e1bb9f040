"""Streaming document pipeline: the LLM-data operators composed with
Structured Streaming — a continuously-arriving corpus filtered and
profiled incrementally.

Stateless map-side ops (quality scoring, scrubbing, token counting)
attach to a stream unchanged: the SAME column expressions from
``operators/textstats.py`` run per micro-batch with no state, no
watermark, append output — at ingestion scale this is the shape of a
pre-training data firehose filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import textstats as tx


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir))


def stream_quality_filter(docs: DataFrame,
                          min_quality: float = 0.7) -> DataFrame:
    """Keep documents whose composite quality clears the bar —
    stateless, append-mode, exactly the batch operator on a stream."""
    scored = tx.quality_score(docs)
    return scored.filter(scored["quality"] >= min_quality)
