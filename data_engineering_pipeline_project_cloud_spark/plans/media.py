"""Registry queries for the multimodal surface (binary payload +
typed metadata over a deterministic synthetic catalog — see
multimodal/media.py for why the decode itself is stubbed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import (
    byte_stats,
    extract_features,
    frame_sample,
    synthetic_media,
)

FRAME_EVERY_K = 10
FEATURE_DIM = 16


def media_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only profile: touches modality + payload length, so at
    scale the parquet scan reads two columns, never the blob contents
    of unrelated modalities."""
    m = synthetic_media(spark, sf_dir)
    return (
        m.groupBy("modality")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
             F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
             (F.sum(F.octet_length("payload")).cast("double")
              / F.count(F.lit(1))).alias("avg_bytes"),
             # width/sample_rate exist only for some modalities; the
             # all-null groups are presented as -1 (canonical null-free
             # output rule, plans/parity.py docstring)
             F.coalesce(F.max("meta.width"), F.lit(-1)).cast("long")
             .alias("max_width"),
             F.coalesce(F.min("meta.sample_rate"), F.lit(-1)).cast("long")
             .alias("sample_rate"))
    )


def media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decode via mapInPandas (no oracle — DuckDB has no per-byte
    blob aggregation; invariants pytest-checked against pure Python)."""
    return byte_stats(synthetic_media(spark, sf_dir))


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake embedding extraction (rows-only check;
    determinism and shape pytest-asserted)."""
    return extract_features(synthetic_media(spark, sf_dir), dim=FEATURE_DIM)


def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = frame_sample(synthetic_media(spark, sf_dir), every_k=FRAME_EVERY_K)
    # frame index list rendered as a comma string: array columns
    # serialize differently across harness frames (list vs ndarray),
    # so the canonical face is scalar-only
    return out.select(
        "media_id", "n_frames",
        F.concat_ws(",", F.col("frame_indices").cast("array<string>"))
        .alias("frame_indices"),
        "n_sampled")


_MODALITY_SQL = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"

ORACLE_SQL: dict[str, str] = {
    "media_profile": f"""
        WITH media AS (
            SELECT doc_id AS media_id,
                   {_MODALITY_SQL} AS modality,
                   encode(text) AS payload,
                   CASE WHEN doc_id % 3 IN (0, 2)
                        THEN CAST(64 + doc_id % 512 AS INT) END AS width,
                   CASE WHEN doc_id % 3 = 1 THEN 16000 END AS sample_rate
            FROM documents
        )
        SELECT modality,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
               CAST(SUM(octet_length(payload)) AS DOUBLE) / COUNT(*) AS avg_bytes,
               CAST(COALESCE(MAX(width), -1) AS BIGINT) AS max_width,
               CAST(COALESCE(MIN(sample_rate), -1) AS BIGINT) AS sample_rate
        FROM media GROUP BY modality
    """,
    "media_frame_plan": f"""
        WITH vid AS (
            SELECT doc_id AS media_id,
                   CAST(1 + doc_id % 240 AS INT) AS n_frames
            FROM documents
            WHERE {_MODALITY_SQL} = 'video'
        ),
        sampled AS (
            SELECT media_id, n_frames,
                   generate_series(0, n_frames - 1, {FRAME_EVERY_K}) AS idx
            FROM vid
        )
        SELECT media_id, n_frames,
               array_to_string(
                   CASE WHEN list_contains(idx, n_frames - 1) THEN idx
                        ELSE list_concat(idx, [n_frames - 1]) END,
                   ',') AS frame_indices,
               CAST(len(CASE WHEN list_contains(idx, n_frames - 1) THEN idx
                    ELSE list_concat(idx, [n_frames - 1]) END) AS BIGINT)
                   AS n_sampled
        FROM sampled
    """,
}

QUERIES = {
    "media_profile": media_profile,
    "media_byte_stats": media_byte_stats,
    "media_features": media_features,
    "media_frame_plan": media_frame_plan,
}
