"""Registry queries for the multimodal surface (binary payload +
typed metadata over a deterministic synthetic catalog — see
multimodal/media.py for why the decode itself is stubbed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import (
    byte_stats,
    cdc_chunks,
    extract_features,
    frame_sample,
    resize_media,
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
    """Fake-decode via mapInPandas.  The driver face keeps only the
    integer-exact statistics (sum/min/max/count) so the oracle — which
    re-derives every payload byte in SQL from ``hex(encode(text))`` —
    compares bit-portable BIGINTs; ``byte_mean`` (float rounding) stays
    on the operator and is pytest-checked against pure Python."""
    out = byte_stats(synthetic_media(spark, sf_dir))
    return out.select(
        "media_id", "modality", "n_bytes", "byte_sum",
        F.coalesce(F.col("byte_min"), F.lit(-1)).cast("long")
        .alias("byte_min"),
        F.coalesce(F.col("byte_max"), F.lit(-1)).cast("long")
        .alias("byte_max"))


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake embedding extraction.  Arrays serialize
    differently across harness frames (list vs ndarray), so the driver
    face pins the float vector through invertible integer checksums:
    each feature is ``byte/128 - 1`` with byte in 0..255, so
    ``round((x+1)*128)`` recovers the md5 byte exactly (float32 and
    float64 both represent it exactly), and the plain + position-
    weighted sums pin both the multiset and the order of the vector.
    The oracle recomputes the same bytes from ``md5(text || '|0')``."""
    out = extract_features(synthetic_media(spark, sf_dir), dim=FEATURE_DIM)
    byte_of = lambda x: F.round((x + F.lit(1.0)) * 128).cast("long")  # noqa: E731
    return out.select(
        "media_id",
        F.size("feature").cast("long").alias("n_dims"),
        F.aggregate(F.transform("feature", byte_of),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("feature_byte_sum"),
        F.aggregate(
            F.transform("feature",
                        lambda x, i: (i.cast("long") + 1) * byte_of(x)),
            F.lit(0).cast("long"),
            lambda a, x: a + x).alias("feature_byte_wsum"))


RESIZE_MAX_DIM = 64


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/resize pass over image+video rows
    (multimodal/media.py:resize_media): aspect-preserving integer
    target dims + deterministic nearest-neighbor byte resample via
    mapInPandas.  All output columns are integer-exact, so the DuckDB
    oracle re-derives the resample from the hex payload rendering."""
    return resize_media(synthetic_media(spark, sf_dir),
                        target_max_dim=RESIZE_MAX_DIM)


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

#: Parse hex-pair ``i`` (0-based) of hex string ``h`` into its byte
#: value — DuckDB has no blob-to-byte-array primitive, so the oracle
#: re-derives payload bytes positionally from the hex rendering.
_HEXDIGITS = "0123456789ABCDEF"


def _BYTE_AT(bi: str) -> str:
    """Byte value at 0-based byte index expression ``bi`` of hex
    rendering ``h`` (1-based inclusive DuckDB slicing)."""
    return (f"16 * (strpos('{_HEXDIGITS}', h[2*({bi})+1:2*({bi})+1]) - 1)"
            f" + (strpos('{_HEXDIGITS}', h[2*({bi})+2:2*({bi})+2]) - 1)")


def _HEXBYTE(h: str, digits: str) -> str:
    return (f"16 * (strpos('{digits}', {h}[2*i+1:2*i+1]) - 1)"
            f" + (strpos('{digits}', {h}[2*i+2:2*i+2]) - 1)")


ORACLE_SQL: dict[str, str] = {
    "media_byte_stats": f"""
        WITH m AS (
            SELECT doc_id AS media_id,
                   {_MODALITY_SQL} AS modality,
                   hex(encode(text)) AS h
            FROM documents
        ),
        b AS (
            SELECT media_id, modality,
                   list_transform(
                       range(CAST(length(h) / 2 AS INT)),
                       i -> {_HEXBYTE('h', '0123456789ABCDEF')}) AS bytes
            FROM m
        )
        SELECT media_id, modality,
               CAST(len(bytes) AS BIGINT) AS n_bytes,
               CAST(COALESCE(list_sum(bytes), 0) AS BIGINT) AS byte_sum,
               CAST(COALESCE(list_min(bytes), -1) AS BIGINT) AS byte_min,
               CAST(COALESCE(list_max(bytes), -1) AS BIGINT) AS byte_max
        FROM b
    """,
    # the fake extractor is md5(payload || '|0') bytes scaled to
    # [-1, 1); text is the payload's exact UTF-8 source, so DuckDB's
    # VARCHAR md5 hashes identical bytes
    "media_features": f"""
        WITH f AS (
            SELECT doc_id AS media_id, md5(text || '|0') AS h
            FROM documents
        ),
        b AS (
            SELECT media_id,
                   list_transform(
                       range({FEATURE_DIM}),
                       i -> {_HEXBYTE('h', '0123456789abcdef')}) AS bytes
            FROM f
        )
        SELECT media_id,
               CAST({FEATURE_DIM} AS BIGINT) AS n_dims,
               CAST(list_sum(bytes) AS BIGINT) AS feature_byte_sum,
               CAST(list_sum(list_transform(
                   range({FEATURE_DIM}),
                   i -> (i + 1) * bytes[i + 1])) AS BIGINT)
                   AS feature_byte_wsum
        FROM b
    """,
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
    "media_resize": f"""
        WITH m AS (
            SELECT doc_id AS media_id,
                   {_MODALITY_SQL} AS modality,
                   CAST(64 + doc_id % 512 AS BIGINT) AS width,
                   CAST(64 + (doc_id * 7) % 512 AS BIGINT) AS height,
                   hex(encode(text)) AS h
            FROM documents
            WHERE doc_id % 3 <> 1
        ),
        d AS (
            SELECT media_id, modality, width, height, h,
                   length(h) // 2 AS n,
                   CASE WHEN greatest(width, height) <= {RESIZE_MAX_DIM}
                        THEN width
                        ELSE width * {RESIZE_MAX_DIM}
                             // greatest(width, height)
                   END AS new_width,
                   CASE WHEN greatest(width, height) <= {RESIZE_MAX_DIM}
                        THEN height
                        ELSE height * {RESIZE_MAX_DIM}
                             // greatest(width, height)
                   END AS new_height
            FROM m
        ),
        r AS (SELECT *, greatest(1, new_width) AS k FROM d)
        SELECT media_id, modality, width, height, new_width, new_height,
               CAST(n AS BIGINT) AS n_bytes,
               CAST(CASE WHEN n > k THEN k ELSE n END AS BIGINT)
                   AS resized_n_bytes,
               CAST(CASE WHEN n > k THEN
                   list_sum(list_transform(range(k),
                       j -> {_BYTE_AT('(j*n)//k')}))
               ELSE
                   list_sum(list_transform(range(n),
                       j -> {_BYTE_AT('j')}))
               END AS BIGINT) AS resized_byte_sum
        FROM r
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

def media_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking of the binary payloads
    (multimodal/media.py:cdc_chunks — Gear/FastCDC family): each blob
    splits at content-derived boundaries into [16, 256]-byte chunks
    identified by md5, the block-level-dedup primitive for mutated or
    re-encoded media.  Rows-only by design (a 64-tap rolling hash is
    not ANSI-SQL-expressible); determinism, exact reconstruction,
    bound enforcement, insertion shift-invariance and cross-blob chunk
    sharing are pytest-asserted (tests/test_multimodal.py)."""
    return cdc_chunks(synthetic_media(spark, sf_dir))


QUERIES = {
    "media_profile": media_profile,
    "media_cdc_chunks": media_cdc_chunks,
    "media_byte_stats": media_byte_stats,
    "media_features": media_features,
    "media_frame_plan": media_frame_plan,
    "media_resize": media_resize,
}
