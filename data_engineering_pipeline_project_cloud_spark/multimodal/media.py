"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (extension mandate; the reference is tabular-only).

Pattern for 100 TB of media:
 - payload is an opaque BINARY column; Spark never interprets it —
   parquet stores it as byte arrays, scans prune it unless selected
   (profiles/filters that only touch metadata never read payload
   bytes — column pruning is the whole point of the typed-meta split).
 - per-item CPU work (decode, feature extraction) runs in
   ``mapInPandas``: Arrow-batched, one Python worker per core, no
   per-row serialization.  Batch size is bounded by
   ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
   large blobs doesn't materialize at once.
 - REAL codecs (PIL/ffmpeg/librosa) are not in this container: the
   decode step is STUBBED — ``decode_media(..., codec="real")`` raises
   NotImplementedError; ``codec="fake"`` is a deterministic
   byte-statistics decode so the Spark-side plumbing (schemas,
   batching, partitioning) is fully exercised and tested.

No media table ships in the testdata, so ``synthetic_media`` derives a
deterministic media catalog from ``documents`` (payload = UTF-8 bytes
of the text; metadata arithmetic on doc_id) — reproducible in ANSI SQL
for the oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import load_table

MODALITIES = ("image", "audio", "video")

MEDIA_META_TYPE = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media catalog derived from ``documents``:
    modality = doc_id mod 3, payload = UTF-8 bytes of text, metadata
    arithmetic on doc_id.  Stands in for a real
    ``spark.read.parquet('media/')`` with the same schema."""
    d = load_table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"))
    is_img = modality == "image"
    is_aud = modality == "audio"
    is_vid = modality == "video"
    meta = F.struct(
        F.when(is_img, F.lit("png")).when(is_aud, F.lit("wav"))
        .otherwise(F.lit("mp4")).alias("format"),
        F.when(is_img | is_vid, (F.lit(64) + F.pmod(F.col("doc_id"), F.lit(512)))
               .cast("int")).alias("width"),
        F.when(is_img | is_vid, (F.lit(64) + F.pmod(F.col("doc_id") * 7, F.lit(512)))
               .cast("int")).alias("height"),
        F.when(is_aud, F.lit(16000).cast("int")).alias("sample_rate"),
        F.when(is_vid, (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(240)))
               .cast("int")).alias("n_frames"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


_BYTE_STATS_SCHEMA = (
    "media_id long, modality string, n_bytes long, byte_sum long, "
    "byte_mean double, byte_min int, byte_max int"
)


def byte_stats(media: DataFrame) -> DataFrame:
    """The deterministic 'fake decode': per-item byte statistics via
    mapInPandas.  Exercises the exact execution shape a real decoder
    uses (Arrow batch in → numpy per item → small row out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "modality": pdf["modality"].values,
                "n_bytes": [len(a) for a in arrs],
                "byte_sum": [int(a.sum()) for a in arrs],
                "byte_mean": [round(float(a.mean()), 6) if len(a) else None
                              for a in arrs],
                "byte_min": [int(a.min()) if len(a) else None for a in arrs],
                "byte_max": [int(a.max()) if len(a) else None for a in arrs],
            })

    return media.select("media_id", "modality", "payload") \
        .mapInPandas(run, _BYTE_STATS_SCHEMA)


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode step.  ``codec='real'`` is the integration point for
    PIL/ffmpeg/librosa — NOT AVAILABLE in this environment (stub);
    ``codec='fake'`` routes to the deterministic byte-stats decode."""
    if codec == "real":
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg/librosa) are not installed in "
            "this environment; use codec='fake' for the deterministic "
            "byte-statistics decode with identical plumbing")
    if codec != "fake":
        raise ValueError(f"unknown codec mode {codec!r}")
    return byte_stats(media)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extractor: ``dim`` floats in [-1, 1)
    derived from chained md5 of the payload — the stand-in for a model
    forward pass, with the real pipeline shape (mapInPandas, payload
    in / fixed-width ``array<float>`` out)."""
    n_blocks = (dim + 15) // 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = b"".join(
                    hashlib.md5(bytes(p) + b"|%d" % i).digest()
                    for i in range(n_blocks))
                v = np.frombuffer(digest[:dim], dtype=np.uint8)
                feats.append((v.astype(np.float32) / 128.0 - 1.0).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].values,
                                "feature": feats})

    return media.select("media_id", "payload").mapInPandas(
        run, T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]))


_RESIZE_SCHEMA = (
    "media_id long, modality string, width long, height long, "
    "new_width long, new_height long, n_bytes long, "
    "resized_n_bytes long, resized_byte_sum long"
)


def resize_media(media: DataFrame, target_max_dim: int = 64) -> DataFrame:
    """Resize step for image/video rows: aspect-preserving integer
    target dimensions (``max(w,h) → target_max_dim``, integer-div so
    the math is bit-identical cross-engine) plus a deterministic
    nearest-neighbor byte resample of the payload down to one
    ``new_width``-byte scanline — the stand-in for a real thumbnail
    pass (PIL/ffmpeg NOT in this environment; ``decode_media`` holds
    the declared ``codec='real'`` stub) with the real pipeline shape:
    Arrow batch in via mapInPandas, numpy fancy-indexing per item,
    integer-exact summary out.  Audio rows are excluded (no spatial
    dims); selection happens BEFORE payload bytes move."""

    t = target_max_dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "modality", "width", "height", "new_width",
                "new_height", "n_bytes", "resized_n_bytes",
                "resized_byte_sum")}
            for mid, mod, p, w, h in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"],
                    pdf["width"], pdf["height"]):
                arr = np.frombuffer(p, dtype=np.uint8)
                n = len(arr)
                m = max(int(w), int(h))
                if m <= t:
                    nw, nh = int(w), int(h)
                else:
                    nw, nh = int(w) * t // m, int(h) * t // m
                k = max(1, nw)
                res = arr[(np.arange(k) * n) // k] if n > k else arr
                out["media_id"].append(int(mid))
                out["modality"].append(mod)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["new_width"].append(nw)
                out["new_height"].append(nh)
                out["n_bytes"].append(n)
                out["resized_n_bytes"].append(len(res))
                out["resized_byte_sum"].append(int(res.sum()))
            yield pd.DataFrame(out)

    flat = (media.filter(F.col("modality").isin("image", "video"))
            .select("media_id", "modality", "payload",
                    F.col("meta.width").alias("width"),
                    F.col("meta.height").alias("height")))
    return flat.mapInPandas(run, _RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling PLAN for video rows: the frame indices to decode
    (every k-th frame plus the last).  Pure column arithmetic — the
    expensive decode of chosen frames would be a mapInPandas over
    (payload, frame_idx) after an explode; selection itself never
    touches payload bytes."""
    vid = media.filter(F.col("modality") == "video")
    n = F.col("meta.n_frames")
    idx = F.sequence(F.lit(0), n - 1, F.lit(every_k))
    return vid.select(
        "media_id", n.alias("n_frames"),
        F.when(F.array_contains(idx, n - 1), idx)
        .otherwise(F.concat(idx, F.array(n - 1))).alias("frame_indices"),
    ).withColumn("n_sampled", F.size("frame_indices").cast("long"))


# --- content-defined chunking (binary dedup) --------------------------

#: Gear table: 256 pseudo-random 64-bit words derived from the portable
#: md5 fold of the byte value — deterministic everywhere, no RNG state.
def _gear_table() -> "np.ndarray":
    import hashlib

    out = np.empty(256, dtype=np.uint64)
    for b in range(256):
        out[b] = int.from_bytes(
            hashlib.md5(f"gear{b}".encode()).digest()[:8], "big")
    return out


CDC_AVG_BITS = 6       # boundary when the low 6 hash bits are zero
CDC_MIN_LEN = 16       # ≈ 2^bits/4: skip degenerate tiny chunks
CDC_MAX_LEN = 256      # ≈ 4×average: force a split (worst-case bound)

_CDC_SCHEMA = ("media_id long, chunk_idx int, offset long, length long, "
               "chunk_hash string")


def cdc_chunks(media: DataFrame, avg_bits: int = CDC_AVG_BITS,
               min_len: int = CDC_MIN_LEN,
               max_len: int = CDC_MAX_LEN) -> DataFrame:
    """CONTENT-DEFINED CHUNKING (the Gear/FastCDC family: Xia et al.,
    USENIX ATC'16): split each binary payload at positions where a
    rolling Gear hash's low ``avg_bits`` bits are zero — expected
    chunk ≈ 2^avg_bits bytes, bounded by [min_len, max_len].  Because
    the hash window is the last 64 bytes of CONTENT, an insertion near
    the start of a blob only perturbs boundaries locally and later
    chunks re-synchronize — the property that makes block-level dedup
    of mutated/re-encoded blobs work, where fixed-size chunking loses
    every block past the edit (shift-invariance pytest-asserted).

    Execution shape: Arrow-batched ``mapInPandas``; the rolling hash
    ``h_i = (h_{i-1}<<1) + gear[b_i]`` telescopes to a 64-tap windowed
    sum, computed as 64 vectorized shifted adds per blob (O(64·n)
    numpy, no per-byte Python) — only the sparse candidate-boundary
    list (≈ n/2^avg_bits positions) is walked in Python to enforce the
    min/max bounds.  Chunk identity is the md5 hex of the chunk bytes:
    equal chunks dedup across blobs by a plain groupBy downstream."""
    gear = _gear_table()
    mask = np.uint64((1 << avg_bits) - 1)

    def boundaries(buf: np.ndarray) -> list[int]:
        n = len(buf)
        g = gear[buf]
        h = np.zeros(n, dtype=np.uint64)
        for k in range(min(64, n)):
            h[k:] += g[:n - k] << np.uint64(k)
        cand = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER byte i
        cuts, last = [], 0
        for c in cand:
            if c - last < min_len:
                continue
            while c - last > max_len:
                cuts.append(last + max_len)
                last += max_len
            if c - last >= min_len:
                cuts.append(int(c))
                last = int(c)
        while n - last > max_len:
            cuts.append(last + max_len)
            last += max_len
        if last < n:
            cuts.append(n)
        return cuts

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"media_id": [], "chunk_idx": [], "offset": [],
                   "length": [], "chunk_hash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                last = 0
                for i, cut in enumerate(boundaries(buf)):
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(i)
                    out["offset"].append(last)
                    out["length"].append(cut - last)
                    out["chunk_hash"].append(
                        hashlib.md5(payload[last:cut]).hexdigest())
                    last = cut
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, _CDC_SCHEMA)
