"""Multimodal plumbing tests: stubbed decode contract, deterministic
fake paths, partitioning-independence of mapInPandas results, and a
pure-Python cross-check of the byte-stats decode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.multimodal import (
    byte_stats,
    decode_media,
    extract_features,
    frame_sample,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    df = synthetic_media(spark, sf_dir)
    df.persist()
    yield df
    df.unpersist()


def test_real_codec_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="not installed"):
        decode_media(media, codec="real")


def test_byte_stats_matches_python(media):
    sample = media.limit(20).collect()
    got = {r["media_id"]: r for r in
           byte_stats(media.limit(20)).collect()}
    for row in sample:
        a = np.frombuffer(bytes(row["payload"]), dtype=np.uint8)
        g = got[row["media_id"]]
        assert g["n_bytes"] == len(a)
        assert g["byte_mean"] == round(float(a.mean()), 6)
        assert g["byte_min"] == int(a.min())
        assert g["byte_max"] == int(a.max())


def test_features_deterministic_across_partitioning(media):
    f1 = {r["media_id"]: r["feature"]
          for r in extract_features(media, dim=16).collect()}
    f2 = {r["media_id"]: r["feature"]
          for r in extract_features(media.repartition(7), dim=16).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert all(-1.0 <= x < 1.0 for v in f1.values() for x in v)


def test_feature_value_construction(media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    digest = hashlib.md5(bytes(row["payload"]) + b"|0").digest()
    expect = (np.frombuffer(digest[:16], dtype=np.uint8)
              .astype(np.float32) / 128.0 - 1.0).tolist()
    got = extract_features(media.filter(F.col("media_id") == 0),
                           dim=16).collect()[0]["feature"]
    assert got == pytest.approx(expect)


def test_frame_sample_covers_first_and_last(media):
    rows = frame_sample(media, every_k=10).collect()
    assert rows, "no video rows"
    for r in rows:
        idx = r["frame_indices"]
        assert idx[0] == 0
        assert idx[-1] == r["n_frames"] - 1
        assert r["n_sampled"] == len(idx)
        assert all(0 <= i < r["n_frames"] for i in idx)
        # strictly increasing
        assert all(a < b for a, b in zip(idx, idx[1:]))


def test_metadata_only_profile_prunes_payload(spark, sf_dir):
    """The metadata profile must not read the payload column for the
    grouping — check the scan's ReadSchema excludes nothing needed and
    the plan contains no mapInPandas (pure JVM)."""
    from data_engineering_pipeline_project_cloud_spark.plans.media import (
        media_profile,
    )
    plan = media_profile(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_resize_media_matches_python_reference(spark, sf_dir):
    import numpy as np

    from data_engineering_pipeline_project_cloud_spark.multimodal import (
        resize_media,
        synthetic_media,
    )

    media = synthetic_media(spark, sf_dir)
    out = {r["media_id"]: r for r in resize_media(media).collect()}
    src = media.filter(media.modality.isin("image", "video")) \
        .select("media_id", "payload", "meta.width", "meta.height").collect()
    assert set(out) == {r["media_id"] for r in src}
    for r in src:
        arr = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        n, w, h = len(arr), r["width"], r["height"]
        m = max(w, h)
        nw, nh = (w, h) if m <= 64 else (w * 64 // m, h * 64 // m)
        k = max(1, nw)
        res = arr[(np.arange(k) * n) // k] if n > k else arr
        got = out[r["media_id"]]
        assert (got["new_width"], got["new_height"]) == (nw, nh)
        assert got["resized_n_bytes"] == len(res)
        assert got["resized_byte_sum"] == int(res.sum())
        # aspect ratio preserved within integer truncation: each dim
        # truncates by < 1, so the ratio drifts by < (1 + w/h) / nh
        if m > 64:
            assert abs(nw / nh - w / h) <= (1.0 + w / h) / nh + 1e-9


def test_resize_deterministic_across_partitioning(spark, sf_dir):
    """mapInPandas output must not depend on how rows land in Arrow
    batches — repartitioning the input cannot change any value."""
    from data_engineering_pipeline_project_cloud_spark.multimodal import (
        resize_media,
        synthetic_media,
    )

    media = synthetic_media(spark, sf_dir)
    a = sorted(map(tuple, resize_media(media).collect()))
    b = sorted(map(tuple, resize_media(media.repartition(7)).collect()))
    assert a == b


def test_cdc_chunks_reconstruct_and_bounds(spark, sf_dir):
    """Chunks tile each payload exactly (contiguous offsets, lengths
    sum to the blob), respect [min, max] bounds (only the final chunk
    may undershoot min), and the hash identifies the bytes."""
    import hashlib

    from data_engineering_pipeline_project_cloud_spark.multimodal import (
        cdc_chunks,
        synthetic_media,
    )
    from data_engineering_pipeline_project_cloud_spark.multimodal.media import (
        CDC_MAX_LEN,
        CDC_MIN_LEN,
    )

    media = synthetic_media(spark, sf_dir).limit(50)
    payloads = {r["media_id"]: bytes(r["payload"])
                for r in media.collect()}
    rows = cdc_chunks(media).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(payloads)
    for mid, chunks in by_media.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        pos = 0
        for i, c in enumerate(chunks):
            assert c["offset"] == pos
            assert c["length"] <= CDC_MAX_LEN
            if i < len(chunks) - 1:
                assert c["length"] >= CDC_MIN_LEN
            piece = payloads[mid][pos:pos + c["length"]]
            assert hashlib.md5(piece).hexdigest() == c["chunk_hash"]
            pos += c["length"]
        assert pos == len(payloads[mid])


def test_cdc_chunks_shift_invariance(spark):
    """THE content-defined property: inserting bytes near the start
    of a blob must leave most downstream chunk hashes intact
    (boundaries resynchronize on content), where fixed-size chunking
    would lose every block past the edit."""
    import random

    from data_engineering_pipeline_project_cloud_spark.multimodal import cdc_chunks

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(4096))
    mutated = b"INSERTED!" + base
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(mutated))],
        "media_id long, payload binary")
    rows = cdc_chunks(df).collect()
    h1 = [r["chunk_hash"] for r in rows if r["media_id"] == 1]
    h2 = [r["chunk_hash"] for r in rows if r["media_id"] == 2]
    shared = len(set(h1) & set(h2))
    assert shared >= 0.8 * len(h1), (shared, len(h1))
    # and the runs are deterministic
    again = cdc_chunks(df).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
