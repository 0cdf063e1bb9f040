"""Multimodal (binary) column operators."""

from .media import (  # noqa: F401
    MEDIA_META_TYPE,
    byte_stats,
    cdc_chunks,
    decode_media,
    extract_features,
    frame_sample,
    resize_media,
    synthetic_media,
)
