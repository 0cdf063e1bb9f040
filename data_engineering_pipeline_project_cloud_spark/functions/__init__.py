from .scalar import (
    MONEY,
    epoch_days_between,
    epoch_seconds,
    money,
    norm_lower,
    norm_upper,
    nullif_zero,
    portable_hash64,
)

__all__ = [
    "MONEY",
    "epoch_days_between",
    "epoch_seconds",
    "money",
    "norm_lower",
    "norm_upper",
    "nullif_zero",
    "portable_hash64",
]
