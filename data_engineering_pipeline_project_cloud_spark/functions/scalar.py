"""Scalar function library (SURVEY.md §2.5, F1-F7).

Every expression here is a built-in ``pyspark.sql.functions``
composition — JVM-side, inside whole-stage codegen.  No Python UDFs:
the reference's entire scalar surface (normalize / cast / null-handling
/ conditional / date-arithmetic, ``scripts/transform-complex-full.py``)
is expressible natively, and at 100 TB the hot path must stay in
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Exact-decimal money type, matching the reference's ``numeric(12,2)``
#: casts (``scripts/transform-complex-full.py:63-64,70,77``).  Decimal
#: aggregation is order-independent — bitwise-stable across shuffles,
#: unlike double sums.
MONEY = "decimal(12,2)"


def norm_lower(c: Column | str) -> Column:
    """``LOWER(TRIM(x))`` — status/category/payment-type normalization
    (``scripts/transform-complex-full.py:24,51-52,161``)."""
    return F.lower(F.trim(F.col(c) if isinstance(c, str) else c))


def norm_upper(c: Column | str) -> Column:
    """``UPPER(TRIM(x))`` — city/state join-key normalization
    (``scripts/transform-complex-full.py:35-37,43-45,95-97``).
    Normalizing *before* the join keeps it an equi-join, hence
    hash-joinable (SURVEY.md §4.1)."""
    return F.upper(F.trim(F.col(c) if isinstance(c, str) else c))


def money(c: Column | str) -> Column:
    """``CAST(x AS numeric(12,2))`` (``scripts/transform-complex-full.py:63-64``)."""
    return (F.col(c) if isinstance(c, str) else c).cast(MONEY)


def nullif_zero(c: Column | str) -> Column:
    """``NULLIF(x, 0)`` (``scripts/transform-complex-full.py:71``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.nullif(col, F.lit(0))


def epoch_days_between(later: Column | str, earlier: Column | str) -> Column:
    """``EXTRACT(EPOCH FROM (ts1 - ts2)) / 86400.0`` — fractional days
    (``scripts/transform-complex-full.py:169,175,182``).

    NOT ``datediff`` (calendar days).  Uses unix seconds so results are
    a double day-fraction, matching the reference's epoch semantics.
    """
    l = F.col(later) if isinstance(later, str) else later
    e = F.col(earlier) if isinstance(earlier, str) else earlier
    return (epoch_seconds(l) - epoch_seconds(e)) / F.lit(86400.0)


def epoch_seconds(c: Column | str) -> Column:
    """Fractional epoch seconds for any timestamp flavor.

    ``timestamp → double`` preserves sub-second precision where
    ``unix_timestamp`` truncates, but Spark 4.1 forbids that cast on
    TIMESTAMP_NTZ.  Routing through TIMESTAMP_LTZ accepts both flavors;
    the NTZ→LTZ conversion uses the session time zone, which the engine
    pins to UTC (session.py / plans.registry._scope), so the value is
    the naive-UTC epoch — exactly SQL ``EPOCH(ts)``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp_ltz").cast("double")


def portable_hash64(c: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit hash computable identically in Spark and
    ANSI SQL engines: ``conv(substr(md5(x), 1, 15), 16, 10)``.

    Used by the dedup/sketch operators (MinHash, SimHash, fingerprints)
    so their outputs are oracle-checkable cross-engine.  md5 is fine
    here: these are content sketches, not security primitives.  60 bits
    keeps the value inside a signed BIGINT in every engine.
    """
    col = F.col(c) if isinstance(c, str) else c
    if salt:
        col = F.concat(F.lit(salt), col)
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
