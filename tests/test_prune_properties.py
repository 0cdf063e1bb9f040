"""Property-based soundness of every pruning layer (hypothesis).

The invariant that matters: pruning may only ever KEEP too much —
a file (or row group, or partition) that contains one matching row
must never be skipped.  A false positive costs IO; a false negative
silently drops rows from results.  These properties drive the real
prune functions (`_file_survives`, `_partition_survives`, the bloom
builders/probes, and the hidden-partition filter derivation) against
randomly generated data + predicates and assert no-false-negative by
brute force.  Pure Python — no Spark session — so hypothesis can run
hundreds of cases per property.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    _bloom_bits_from_numpy,
    _bloom_encode,
    _bloom_maybe_contains,
    _derived_partition_filters,
    _file_survives,
    _gen_array,
    _partition_survives,
    _string_hash64_numpy,
)


def _matches(f, v) -> bool:
    """Row-level truth of one DataSource filter (what Spark re-applies
    after pruning)."""
    if v is None:
        return False
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, In):
        return v in f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    if isinstance(f, StringStartsWith):
        return isinstance(v, str) and v.startswith(f.value)
    raise AssertionError(f)


def _stats(rows):
    vals = [v for v in rows if v is not None]
    if not vals:
        return {}
    return {"x": {"min": min(vals), "max": max(vals)}}


_INT_FILTERS = st.one_of(
    st.builds(EqualTo, st.just(("x",)), st.integers(-50, 50)),
    st.builds(In, st.just(("x",)),
              st.lists(st.integers(-50, 50), min_size=1,
                       max_size=4).map(tuple)),
    st.builds(GreaterThan, st.just(("x",)), st.integers(-50, 50)),
    st.builds(GreaterThanOrEqual, st.just(("x",)),
              st.integers(-50, 50)),
    st.builds(LessThan, st.just(("x",)), st.integers(-50, 50)),
    st.builds(LessThanOrEqual, st.just(("x",)), st.integers(-50, 50)),
)

_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA1),
    max_size=8)

_STR_FILTERS = st.one_of(
    st.builds(EqualTo, st.just(("x",)), _TEXT),
    st.builds(GreaterThan, st.just(("x",)), _TEXT),
    st.builds(LessThanOrEqual, st.just(("x",)), _TEXT),
    st.builds(StringStartsWith, st.just(("x",)), _TEXT),
)


@settings(max_examples=300, deadline=None)
@given(rows=st.lists(st.one_of(st.none(), st.integers(-60, 60)),
                     min_size=1, max_size=20),
       flt=st.lists(_INT_FILTERS, min_size=1, max_size=3))
def test_int_stats_pruning_never_false_negative(rows, flt):
    if not _file_survives(_stats(rows), flt):
        for v in rows:
            assert not all(_matches(f, v) for f in flt), (rows, flt)


@settings(max_examples=300, deadline=None)
@given(rows=st.lists(st.one_of(st.none(), _TEXT), min_size=1,
                     max_size=20),
       flt=st.lists(_STR_FILTERS, min_size=1, max_size=3))
def test_string_stats_pruning_never_false_negative(rows, flt):
    if not _file_survives(_stats(rows), flt):
        for v in rows:
            assert not all(_matches(f, v) for f in flt), (rows, flt)


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(st.integers(-10**12, 10**12), min_size=1,
                     max_size=200),
       probe=st.integers(-10**12, 10**12))
def test_int_bloom_never_false_negative(vals, probe):
    enc = _bloom_encode(
        _bloom_bits_from_numpy(np.array(vals, dtype=np.int64)), "int")
    if probe in vals:
        assert _bloom_maybe_contains(enc, probe)
    # and the prune path: an excluded probe is genuinely absent
    if not _bloom_maybe_contains(enc, probe):
        assert probe not in vals


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(_TEXT.filter(bool), min_size=1, max_size=100),
       probe=_TEXT.filter(bool))
def test_string_bloom_never_false_negative(vals, probe):
    arr = pa.array(vals, type=pa.string())
    enc = _bloom_encode(
        _bloom_bits_from_numpy(_string_hash64_numpy(arr)), "str")
    if probe in vals:
        assert _bloom_maybe_contains(enc, probe)
    if not _bloom_maybe_contains(enc, probe):
        assert probe not in vals


_TS = st.datetimes(min_value=dt.datetime(1990, 1, 1),
                   max_value=dt.datetime(2039, 12, 31))

_GENS = st.sampled_from([
    {"name": "g", "src": "x", "transform": "date"},
    {"name": "g", "src": "x", "transform": "year"},
    {"name": "g", "src": "x", "transform": "month"},
    {"name": "g", "src": "x", "transform": "hour"},
])

_TS_OPS = st.sampled_from([GreaterThan, GreaterThanOrEqual, LessThan,
                           LessThanOrEqual, EqualTo])


@settings(max_examples=300, deadline=None)
@given(row=_TS, lit=_TS, gen=_GENS, op=_TS_OPS)
def test_hidden_partition_derivation_sound_for_timestamps(
        row, lit, gen, op):
    """If the DERIVED partition filter excludes a file whose partition
    value was computed by the WRITE-side transform from `row`, then
    `row` must not satisfy the original source predicate — the
    write-value / read-literal convention can never disagree into a
    false negative."""
    src_filter = op(("x",), lit)
    derived = _derived_partition_filters([src_filter], [gen])
    pv = _gen_array(gen, pa.array([row], pa.timestamp("us")))[0].as_py()
    if not _partition_survives({"g": pv}, derived):
        assert not _matches(src_filter, row), (row, lit, gen, op, pv)


@settings(max_examples=300, deadline=None)
@given(row=st.integers(-10**9, 10**9), lit=st.integers(-10**9, 10**9),
       n=st.integers(1, 16))
def test_hidden_bucket_derivation_sound(row, lit, n):
    gen = {"name": "g", "src": "x", "transform": "bucket", "n": n}
    src_filter = EqualTo(("x",), lit)
    derived = _derived_partition_filters([src_filter], [gen])
    pv = _gen_array(gen, pa.array([row], pa.int64()))[0].as_py()
    if not _partition_survives({"g": pv}, derived):
        assert row != lit


@settings(max_examples=300, deadline=None)
@given(row=_TEXT, lit=_TEXT, n=st.integers(1, 6),
       op=st.sampled_from([EqualTo, StringStartsWith]))
def test_hidden_truncate_derivation_sound(row, lit, n, op):
    gen = {"name": "g", "src": "x", "transform": "truncate", "n": n}
    src_filter = op(("x",), lit)
    derived = _derived_partition_filters([src_filter], [gen])
    pv = _gen_array(gen, pa.array([row], pa.string()))[0].as_py()
    if not _partition_survives({"g": pv}, derived):
        assert not _matches(src_filter, row), (row, lit, n, op, pv)
