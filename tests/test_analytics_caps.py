"""Round-5 scale guards: the co-supply projection hub cap
(plans/analytics.py:_cosupply_pairs), PPJoin positional/length filters
(operators/similarity.py:_ppjoin_candidates), and the self-defending
interval-routing fallback (operators/intervals.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_cosupply_hub_part_capped(spark):
    """A hub part above the degree cap is EXCLUDED from the co-supply
    projection before pairing — its deg²/2 pair fan-out never
    materializes; normal parts pair as before."""
    from data_engineering_pipeline_project_cloud_spark.plans.analytics import (
        _cosupply_pairs,
    )

    rows = [(0, s) for s in range(50)] \
        + [(1, 100), (1, 101), (1, 102)] \
        + [(2, 101), (2, 200)]
    ps = spark.createDataFrame(rows, "p long, s long")
    got = {(r["u"], r["v"])
           for r in _cosupply_pairs(ps, max_part_deg=10).collect()}
    assert got == {(100, 101), (100, 102), (101, 102), (101, 200)}
    # with the cap above the hub's degree, the hub contributes its
    # full 50·49/2 pairs — the cap is what bounds the fan-out
    assert _cosupply_pairs(ps, max_part_deg=64).count() == 4 + 50 * 49 // 2


def test_triangle_face_unchanged_by_cap(spark, sf_dir):
    """The registry face's cap (256) sits far above the test data's max
    part degree, so the capped projection equals the uncapped one —
    the green driver evidence stays valid."""
    from data_engineering_pipeline_project_cloud_spark.plans.analytics import (
        TRI_MAX_PART_DEG,
        _cosupply_pairs,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    ps = (load_table(spark, sf_dir, "lineitem")
          .select(F.col("l_partkey").alias("p"),
                  F.col("l_suppkey").cast("long").alias("s"))
          .distinct())
    max_deg = (ps.groupBy("p").count().agg(F.max("count")).collect()[0][0])
    assert max_deg <= TRI_MAX_PART_DEG
    assert (_cosupply_pairs(ps).count()
            == _cosupply_pairs(ps, max_part_deg=10**9).count())


def _prefix_frame(spark, rows):
    return spark.createDataFrame(rows, "s string, tok string, pos long,"
                                       " n long")


def test_ppjoin_length_filter_prunes_candidates(spark):
    """Pairs whose sizes violate |B| ≥ t·|A| are pruned at candidate
    time; the surviving pair set is exactly the length-feasible one."""
    from data_engineering_pipeline_project_cloud_spark.operators.similarity import (
        _ppjoin_candidates,
    )

    prefix = _prefix_frame(spark, [
        ("A", "x", 1, 100), ("B", "x", 1, 2), ("C", "x", 1, 90)])
    loose = {(r["a"], r["b"]) for r in _ppjoin_candidates(
        prefix, 0.5, pos_len_filters=False).collect()}
    tight = {(r["a"], r["b"]) for r in _ppjoin_candidates(
        prefix, 0.5).collect()}
    assert loose == {("A", "B"), ("A", "C"), ("B", "C")}
    assert tight == {("A", "C")}


def test_ppjoin_positional_filter_prunes_candidates(spark):
    """A shared token too DEEP in both prefixes cannot reach the
    required intersection — the positional bound prunes the pair."""
    from data_engineering_pipeline_project_cloud_spark.operators.similarity import (
        _ppjoin_candidates,
    )

    # ub = 1 + min(100-60, 100-55) = 41 < t/(1+t)·200 ≈ 66.7 → pruned
    deep = _prefix_frame(spark, [
        ("D", "y", 60, 100), ("E", "y", 55, 100)])
    assert _ppjoin_candidates(deep, 0.5, pos_len_filters=False).count() == 1
    assert _ppjoin_candidates(deep, 0.5).count() == 0
    # an early shared token with the same sizes survives
    early = _prefix_frame(spark, [
        ("D", "y", 1, 100), ("E", "y", 1, 100)])
    assert _ppjoin_candidates(early, 0.5).count() == 1


def test_ppjoin_filters_shrink_candidates_on_skew(spark):
    """On a skewed-size corpus the filtered candidate set is strictly
    smaller while the verified output is identical (the filters are
    necessary conditions of J ≥ t)."""
    from data_engineering_pipeline_project_cloud_spark.operators.similarity import (
        _ppjoin_candidates,
        _ranked_prefix,
        prefix_filter_set_join,
    )

    # a rare-ish token family shared between one giant set and many
    # tiny sets: every (giant, tiny) pair is length-infeasible at
    # t=0.5 but still shares a prefix token
    rows = [(0, t) for t in range(40)]                    # giant, n=40
    rows += [(i, 0) for i in range(1, 15)]                # tiny {0, 900+i}
    rows += [(i, 900 + i) for i in range(1, 15)]
    df = spark.createDataFrame(rows, "sid long, tok long")
    _, _, prefix = _ranked_prefix(df, "sid", "tok", 0.5)
    n_loose = _ppjoin_candidates(prefix, 0.5,
                                 pos_len_filters=False).count()
    n_tight = _ppjoin_candidates(prefix, 0.5).count()
    assert n_tight < n_loose
    out = {(r["a"], r["b"]) for r in prefix_filter_set_join(
        df, "sid", "tok", 0.5).collect()}
    # brute force over the fixture
    sets = {0: set(range(40))}
    for i in range(1, 15):
        sets[i] = {0, 900 + i}
    want = set()
    ids = sorted(sets)
    for ix, a in enumerate(ids):
        for b in ids[ix + 1:]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                want.add((a, b))
    assert out == want


def test_interval_long_heavy_input_falls_back_without_broadcast(spark):
    """When long intervals are the NORM (count above
    max_broadcast_rows), the operator must re-bin coarsely instead of
    broadcasting a big side: same result set, no
    BroadcastNestedLoopJoin in the plan."""
    from data_engineering_pipeline_project_cloud_spark.operators.intervals import (
        interval_overlap_join,
    )

    base = dt.date(2020, 1, 1)
    rows = [(i, base + dt.timedelta(days=i),
             base + dt.timedelta(days=700 + 3 * i)) for i in range(25)]
    adf = spark.createDataFrame(rows, "id long, s date, e date")
    bdf = spark.createDataFrame(
        [(100 + i, s, e) for i, s, e in rows], "id long, s date, e date")

    want = {(r["a_id"], r["b_id"], r["overlap_days"])
            for r in interval_overlap_join(
                adf, bdf, "id", "s", "e", "id", "s", "e",
                bin_days=7, max_bins=None).collect()}
    guarded = interval_overlap_join(
        adf, bdf, "id", "s", "e", "id", "s", "e",
        bin_days=7, max_bins=4, max_broadcast_rows=5)
    got = {(r["a_id"], r["b_id"], r["overlap_days"])
           for r in guarded.collect()}
    assert got == want
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
