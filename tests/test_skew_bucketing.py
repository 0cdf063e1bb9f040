"""Skew-mitigation and shuffle-co-location operators: salted join is
semantically identical to a plain join; bucketed tables join with no
Exchange in the physical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.operators.skew import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.testing import diff_results


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_salted_join_matches_plain_inner(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name")
    plain = orders.join(cust, "custkey", "inner")
    salted = salted_join(orders, cust, "custkey", salt_buckets=4)
    problems = diff_results(salted.columns, _rows(salted),
                            plain.columns, _rows(plain))
    assert not problems, "; ".join(problems)


def test_salted_join_matches_plain_left(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "orphan")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", salt_buckets=3, how="left")
    problems = diff_results(salted.columns, _rows(salted),
                            plain.columns, _rows(plain))
    assert not problems, "; ".join(problems)
    with pytest.raises(ValueError, match="does not support"):
        salted_join(big, small, "k", how="full")


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8,
                   str(tmp_path / "orders_b"))
    write_bucketed(li, "t_items_b", "o_orderkey", 8,
                   str(tmp_path / "items_b"))
    # force the big-big strategy (broadcast would bypass bucketing at
    # this test scale; at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_orders_b", "t_items_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # co-located buckets: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        expected = orders.join(li, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_zorder_key_matches_reference_interleave(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.skew import (
        zorder_key,
    )

    def ref(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = {(r["a"], r["b"]): r["z"] for r in
           df.select("a", "b", zorder_key(F.col("a"), F.col("b"))
                     .alias("z")).collect()}
    for a, b in cases:
        assert got[(a, b)] == ref(a, b), (a, b)


def test_cms_never_undercounts_and_merges(spark, sf_dir):
    """CMS invariants: every estimate >= the true count (and equals it
    for most keys at this load factor), and the sketch of a union
    equals the elementwise merge of the parts' sketches."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"))
    sketch = cms_build(ev, "user_id")
    est = {r["user_id"]: r["est_count"]
           for r in cms_estimate(ev, sketch, "user_id").collect()}
    exact = {r["user_id"]: r["n"]
             for r in ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert est.keys() == exact.keys()
    assert all(est[k] >= exact[k] for k in exact)
    # load factor |keys| << width: the large majority must be exact
    exact_hits = sum(1 for k in exact if est[k] == exact[k])
    assert exact_hits >= 0.9 * len(exact)

    # mergeability: sketch(a ∪ b) == merge(sketch(a), sketch(b))
    a = ev.filter(F.col("user_id") % 2 == 0)
    b = ev.filter(F.col("user_id") % 2 != 0)
    merged = cms_merge(cms_build(a, "user_id"), cms_build(b, "user_id"))
    whole = {(r["d"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    got = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_cms_unseen_keys_estimate_zero_ish(spark, sf_dir):
    """Keys never inserted must return an estimate (0, or a small
    collision overcount) — not drop out of the result."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"))
    sketch = cms_build(ev, "user_id")
    unseen = spark.range(900_000, 900_050).select(
        F.col("id").alias("user_id"))
    est = {r["user_id"]: r["est_count"]
           for r in cms_estimate(unseen, sketch, "user_id").collect()}
    assert len(est) == 50  # every queried key answered
    assert all(v >= 0 for v in est.values())
    assert sum(1 for v in est.values() if v == 0) >= 40  # mostly exact 0
