"""Round-5 algorithm families: exact heavy hitters via Misra–Gries
candidates (operators/frequent.py), vocabulary-pruned rewrite
(operators/textstats.py:prune_rare_tokens), point-in-time SCD2 join
(plans/temporal.py:events_scd2_status), and k-core peeling
(plans/analytics.py:kcore_part_supplier).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_misra_gries_candidates_complete_and_bounded(spark):
    """On a skewed stream with cardinality far above the capacity: the
    summary size stays ≤ partitions·capacity, every estimate
    underestimates, and all keys above N/(capacity+1) are present
    (the MG completeness bound the exact pass relies on)."""
    from data_engineering_pipeline_project_cloud_spark.operators.frequent import (
        misra_gries_candidates,
    )

    # 4000 distinct noise keys (1 occurrence each) + two hot keys
    hot = [(9_000_001,)] * 1500 + [(9_000_002,)] * 800
    noise = [(i,) for i in range(4000)]
    df = spark.createDataFrame(hot + noise, "k long").repartition(8)
    n = df.count()
    cap = 64
    cand = misra_gries_candidates(df, "k", cap).collect()
    assert len(cand) <= 8 * cap
    true = {9_000_001: 1500, 9_000_002: 800}
    for r in cand:
        assert r["est"] <= true.get(r["k"], 1), "MG must underestimate"
    keys = {r["k"] for r in cand}
    for k, c in true.items():
        if c > n / (cap + 1):
            assert k in keys, f"hot key {k} lost from candidates"


def test_heavy_hitters_exact_matches_bruteforce(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.frequent import (
        heavy_hitters_exact,
    )

    rows = [(1,)] * 500 + [(2,)] * 120 + [(3,)] * 30 \
        + [(i,) for i in range(100, 1100)]
    df = spark.createDataFrame(rows, "k long").repartition(8)
    n = len(rows)
    got = {r["k"]: r["n"] for r in heavy_hitters_exact(
        df, "k", min_fraction=0.05, capacity=64).collect()}
    want = {k: c for k, c in [(1, 500), (2, 120), (3, 30)]
            if c >= -(-n * 5 // 100)}  # ceil(0.05*n)
    assert got == want, "exact counts for exactly the frequent keys"


def test_heavy_hitters_rejects_unprovable_threshold(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.frequent import (
        heavy_hitters_exact,
    )

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="provably complete"):
        heavy_hitters_exact(df, "k", min_fraction=0.001, capacity=64)


def test_prune_rare_tokens_rewrites_in_order(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        prune_rare_tokens,
    )

    docs = spark.createDataFrame(
        [(1, "a b rare1 a b"), (2, "b a b rare2 a"), (3, "a a b b a")],
        "doc_id long, text string")
    # 15 tokens total; a=7, b=6 frequent; rare1/rare2 = 1 each.
    # threshold 10% → ceil(1.5)=2 → the two singletons scrub.
    out = {r["doc_id"]: (r["clean_text"], r["n_unk"])
           for r in prune_rare_tokens(
               docs, "doc_id", "text", 0.10).collect()}
    assert out == {1: ("a b <unk> a b", 1),
                   2: ("b a b <unk> a", 1),
                   3: ("a a b b a", 0)}


def test_events_scd2_status_equals_interval_join(spark, sf_dir):
    """The as-of reduction must equal the explicit interval-predicate
    join on the same SCD2 history, including the before-first-version
    NONE sentinel."""
    from data_engineering_pipeline_project_cloud_spark.operators import (
        relational as rel,
    )
    from data_engineering_pipeline_project_cloud_spark.plans.temporal import (
        events_scd2_status,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    got = {r["event_id"]: (r["status"], r["version"])
           for r in events_scd2_status(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    hist = rel.scd2_compact(
        orders.select("o_custkey",
                      F.col("o_orderstatus").alias("status"),
                      "o_orderdate", "o_orderkey"),
        ["o_custkey"], "status", ["o_orderdate", "o_orderkey"])
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.col("user_id").cast("long").alias("user_id"))
    dim = hist.select(F.col("o_custkey").cast("long").alias("user_id"),
                      "valid_from", "valid_to", "status",
                      F.col("version").cast("long").alias("version"))
    joined = ev.join(dim, (ev["user_id"] == dim["user_id"])
                     & (ev["ts"] >= dim["valid_from"])
                     & (ev["ts"] < dim["valid_to"]), "left")
    want = {r["event_id"]: (r["status"] or "NONE",
                            -1 if r["version"] is None else r["version"])
            for r in joined.select(ev["event_id"], "status",
                                   "version").collect()}
    assert got == want
    assert any(v == ("NONE", -1) or v[1] >= 0 for v in got.values())


def test_kcore_peels_pendant_chain(spark):
    """A triangle with a pendant chain: K=2 peels the chain in
    cascading rounds and keeps exactly the triangle (each node with
    final degree 2)."""
    from data_engineering_pipeline_project_cloud_spark.plans.analytics import (
        kcore_peel,
    )

    # triangle 1-2-3 plus chain 3-4-5-6: round 1 drops 6, round 2
    # drops 5, round 3 drops 4 — the cascade needs the iteration
    und = [("1", "2"), ("2", "3"), ("1", "3"),
           ("3", "4"), ("4", "5"), ("5", "6")]
    e = spark.createDataFrame(und, "a string, b string")
    final = {r["node"]: r["deg"]
             for r in kcore_peel(e, k=2, iters=4).collect()}
    assert final == {"1": 2, "2": 2, "3": 2}


def test_group_split_never_straddles_sources(spark, sf_dir):
    """The leakage guard's invariant: every source maps to exactly one
    split (no doc of a source lands in a different split), and all
    three splits are populated at test scale."""
    from data_engineering_pipeline_project_cloud_spark.plans.llmdata import (
        split_group_by_source,
    )

    rows = split_group_by_source(spark, sf_dir).collect()
    by_source: dict[str, set] = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_source.values())
    assert {s for ss in by_source.values() for s in ss} == {
        "train", "val", "test"}


def test_anomaly_baseline_excludes_current_day(spark, sf_dir):
    """The rolling baseline is exclusive of the flagged day: early days
    (history < ANOM_MIN_DAYS) carry NULL z, and every flagged day has
    |z| above the threshold."""
    from data_engineering_pipeline_project_cloud_spark.plans.temporal import (
        ANOM_MIN_DAYS,
        ANOM_Z,
        order_volume_anomalies,
    )

    rows = order_volume_anomalies(spark, sf_dir).collect()
    by_p: dict[str, list] = {}
    for r in rows:
        by_p.setdefault(r["priority"], []).append(r)
    for p, rs in by_p.items():
        rs.sort(key=lambda r: r["d"])
        # first ANOM_MIN_DAYS-1 days cannot have enough history
        for r in rs[:ANOM_MIN_DAYS - 1]:
            assert r["z"] is None
    for r in rows:
        if r["is_anomaly"]:
            assert abs(r["z"]) > ANOM_Z
