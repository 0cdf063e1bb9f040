"""Fuzzy record linkage (operators/linkage.py) and the dead-letter
conform face: match semantics, tie-break determinism, block soundness,
and quarantine/valid row accounting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.operators.linkage import (
    blocked_fuzzy_match,
)
from data_engineering_pipeline_project_cloud_spark.plans.relational import (
    conform_quarantine_orders,
    fuzzy_match_nations,
)
from data_engineering_pipeline_project_cloud_spark.sources import load_table


def _match_map(df):
    return {r["dirty"]: (r["matched"], r["match_dist"])
            for r in df.collect()}


def test_exact_and_near_matches(spark):
    dirty = spark.createDataFrame(
        [("ALPHA",), ("ALPH",), ("BETAX",), ("ZZZZZ",)], "dirty string")
    canon = spark.createDataFrame(
        [("ALPHA",), ("BETA",), ("GAMMA",)], "name string")
    out = _match_map(blocked_fuzzy_match(dirty, canon, "dirty", "name"))
    assert out["ALPHA"] == ("ALPHA", 0)
    assert out["ALPH"] == ("ALPHA", 1)
    assert out["BETAX"] == ("BETA", 1)
    # no candidate within max_dist=2 (and none sharing the block)
    assert out["ZZZZZ"] == (None, None)


def test_tie_breaks_to_lexicographically_smallest(spark):
    dirty = spark.createDataFrame([("IRA",)], "dirty string")
    canon = spark.createDataFrame([("IRAQ",), ("IRAN",)], "name string")
    out = _match_map(blocked_fuzzy_match(dirty, canon, "dirty", "name"))
    assert out["IRA"] == ("IRAN", 1)  # dist 1 both; IRAN < IRAQ


def test_length_band_blocks_far_candidates(spark):
    # same first char, but length differs by 3 > LENGTH_BAND: the pair
    # is never generated even though its true distance is 3 > max_dist
    # anyway — the band only prunes what max_dist would reject
    dirty = spark.createDataFrame([("AB",)], "dirty string")
    canon = spark.createDataFrame([("ABCDE",)], "name string")
    out = _match_map(blocked_fuzzy_match(dirty, canon, "dirty", "name"))
    assert out["AB"] == (None, None)


def test_max_dist_beyond_band_rejected(spark):
    dirty = spark.createDataFrame([("A",)], "dirty string")
    canon = spark.createDataFrame([("A",)], "name string")
    with pytest.raises(ValueError, match="length-band"):
        blocked_fuzzy_match(dirty, canon, "dirty", "name", max_dist=3)


def test_fuzzy_match_nations_recovers_or_ties(spark, sf_dir):
    """Every supplier row gets a match at distance <= 1: the dirty name
    is one deletion from its true nation, so the true nation is always
    a candidate at dist 1 (dist 0 when the deletion collides with
    another canonical name, e.g. NATION_12 -> NATION_2)."""
    out = fuzzy_match_nations(spark, sf_dir)
    n_sup = load_table(spark, sf_dir, "supplier").count()
    rows = out.collect()
    assert len(rows) == n_sup
    assert all(r["matched"] is not None and r["match_dist"] <= 1
               for r in rows)


def test_quarantine_accounting(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    expected_bad = orders.filter(F.pmod("o_orderkey", F.lit(97)) == 0).count()
    quar = conform_quarantine_orders(spark, sf_dir)
    rows = quar.collect()
    assert len(rows) == expected_bad
    # every quarantined raw value really fails the strict parse
    assert all(r["raw_date"].startswith("X") for r in rows)


def test_nb_classifier_learns_above_majority(spark, sf_dir):
    """The NB quality classifier must (a) cover every document,
    (b) produce strictly negative log-scores (log-probs + log-prior),
    and (c) beat the majority-class baseline on its own training
    labels — the minimum bar for 'the model learned something' on a
    corpus whose weak labels derive from stats, not word identity."""
    from data_engineering_pipeline_project_cloud_spark.plans.llmdata import (
        nb_quality_classifier,
    )

    rows = nb_quality_classifier(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_tokens"] > 0
        assert r["score_pass"] < 0 and r["score_fail"] < 0
        assert r["predicted_pass"] == (r["score_pass"] >= r["score_fail"])
    acc = sum(r["weak_label"] == r["predicted_pass"] for r in rows) / len(rows)
    p = sum(r["weak_label"] for r in rows) / len(rows)
    assert acc > max(p, 1 - p), (
        f"train accuracy {acc:.3f} under majority baseline {max(p, 1-p):.3f}")


def test_duplicate_dirty_rows_each_survive(spark):
    """Row-grain contract: two IDENTICAL dirty rows must both come back
    with their (identical) best match — the internal row id prevents
    the group-by from collapsing them (round-3 verdict nit)."""
    from data_engineering_pipeline_project_cloud_spark.operators.linkage import (
        blocked_fuzzy_match,
    )

    dirty = spark.createDataFrame(
        [("FRNCE",), ("FRNCE",), ("GRMANY",)], "name string")
    canon = spark.createDataFrame(
        [("FRANCE",), ("GERMANY",)], "cname string")
    out = blocked_fuzzy_match(dirty, canon, "name", "cname").collect()
    assert len(out) == 3
    got = sorted((r["name"], r["matched"], r["match_dist"]) for r in out)
    assert got == [("FRNCE", "FRANCE", 1), ("FRNCE", "FRANCE", 1),
                   ("GRMANY", "GERMANY", 1)]


def test_explicit_id_col_is_honored(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.linkage import (
        blocked_fuzzy_match,
    )
    import pytest

    dirty = spark.createDataFrame(
        [(1, "FRNCE"), (2, "FRNCE")], "rid long, name string")
    canon = spark.createDataFrame([("FRANCE",)], "cname string")
    out = blocked_fuzzy_match(dirty, canon, "name", "cname",
                              id_col="rid").collect()
    assert sorted(r["rid"] for r in out) == [1, 2]
    assert all(r["matched"] == "FRANCE" for r in out)
    with pytest.raises(ValueError, match="not a column"):
        blocked_fuzzy_match(dirty, canon, "name", "cname", id_col="nope")
