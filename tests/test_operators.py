"""Unit tests for the custom operators on tiny hand-built frames —
the cases the sf-scale differential check can't isolate: tie-breaks,
empty groups, no-match NULL extension, short-document edge cases.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.operators.asof import asof_join
from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from data_engineering_pipeline_project_cloud_spark.operators.relational import (
    add_surrogate_key,
    top1_per_group,
    union_conform_dedup,
)


def test_top1_per_group_tiebreak(spark):
    df = spark.createDataFrame(
        [("a", 10, "x"), ("a", 10, "y"), ("a", 5, "z"), ("b", 1, "q")],
        "grp string, score int, tag string")
    out = top1_per_group(df, ["grp"],
                         [F.col("score").desc(), F.col("tag").asc()])
    rows = {r["grp"]: r["tag"] for r in out.collect()}
    # tie on score=10 broken by tag ASC -> "x"
    assert rows == {"a": "x", "b": "q"}


def test_union_conform_dedup(spark):
    a = spark.createDataFrame([(1, "p"), (2, None)], "k int, v string")
    b = spark.createDataFrame([(1, "p"), (3, "r")], "k int, v string")
    out = union_conform_dedup([a, b])
    rows = sorted((r["k"], r["v"]) for r in out.collect())
    # duplicate (1,p) collapsed, (2,NULL) dropped by dropna
    assert rows == [(1, "p"), (3, "r")]


def test_add_surrogate_key_deterministic(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], "name string")
    out1 = {(r["name"], r["sk"]) for r in
            add_surrogate_key(df, "sk", ["name"]).collect()}
    out2 = {(r["name"], r["sk"]) for r in
            add_surrogate_key(df.repartition(3), "sk", ["name"]).collect()}
    assert out1 == out2 == {("a", 0), ("b", 1), ("c", 2)}


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), "u1"),
         (2, _ts("2024-01-01T12:00"), "u1"),
         (3, _ts("2024-01-01T09:00"), "u2"),   # before any right row
         (4, _ts("2024-01-01T12:00"), "u3")],  # key absent on right
        "event_id int, ts timestamp, user string")
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:00"), 100),   # exact match allowed
         ("u1", _ts("2024-01-01T11:30"), 101),
         ("u2", _ts("2024-01-01T11:00"), 200)],
        "user string, rts timestamp, rid int")
    out = asof_join(left, right, on_left="ts", on_right="rts",
                    by_left="user", by_right="user",
                    value_cols=["rts", "rid"])
    got = {r["event_id"]: r["rid"] for r in out.collect()}
    assert got == {1: 100, 2: 101, 3: None, 4: None}
    assert out.count() == 4  # left-outer: no row loss


def test_asof_native_matches_pandas_path(spark, sf_dir):
    """The JVM-native (union+window) and cogrouped-pandas as-of
    implementations must agree row-for-row on real data."""
    from data_engineering_pipeline_project_cloud_spark.operators.asof import (
        asof_join_native,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table
    from data_engineering_pipeline_project_cloud_spark.testing import diff_results

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderkey").alias("order_id"))
    dedup = orders.groupBy("user_id", "order_date").agg(
        F.max("order_id").alias("order_id"))
    kw = dict(on_left="ts", on_right="order_date",
              by_left="user_id", by_right="user_id",
              value_cols=["order_date", "order_id"])
    native = asof_join_native(ev, dedup, **kw)
    pandas_ = asof_join(ev, dedup, **kw)
    problems = diff_results(
        native.columns, [tuple(r) for r in native.collect()],
        pandas_.columns, [tuple(r) for r in pandas_.collect()])
    assert not problems, "; ".join(problems)


def test_asof_native_backward_semantics(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.asof import (
        asof_join_native,
    )

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00"), "u1"),
         (2, _ts("2024-01-01T12:00"), "u1"),
         (3, _ts("2024-01-01T09:00"), "u2"),
         (4, _ts("2024-01-01T12:00"), "u3")],
        "event_id int, ts timestamp, user string")
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T10:00"), 100),
         ("u1", _ts("2024-01-01T11:30"), 101),
         ("u2", _ts("2024-01-01T11:00"), 200)],
        "user string, rts timestamp, rid int")
    out = asof_join_native(left, right, on_left="ts", on_right="rts",
                           by_left="user", by_right="user",
                           value_cols=["rts", "rid"])
    got = {r["event_id"]: r["rid"] for r in out.collect()}
    assert got == {1: 100, 2: 101, 3: None, 4: None}
    assert out.count() == 4


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("hi there",)], "text string")
    out = df.select(shingles(F.col("text"), 3).alias("sh")).collect()[0]["sh"]
    # doc shorter than n -> whole text as a single shingle
    assert out == ["hi there"]


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string")
    out = {r["keep_doc_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_lsh_finds_exact_duplicates(spark):
    # identical docs share every band -> must surface as a candidate pair
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different content with other words entirely here")],
        "doc_id long, text string")
    sigs = minhash_signatures(df, num_hashes=8)
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             lsh_candidate_pairs(sigs, num_hashes=8, bands=4).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "zq xw vv kk jj uu oo")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_lsh_bucket_cap_bounds_boilerplate(spark):
    """Adversarial boilerplate corpus: 100 identical docs share every
    band bucket, so uncapped banding emits the quadratic 4950 pairs.
    With max_bucket the mega-bucket is dropped BEFORE pairing and only
    the small genuine bucket survives — the 100 TB skew guard."""
    docs = spark.createDataFrame(
        [(i, "same boilerplate text repeated in every single document")
         for i in range(100)]
        + [(1000, "a genuinely different document about something else"),
           (1001, "a genuinely different document about something else")],
        "doc_id long, text string")
    sigs = minhash_signatures(docs, num_hashes=8)
    capped = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(
        sigs, num_hashes=8, bands=4, max_bucket=50).collect()}
    assert (1000, 1001) in capped
    assert all(a >= 1000 for a, _ in capped), "mega-bucket not dropped"
    uncapped = lsh_candidate_pairs(
        sigs, num_hashes=8, bands=4, max_bucket=None).count()
    assert uncapped >= 100 * 99 // 2


def test_simhash_pairs_bucket_cap(spark):
    """Same guard on the SimHash banding path."""
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        simhash_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "identical boilerplate words appearing everywhere always")
         for i in range(60)],
        "doc_id long, text string")
    capped = simhash_pairs(docs, max_hamming=3, max_bucket=10).count()
    uncapped = simhash_pairs(docs, max_hamming=3, max_bucket=None).count()
    assert capped == 0
    assert uncapped == 60 * 59 // 2


def test_connected_components_chain_and_star(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        connected_components,
    )
    # chain 1-2-3-4 (worst-case diameter) + star 10-{11,12,13} + isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "doc_a long, doc_b long")
    out = {r["node"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_dedup_keep_one_singletons_and_sizes(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        dedup_keep_one,
    )
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 7)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_kept"])
            for r in dedup_keep_one(docs, pairs).collect()}
    assert rows == {1: (1, 3, True), 2: (1, 3, False),
                    3: (1, 3, False), 7: (7, 1, True)}


def test_scoped_caches_released_between_registry_queries(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.caching import _LIVE
    from data_engineering_pipeline_project_cloud_spark.plans.registry import (
        all_queries,
    )
    qs = all_queries()
    qs["dedup_minhash_pairs"](spark, sf_dir).count()
    assert len(_LIVE) >= 1  # signature + shingle caches live after run
    qs["dedup_exact"](spark, sf_dir).count()
    # next registry run released them; dedup_exact itself caches nothing
    assert len(_LIVE) == 0


def test_repetition_stats_flags_looping_text(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        repetition_stats,
    )
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam spam spam"),
         (2, "one two three four five six seven eight")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["is_repetitive"] and out[1]["top_bigram_frac"] == 1.0
    assert not out[2]["is_repetitive"]
    assert out[2]["n_bigrams"] == 7 and out[2]["top_bigram_count"] == 1


def test_contamination_check_rates(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        contamination_check,
    )
    ev = spark.createDataFrame([(100, "a b c d e")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c d e"),            # fully contained in eval
         (2, "x y z w v u t")],       # disjoint
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in contamination_check(docs, ev).collect()}
    assert out[1]["contamination_rate"] == 1.0 and out[1]["flagged"]
    assert out[2]["n_contaminated"] == 0 and not out[2]["flagged"]


def test_stratified_sample_deterministic_and_balanced(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        stratified_sample,
    )
    rows = [(i, "en") for i in range(400)] + [(i, "fr") for i in range(400, 440)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    a = stratified_sample(docs).collect()
    b = stratified_sample(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-stable
    by_lang = {}
    for r in a:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert by_lang["fr"] == 40                      # smallest stratum intact
    assert 20 <= by_lang["en"] <= 70                # en downsampled to ~40


def test_cdc_apply_latest_wins_and_delete_drops(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.relational import (
        cdc_apply,
    )
    log = spark.createDataFrame(
        [(1, 1, "a", "U"), (1, 2, "b", "U"),   # key 1: b wins
         (2, 1, "x", "U"), (2, 2, "x2", "D"),  # key 2: final delete drops
         (3, 1, "gone", "D"), (3, 2, "back", "U")],  # delete then re-insert
        "k long, seq long, v string, op string")
    out = {r["k"]: r["v"]
           for r in cdc_apply(log, ["k"], ["seq"]).collect()}
    assert out == {1: "b", 3: "back"}


def test_scd2_compact_runs_and_sentinel(spark):
    import datetime as dtm
    from data_engineering_pipeline_project_cloud_spark.operators.relational import (
        scd2_compact,
    )
    t = lambda d: dtm.datetime(2024, 1, d)
    obs = spark.createDataFrame(
        [(1, "A", t(1), 1), (1, "A", t(2), 2), (1, "B", t(3), 3),
         (1, "A", t(4), 4), (2, "Z", t(1), 5)],
        "k long, attr string, ts timestamp, seq long")
    rows = sorted(
        scd2_compact(obs, ["k"], "attr", ["ts", "seq"]).collect(),
        key=lambda r: (r["k"], r["version"]))
    # key 1: A-run, B-run, A-run again (3 versions); key 2: one current row
    assert [(r["k"], r["attr"], r["version"], r["is_current"])
            for r in rows] == [
        (1, "A", 1, False), (1, "B", 2, False), (1, "A", 3, True),
        (2, "Z", 1, True)]
    assert rows[0]["valid_to"] == rows[1]["valid_from"] == t(3)
    assert rows[2]["valid_to"].year == 9999


def test_temperature_sample_alpha_extremes(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        temperature_sample,
    )
    rows = [(i, "en") for i in range(400)] + [(i, "fr") for i in range(400, 440)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    natural = temperature_sample(docs, alpha=1.0).collect()
    assert len(natural) == 440                       # alpha=1 keeps everything
    balanced = temperature_sample(docs, alpha=0.0)
    ppm = {r["lang"]: r["keep_ppm"] for r in balanced.collect()}
    assert ppm["fr"] == 1_000_000                    # smallest stratum intact
    assert ppm["en"] == 100_000                      # 40/400 exactly
    mid = {r["lang"]: r["keep_ppm"]
           for r in temperature_sample(docs, alpha=0.5).collect()}
    # temperature rate sits strictly between balanced and natural
    assert 100_000 < mid["en"] < 1_000_000
    a = sorted(map(tuple, temperature_sample(docs, alpha=0.5).collect()))
    b = sorted(map(tuple, temperature_sample(docs, alpha=0.5).collect()))
    assert a == b                                    # rerun-stable
    # outside [0, 1] the exponent flips sign (silent keep-everything)
    # or over-suppresses — rejected loudly instead
    for bad in (1.5, -0.1):
        with pytest.raises(ValueError, match="alpha"):
            temperature_sample(docs, alpha=bad)


def test_xcheck_canon_null_vs_string():
    """The 4-way cross-check's NULL canonicalization must decide on the
    Python object: a genuine string 'None'/'nan' is NOT a null, while
    None / float NaN / pandas NaT / pandas NA all are."""
    import numpy as np
    import pandas as pd

    from tools.xcheck_serialization import _canon

    null = _canon(None)
    assert _canon(float("nan")) == null
    assert _canon(np.float64("nan")) == null
    assert _canon(pd.NaT) == null
    assert _canon(pd.NA) == null
    assert _canon("None") == "None" != null     # real strings survive
    assert _canon("nan") == "nan" != null
    assert _canon(0.0) == "0.0"
    assert _canon(np.array([1, 2])) == str(np.array([1, 2]))


def test_token_budget_select_invariants(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        token_budget_select,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    budget = 8000
    kept = token_budget_select(docs, budget_tokens=budget).collect()
    assert kept, "budget selects a non-empty corpus"
    assert sum(r["n_tokens"] for r in kept) <= budget
    # greedy property: every kept full-bucket doc outranks every
    # dropped doc; the boundary bucket is the unique partial one
    full_buckets = {r["quality_bucket"] for r in kept if not r["is_boundary"]}
    boundary = {r["quality_bucket"] for r in kept if r["is_boundary"]}
    assert len(boundary) <= 1
    if boundary:
        assert min(full_buckets) > max(boundary)
    # huge budget keeps the whole corpus
    all_kept = token_budget_select(docs, budget_tokens=10**9).collect()
    assert len(all_kept) == docs.count()
    assert not any(r["is_boundary"] for r in all_kept)


def test_cross_corpus_neardup_flags_paraphrase(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        cross_corpus_neardup,
    )
    base = "the quick brown fox jumps over the lazy dog again and again"
    reference = spark.createDataFrame(
        [(1000, base), (1001, "completely different reference text here")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, base + " tail"),                       # near-copy of ref 1000
         (2, "unrelated words nothing shared at all with anything")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           cross_corpus_neardup(corpus, reference, threshold=0.5).collect()}
    assert len(out) == 2                      # corpus grain, no row lost
    assert out[1]["flagged"] and out[1]["best_ref_id"] == 1000
    assert out[1]["best_jaccard"] > 0.8
    assert not out[2]["flagged"] and out[2]["best_ref_id"] == -1
    assert out[2]["best_jaccard"] == 0.0


def test_quantile_quality_filter_per_stratum(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        quantile_quality_filter,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = quantile_quality_filter(docs, q=0.5).collect()
    total = {r["lang"]: c for r, c in
             [(r, r["cnt"]) for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
              .collect()]}
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(total)        # no language starved
    for lang, rows in by_lang.items():
        # median cut keeps roughly the top half of EACH stratum
        assert 0.4 * total[lang] <= len(rows) <= 0.75 * total[lang] + 1
        thr = {r["q_threshold"] for r in rows}
        assert len(thr) == 1                 # one threshold per stratum
        assert all(r["quality"] >= r["q_threshold"] for r in rows)


def test_inverted_index_caps_postings(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        inverted_index,
    )
    docs = spark.createDataFrame(
        [(i, "common unique%d" % i) for i in range(50)],
        "doc_id long, text string")
    out = {r["token"]: r for r in
           inverted_index(docs, max_postings=5).collect()}
    hot = out["common"]
    assert hot["doc_freq"] == 50                      # full df survives the cap
    assert hot["posting_sample"] == "0|1|2|3|4"       # capped, ascending
    assert out["unique7"]["doc_freq"] == 1
    assert out["unique7"]["posting_sample"] == "7"


def test_hll_rollup_within_error_bound(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.plans.relational import (
        hll_rollup_users,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    est = {r["event_type"]: r["est_users"]
           for r in hll_rollup_users(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["__ALL__"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.02 * e), (k, est[k], e)


def test_cross_corpus_neardup_overlapping_id_spaces(spark):
    """Corpus and reference independently numbered from the same id
    range: the corpus doc must be scored against ITS OWN text, never
    against the reference doc that happens to share its id."""
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        cross_corpus_neardup,
    )
    ref_text = "shared identifier reference body with many common words here"
    reference = spark.createDataFrame(
        [(7, ref_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(7, "totally unrelated corpus content nothing in common at all"),
         (8, ref_text + " tail")],       # genuine near-copy of ref 7
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           cross_corpus_neardup(corpus, reference, threshold=0.5).collect()}
    assert not out[7]["flagged"], "id collision must not cross texts"
    assert out[8]["flagged"] and out[8]["best_ref_id"] == 7


def test_normalize_text_collapses_noise(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        normalize_text,
    )
    docs = spark.createDataFrame(
        [(1, "  hello\t\tworld \x01 again  "), (2, "clean")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert out[1]["norm_text"] == "hello world again"
    assert out[1]["changed"]
    assert out[2]["norm_text"] == "clean" and not out[2]["changed"]
    assert out[1]["n_chars_after"] < out[1]["n_chars_before"]


def test_source_mix_shares(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        source_mix,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = source_mix(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # rounded per-row, so the share sums land within rounding slack
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["n_langs"] >= 1
        assert r["avg_chars"] > 0


def test_full_outer_reconciliation_covers_both_sides(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.plans.analytics import (
        daily_order_ship_reconciliation,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table
    from pyspark.sql import functions as F

    out = daily_order_ship_reconciliation(spark, sf_dir)
    rows = out.collect()
    # every day from either side appears exactly once
    days = [r["day"] for r in rows]
    assert len(days) == len(set(days))
    n_orders = load_table(spark, sf_dir, "orders").count()
    n_items = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert sum(r["n_shipped_items"] for r in rows) == n_items
    # classification agrees with the null-extension pattern
    for r in rows:
        if r["status"] == "orders_only":
            assert r["n_shipped_items"] == 0
        elif r["status"] == "ships_only":
            assert r["n_orders"] == 0
        else:
            assert r["n_orders"] > 0 and r["n_shipped_items"] > 0


def test_mixture_resample_shares_and_determinism(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        mixture_resample,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 3.0, "src1": 3.0}
    out = mixture_resample(docs, weights)
    rows = out.collect()
    # deterministic: identical selection on re-run
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in mixture_resample(docs, weights).collect())
    # every source's ppm equals the formula computed independently:
    # keep_s = min(1, c * w_s / n_s) with c = min_s(n_s / w_s)
    ppm = {r["source"]: r["keep_ppm"] for r in rows}
    per_src_in = {r["source"]: r["n"] for r in
                  docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
    import math
    c = min(n / weights.get(s, 1.0) for s, n in per_src_in.items())
    for s, n in per_src_in.items():
        want = math.floor(round(min(c * weights.get(s, 1.0) / n, 1.0)
                                * 1e9) / 1000)
        # sources whose every doc hashed out of the sample emit no row
        assert ppm.get(s, want) == want, (s, ppm.get(s), want)
    # the arg-min source keeps everything by construction
    s_min = min(per_src_in, key=lambda s: per_src_in[s] / weights.get(s, 1.0))
    assert ppm[s_min] == 1_000_000
    with pytest.raises(ValueError):
        mixture_resample(docs, {"src0": -1.0})
    with pytest.raises(ValueError):
        mixture_resample(docs, {"no_such_source": 2.0},
                         strict=True).collect()


def test_rule_filter_flags_consistent(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        rule_filter,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown foxes jumped over a lazy dog near the "
             "riverbank while autumn leaves drifted slowly in the wind "
             "and the forest grew quiet around them all day long today"),
         (2, "tiny doc"),
         (3, " ".join(["word"] * 60))],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in rule_filter(df).collect()}
    # keep == AND of the four rule flags, always
    for r in rows.values():
        assert r["keep"] == (r["pass_length"] and r["pass_word_len"]
                             and r["pass_stopwords"] and r["pass_repetition"])
    assert not rows[2]["pass_length"]          # 2 tokens < min 25
    assert not rows[3]["pass_repetition"]      # 1/60 distinct ratio
    assert rows[3]["distinct_ratio"] == pytest.approx(1 / 60, abs=1e-6)
    assert rows[1]["pass_stopwords"]           # 'the' x4, 'a', 'in' ...


def test_unigram_lm_scores_orders_outliers(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        unigram_lm_scores,
    )

    common = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [(1, common), (2, common), (3, common), (4, "zeta eta unique rare")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}
    # the doc made of rare tokens scores strictly worse (higher NLL)
    assert rows[4]["avg_neg_logp"] > rows[1]["avg_neg_logp"]
    # identical docs score identically
    assert rows[1]["avg_neg_logp"] == rows[2]["avg_neg_logp"]
    # ppl = exp(nll) up to the independent roundings
    import math
    for r in rows.values():
        assert r["unigram_ppl"] == pytest.approx(
            math.exp(r["avg_neg_logp"]), rel=1e-3)
        assert r["n_tokens"] == 4


def test_quantile_sketch_error_bound(spark, sf_dir):
    import math

    from data_engineering_pipeline_project_cloud_spark.plans.relational import (
        QSKETCH_BIN,
        quantile_sketch_rollup,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    out = {r["g"]: r for r in quantile_sketch_rollup(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    by_g: dict[str, list[float]] = {"__ALL__": []}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        by_g.setdefault(r[0], []).append(r[1])
        by_g["__ALL__"].append(r[1])
    assert set(out) == set(by_g)

    def ostat(vals: list[float], q: float) -> float:
        return sorted(vals)[max(0, math.ceil(q * len(vals)) - 1)]

    for g, r in out.items():
        # the defining sketch property: the ceil-rank ORDER STATISTIC
        # lies inside the estimated bin [lower_edge, lower_edge + w)
        for est, q in ((r["p50_est"], 0.5), (r["p95_est"], 0.95)):
            v = ostat(by_g[g], q)
            assert est <= v < est + QSKETCH_BIN, (g, q, est, v)
        assert r["n_rows"] == len(by_g[g])


def test_map_side_text_ops_no_exchange(spark, sf_dir):
    """The pure map-side text family must pipeline with the scan —
    any Exchange in these plans is a scale regression (at 100 TB it
    would shuffle the raw corpus for a projection)."""
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        normalize_text,
        quality_score,
        rule_filter,
        scrub_text,
        text_stats,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    for op in (rule_filter, quality_score, text_stats, scrub_text,
               normalize_text):
        plan = (op(docs)._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan, f"{op.__name__}: {plan}"


def test_registry_priority_never_oldest_first(monkeypatch):
    """Driver-window ordering: never-checked queries run before any
    with evidence, among never-checked the OLDEST additions come
    first so a new round's queries cannot starve the long-unproven
    tail of a budget-capped driver pass, and among settled queries the
    STALEST evidence round comes first (round-6 rotation: with a fully
    green board, the window refreshes the oldest rows instead of
    re-checking the same module-order prefix)."""
    from data_engineering_pipeline_project_cloud_spark.plans import registry

    monkeypatch.setattr(
        registry, "_evidence",
        lambda: ({"settled_r4": 4, "settled_r2": 2}, {"red"}))
    monkeypatch.setattr(registry, "_ADDED_IN_ROUND", {"new3": 3})
    order = registry._prioritize(
        ["new3", "old_a", "red", "settled_r4", "settled_r2", "old_b"])
    assert order == ["old_a", "old_b", "new3", "red",
                     "settled_r2", "settled_r4"]


def test_partition_pruning_plan_and_values(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.plans.relational import (
        partition_pruned_orders,
    )

    df = partition_pruned_orders(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the status filter must resolve against directory names, not rows
    assert "PartitionFilters" in plan, plan
    import re
    pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan).group(0)
    assert "o_orderstatus" in pf and "= F" in pf, pf


def test_global_topk_uses_take_ordered(spark, sf_dir):
    """Global ORDER BY + LIMIT faces must compile to
    TakeOrderedAndProject (per-partition top-k merged at the driver),
    never a total-order Sort across the full table — the difference
    between O(k) driver memory and a single-reducer sort at 100 TB."""
    from data_engineering_pipeline_project_cloud_spark.plans.llmdata import (
        boilerplate_ngrams,
    )
    from data_engineering_pipeline_project_cloud_spark.plans.relational import (
        skew_key_report,
    )

    for fn in (boilerplate_ngrams, skew_key_report):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, f"{fn.__name__}: {plan}"


def test_bucket_pairs_no_self_pairs_on_duplicate_ids(spark):
    """A duplicated member id in a bucket (re-ingested/unioned corpus)
    must not pair a document with itself."""
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        _bucket_pairs,
    )

    buckets = spark.createDataFrame(
        [(1, 0, 7), (1, 0, 7), (2, 0, 7), (9, 1, 3)],
        "doc_id long, band_idx int, band_hash long")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in _bucket_pairs(buckets, ["band_idx", "band_hash"],
                                    "doc_id", 100).collect()}
    assert pairs == {(1, 2)}


def test_pq_codebooks_seed_with_offset_ids(spark):
    """Codebook init must seed from the first k vectors BY ORDER of
    id — an id space not starting at 0 seeded zero cells before."""
    from data_engineering_pipeline_project_cloud_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = spark.createDataFrame(
        [(1000 + i, [float(i % 3), float(i % 5), float(i % 7), 1.0])
         for i in range(40)],
        "vec_id long, embedding array<double>")
    books = pq_codebooks(emb, m=2, k=4, iters=1)
    assert len(books) == 2
    assert all(1 <= len(b) <= 4 for b in books)
    codes = pq_encode(emb, books).collect()
    assert len(codes) == 40
    for r in codes:
        for j, c in enumerate(r["pq_codes"]):
            assert 0 <= c < len(books[j])


def test_registry_round_declarations_consistent():
    """Evidence bookkeeping guard: every _ADDED_IN_ROUND /
    _OUTPUT_CHANGED_AFTER name is a real registry query (a typo'd name
    would silently mis-order the driver window), and the rows-only
    set (queries with no oracle) is exactly the known sketch/ANN/BPE
    faces — a NEW query missing its oracle entry fails here instead of
    silently downgrading to the weak rows-only check."""
    from data_engineering_pipeline_project_cloud_spark.plans import registry

    q = set(registry.all_queries())
    o = set(registry.all_oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == {
        "dedup_minhash_pairs", "ann_lsh_topk", "ann_lsh_multiprobe_topk",
        "ann_ivf_topk", "ann_pq_topk", "hll_rollup_users",
        "approx_distinct_counts", "bpe_merge_table",
        "bpe_compression_stats", "embedding_pca_projection",
        "media_cdc_chunks",
    }, f"unexpected rows-only set: {sorted(q - o)}"
    assert set(registry._ADDED_IN_ROUND) <= q, \
        sorted(set(registry._ADDED_IN_ROUND) - q)
    assert set(registry._OUTPUT_CHANGED_AFTER) <= q, \
        sorted(set(registry._OUTPUT_CHANGED_AFTER) - q)


def test_feature_hash_tf_semantics(spark):
    """Hashing-trick invariants on a hand-built corpus: same token →
    same (bucket, sign) everywhere; a token repeated n times
    contributes ±n in one bucket; sums over a doc's |tf| never exceed
    its token count (collisions can only cancel, not inflate)."""
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        FEATURE_HASH_DIM,
        feature_hash_tf,
    )

    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha"), (2, "alpha beta"), (3, "beta beta")],
        "doc_id long, text string")
    out = feature_hash_tf(docs)
    rows = [(r["doc_id"], r["bucket"], r["tf"]) for r in out.collect()]
    by_doc = {}
    for d, b, t in rows:
        assert 0 <= b < FEATURE_HASH_DIM
        by_doc.setdefault(d, {})[b] = t
    # doc 1: one bucket, |tf| = 3 (same token, same sign)
    assert len(by_doc[1]) == 1 and abs(next(iter(by_doc[1].values()))) == 3
    # alpha's bucket/sign identical across docs 1 and 2
    (b1, t1), = by_doc[1].items()
    assert by_doc[2].get(b1) in (t1 // 3, t1 // 3 + by_doc[3].get(b1, 0))
    # doc 3: beta twice → one bucket, |tf| = 2, consistent with doc 2
    assert len(by_doc[3]) == 1 and abs(next(iter(by_doc[3].values()))) == 2
    for d, buckets in by_doc.items():
        assert sum(abs(t) for t in buckets.values()) <= \
            {1: 3, 2: 2, 3: 2}[d]


def test_portable_hll_accuracy_and_merge_algebra(spark, sf_dir):
    """The portable HLL estimate lands within ~2 standard errors
    (1.04/√64 ≈ 13%) of the exact distinct count per group, and
    register MERGE (elementwise max over groups) equals the sketch
    built directly over the union — the rollup algebra."""
    from data_engineering_pipeline_project_cloud_spark.operators.sketches import (
        hll_portable_estimate,
        hll_portable_registers,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id")
    regs = hll_portable_registers(ev, "user_id", ["event_type"])
    est = {r["event_type"]: r["est_count"]
           for r in hll_portable_estimate(
               regs, ["event_type"]).collect()}
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(0.30 * n, 3.0), (t, est[t], n)
    # merge algebra: max-merged per-type registers == direct sketch
    merged = (regs.groupBy("bucket").agg(F.max("m").cast("int").alias("m"))
              .withColumn("g", F.lit("ALL")))
    direct = hll_portable_registers(
        ev.withColumn("g", F.lit("ALL")), "user_id", ["g"])
    a = {r["bucket"]: r["m"] for r in merged.collect()}
    b = {r["bucket"]: r["m"] for r in direct.collect()}
    assert a == b


def test_weighted_sample_is_weight_proportional(spark, sf_dir):
    """Efraimidis-Spirakis inclusion property: sampling orders with
    probability proportional to price must pull the sample's mean
    price well above the corpus mean, deterministically."""
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        weighted_sample,
    )
    from data_engineering_pipeline_project_cloud_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("w"))
    s = weighted_sample(o, "w", "o_orderkey", 100)
    rows = s.collect()
    again = weighted_sample(o, "w", "o_orderkey", 100).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    sample_mean = sum(r["w"] for r in rows) / len(rows)
    corpus_mean = o.agg(F.avg("w")).collect()[0][0]
    assert sample_mean > 1.2 * corpus_mean, (sample_mean, corpus_mean)


def test_round5_plan_shapes(spark, sf_dir):
    """Plan-shape regressions for the round-5 analytics faces: the
    Gram matrix partial-aggregates BEFORE its exchange (the shuffle
    carries d² counters, not exploded rows), the weighted sample is a
    TakeOrderedAndProject (global top-k, no full sort), and the
    one-pass column profiler contains a single table scan."""
    from data_engineering_pipeline_project_cloud_spark.plans.llmdata import (
        embedding_gram_matrix,
    )
    from data_engineering_pipeline_project_cloud_spark.plans.relational import (
        column_profile_orders,
        weighted_sample_orders,
    )

    gram = embedding_gram_matrix(spark, sf_dir)
    plan = gram._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, \
        "expected partial+final aggregate pair"
    # the tree prints final agg, then the exchange, then the partial
    # agg below it: an Exchange between two HashAggregates is the
    # map-side-combine shape
    final_agg = plan.index("HashAggregate")
    exch = plan.index("Exchange")
    assert final_agg < exch < plan.rindex("HashAggregate")

    ws = weighted_sample_orders(spark, sf_dir)
    wplan = ws._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in wplan
    assert "Sort " not in wplan  # no global sort for a top-k

    prof = column_profile_orders(spark, sf_dir)
    pplan = prof._jdf.queryExecution().executedPlan().toString()
    assert pplan.count("Scan parquet") == 1, \
        "profiler must read the table once, not once per column"


def test_winnowing_guarantee_and_span_pairs(spark):
    """The SIGMOD'03 winnowing guarantee: two documents sharing a
    substring of length >= gram_chars + window - 1 share at least one
    SELECTED fingerprint — so duplicate_span_pairs finds the pair,
    while documents with no such span don't appear."""
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        duplicate_span_pairs,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(1, "alpha beta " + shared + " gamma delta"),
         (2, "omega " + shared + " epsilon zeta eta theta iota"),
         (3, "completely different content with nothing in common qq"),
         (4, "another unrelated string zz yy xx ww vv uu tt ss rr")],
        "doc_id long, text string")
    fps = winnow_fingerprints(docs, gram_chars=8, window=4)
    by_doc = {r["doc_id"] for r in fps.collect()}
    assert by_doc == {1, 2, 3, 4}
    f1 = {r["fp"] for r in fps.filter("doc_id = 1").collect()}
    f2 = {r["fp"] for r in fps.filter("doc_id = 2").collect()}
    assert f1 & f2, "shared 51-char span must share a selected print"
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in duplicate_span_pairs(
                 docs, gram_chars=8, window=4, min_shared=1,
                 max_bucket=32).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs), pairs
    # density bound: winnowing selects ~1 print per window position,
    # never more than the number of gram positions
    n1 = fps.filter("doc_id = 1").count()
    doc1_len = len("alpha beta " + shared + " gamma delta")
    assert 1 <= n1 <= doc1_len - 8 + 1


def test_span_pairs_bucket_cap_drops_boilerplate(spark):
    """A fingerprint present in MORE than max_bucket documents is
    boilerplate and must not generate pairs (the quadratic-blowup
    guard, same discipline as the LSH band join)."""
    from data_engineering_pipeline_project_cloud_spark.operators.dedup import (
        duplicate_span_pairs,
    )

    boiler = "this exact boilerplate sentence appears everywhere here"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(10)],
        "doc_id long, text string")
    pairs = duplicate_span_pairs(docs, gram_chars=8, window=4,
                                 min_shared=1, max_bucket=3)
    assert pairs.count() == 0, \
        "prints shared by >3 docs must be dropped before pairing"
    # raising the cap past the corpus size restores the quadratic set
    full = duplicate_span_pairs(docs, gram_chars=8, window=4,
                                min_shared=1, max_bucket=10)
    assert full.count() == 45


def test_dsir_weights_separate_target_from_offtarget(spark):
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        dsir_importance_weights,
    )
    # target-language docs share a vocabulary, off-target docs another;
    # mixed doc sits between
    rows = (
        [(i, "en", "alpha beta gamma delta epsilon zeta") for i in range(8)]
        + [(i, "fr", "un deux trois quatre cinq six") for i in range(8, 16)]
        + [(16, "fr", "alpha beta gamma un deux trois")])
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in
           dsir_importance_weights(docs, "lang = 'en'",
                                   buckets=512).collect()}
    # n_feats = unigrams + bigrams = 2n - 1
    assert out[0]["n_feats"] == 11
    en = [out[i]["log_weight"] for i in range(8)]
    fr = [out[i]["log_weight"] for i in range(8, 16)]
    assert min(en) > max(fr), "target docs must outscore off-target"
    assert max(fr) < out[16]["log_weight"] < min(en), \
        "mixed doc sits between the pure corpora"
    # deterministic across reruns
    again = {r["doc_id"]: r["log_weight"] for r in
             dsir_importance_weights(docs, "lang = 'en'",
                                     buckets=512).collect()}
    assert all(again[k] == out[k]["log_weight"] for k in again)
