"""Property-based tests (hypothesis): the custom operators against
brute-force Python references on randomized small inputs — the cases
fixed fixtures never think of (duplicate timestamps, empty sides,
single-key pile-ups).
"""

from __future__ import annotations

import datetime as dt

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_pipeline_project_cloud_spark.operators.asof import (
    asof_join_native,
)
from data_engineering_pipeline_project_cloud_spark.operators.relational import (
    top1_per_group,
)

BASE = dt.datetime(2024, 1, 1)

# (key, minute-offset) event lists; small domains force collisions
left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), max_size=25)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)), max_size=15)


def _brute_asof(left, right):
    """Reference: for each left row, the right row with the greatest
    rts <= ts within the key (exact matches allowed), else None."""
    out = {}
    for i, (lk, lt) in enumerate(left):
        best = None
        for rk, rt, rid in right:
            if rk == lk and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rid)
        out[i] = best[1] if best else None
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=left_rows, right=right_rows)
def test_asof_native_matches_bruteforce(spark, left, right):
    # dedup right to one row per (key, time): the operator's contract
    rdedup = {}
    for rk, rt in right:
        rid = rk * 1000 + rt
        rdedup[(rk, rt)] = rid
    rlist = [(k, t, rid) for (k, t), rid in rdedup.items()]

    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(left)]
        or [(0, 0, BASE)],
        "row_id int, key int, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=t), rid) for k, t, rid in rlist]
        or [(99, BASE - dt.timedelta(days=1), -1)],
        "key int, rts timestamp, rid int")
    out = asof_join_native(ldf, rdf, on_left="ts", on_right="rts",
                           by_left="key", by_right="key",
                           value_cols=["rid"])
    got = {r["row_id"]: r["rid"] for r in out.collect()}
    expect = _brute_asof(left or [(0, 0)], rlist)
    assert got == expect


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(n_tokens=st.integers(1, 300))
def test_chunking_covers_every_token(spark, n_tokens):
    """Every token appears in some chunk; consecutive chunks overlap
    by exactly the configured amount (except a short final chunk);
    concatenating chunks at the stride reconstructs the document."""
    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        chunk_documents,
    )

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_tokens=64, overlap=16).collect(),
                  key=lambda r: r["chunk_idx"])
    stride = 64 - 16
    rebuilt = []
    for r in rows:
        toks = r["chunk_text"].split(" ")
        assert r["chunk_tokens"] == len(toks) <= 64
        assert toks[0] == f"t{r['chunk_idx'] * stride}"  # window start
        rebuilt.extend(toks[:stride] if r is not rows[-1] else toks)
    # dedupe the tail overlap between last two windows
    expect = [f"t{i}" for i in range(n_tokens)]
    assert rebuilt[:n_tokens] == expect
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split(" "))
    assert covered == set(expect)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(-5, 5),
                               st.integers(0, 9)), min_size=1, max_size=20))
def test_top1_per_group_matches_bruteforce(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "grp int, score int, tag int")
    out = top1_per_group(df, ["grp"],
                         [F.col("score").desc(), F.col("tag").asc()])
    got = {r["grp"]: (r["score"], r["tag"]) for r in out.collect()}
    expect = {}
    for g, s, t in rows:
        if g not in expect or (-s, t) < (-expect[g][0], expect[g][1]):
            expect[g] = (s, t)
    assert got == expect


corpus_rows = st.lists(
    st.tuples(st.integers(0, 9999),
              st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12)),
    min_size=1, max_size=30, unique_by=lambda r: r[0])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=corpus_rows, budget=st.integers(1, 200))
def test_token_budget_select_invariants_random(spark, rows, budget):
    """Random corpora: the selection never exceeds the budget, every
    kept full-bucket doc outranks every dropped doc on quality bucket,
    and at most one bucket is partially taken."""
    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        token_budget_select,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in rows], "doc_id long, text string")
    kept = token_budget_select(docs, budget_tokens=budget).collect()
    assert sum(r["n_tokens"] for r in kept) <= budget
    boundary = {r["quality_bucket"] for r in kept if r["is_boundary"]}
    assert len(boundary) <= 1
    full = {r["quality_bucket"] for r in kept if not r["is_boundary"]}
    if boundary:
        assert all(f > max(boundary) for f in full)
    # determinism
    again = token_budget_select(docs, budget_tokens=budget).collect()
    assert sorted(map(tuple, kept)) == sorted(map(tuple, again))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 500)),
                     min_size=1, max_size=40))
def test_event_debounce_gap_property(spark, rows):
    """Kept events (beyond each key's first) are > 60s from their
    predecessor IN THE ORIGINAL stream — lag is over all events, not
    only kept ones (debounce, not throttle)."""
    from data_engineering_pipeline_project_cloud_spark.plans.temporal import (
        DEBOUNCE_S,
        debounce,
    )
    ev = spark.createDataFrame(
        [(i, u, "e", BASE + dt.timedelta(seconds=s), 1.0, "{}")
         for i, (u, s) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string")
    kept = debounce(ev).collect()
    # reference: per user, sorted by (ts, event_id); keep first and
    # any event whose gap to the immediately previous EVENT > 60
    by_user = {}
    for i, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i))
    expect = set()
    for u, evs in by_user.items():
        evs.sort()
        for j, (s, i) in enumerate(evs):
            if j == 0 or s - evs[j - 1][0] > DEBOUNCE_S:
                expect.add(i)
    assert {r["event_id"] for r in kept} == expect


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(counts=st.lists(st.integers(1, 40), min_size=2, max_size=5),
       weights=st.lists(st.floats(0.25, 4.0), min_size=5, max_size=5))
def test_mixture_resample_ppm_formula_random(spark, counts, weights):
    """keep_ppm must equal min(1, c*w/n) in exact ppm for every
    source, for arbitrary source sizes and weights."""
    import math

    from data_engineering_pipeline_project_cloud_spark.operators.sampling import (
        mixture_resample,
    )

    rows, nxt = [], 0
    wmap = {}
    for i, n in enumerate(counts):
        src = f"s{i}"
        wmap[src] = weights[i % len(weights)]
        for _ in range(n):
            rows.append((nxt, src))
            nxt += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_resample(docs, wmap).collect()
    c = min(n / wmap[f"s{i}"] for i, n in enumerate(counts))
    for i, n in enumerate(counts):
        want = math.floor(
            round(min(c * wmap[f"s{i}"] / n, 1.0) * 1e9) / 1000)
        got = {r["keep_ppm"] for r in out if r["source"] == f"s{i}"}
        assert got <= {want}, (i, got, want)
    # kept counts can never exceed the source size; arg-min keeps all
    smin = min(range(len(counts)),
               key=lambda i: counts[i] / wmap[f"s{i}"])
    kept_min = sum(1 for r in out if r["source"] == f"s{smin}")
    assert kept_min == counts[smin]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(vals=st.lists(st.floats(0, 9999), min_size=1, max_size=60))
def test_quantile_sketch_order_stat_random(spark, vals):
    """The ceil-rank order statistic always lies inside the estimated
    bin, for arbitrary value distributions including heavy ties."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.plans import relational

    df = spark.createDataFrame(
        [("A", float(v)) for v in vals],
        "l_returnflag string, l_extendedprice double")

    # reuse the face's arithmetic inline on the tiny frame
    w = relational.QSKETCH_BIN
    bin_ = F.floor(F.col("l_extendedprice") / w).cast("long")
    hist = (df.groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt")).collect())
    hist.sort(key=lambda r: r["bin"])
    n = sum(r["cnt"] for r in hist)
    for num, den in ((1, 2), (95, 100)):  # q = num/den, integer math
        cum, est = 0, None
        for r in hist:
            cum += r["cnt"]
            if cum * den >= n * num and est is None:
                est = r["bin"] * w
        rank = -(-n * num // den)  # ceil(n*q) exactly
        v = sorted(vals)[max(0, rank - 1)]
        assert est <= v < est + w, (num, den, est, v)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=8),
    min_size=1, max_size=10))
def test_unigram_lm_matches_bruteforce(spark, docs):
    """avg_neg_logp must equal the brute-force corpus unigram NLL for
    arbitrary tiny corpora (heavy ties, singleton vocab, repeats)."""
    import math

    from data_engineering_pipeline_project_cloud_spark.operators.textstats import (
        unigram_lm_scores,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}

    from collections import Counter
    freq: Counter = Counter()
    for toks in docs:
        freq.update(toks)
    total = sum(freq.values())
    for i, toks in enumerate(docs):
        want = -sum(math.log(freq[t] / total) for t in toks) / len(toks)
        assert out[i]["avg_neg_logp"] == pytest.approx(want, abs=1e-6)
        assert out[i]["n_tokens"] == len(toks)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_words = st.text(alphabet="abc", min_size=1, max_size=6)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(dirty=st.lists(_words, min_size=1, max_size=8, unique=True),
       canon=st.lists(_words, min_size=1, max_size=8, unique=True))
def test_blocked_fuzzy_match_matches_bruteforce(spark, dirty, canon):
    """blocked_fuzzy_match == brute-force argmin over the pairs its
    block admits (same first char, length delta <= LENGTH_BAND, dist
    <= max_dist), tie-breaking to the smallest canonical value.  The
    tiny 'abc' alphabet forces dense collisions, ties, and
    exact-duplicate values."""
    from data_engineering_pipeline_project_cloud_spark.operators.linkage import (
        LENGTH_BAND,
        blocked_fuzzy_match,
    )

    ddf = spark.createDataFrame([(w,) for w in dirty], "dirty string")
    cdf = spark.createDataFrame([(w,) for w in canon], "name string")
    out = {r["dirty"]: (r["matched"], r["match_dist"])
           for r in blocked_fuzzy_match(ddf, cdf, "dirty", "name").collect()}

    for w in dirty:
        best = None
        for c in set(canon):
            if c[0] != w[0] or abs(len(c) - len(w)) > LENGTH_BAND:
                continue
            d = _lev(w, c)
            if d <= 2 and (best is None or (d, c) < best):
                best = (d, c)
        expect = (best[1], best[0]) if best else (None, None)
        assert out[w] == expect, f"{w}: got {out[w]}, want {expect}"


def _brute_overlap(a, b):
    out = set()
    for aid, as_, ae in a:
        for bid, bs, be in b:
            if aid != bid and as_ <= be and bs <= ae:
                out.add((aid, bid, min(ae, be) - max(as_, bs) + 1))
    return out


_iv = st.lists(st.tuples(st.integers(0, 40), st.integers(0, 60),
                         st.integers(0, 30)), min_size=0, max_size=15)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(a=_iv, b=_iv, bin_days=st.sampled_from([1, 3, 7, 30]))
def test_interval_overlap_matches_bruteforce(spark, a, b, bin_days):
    """Binned overlap join == brute-force theta join for EVERY bin
    width (binning must be semantically transparent), including
    touching endpoints and zero-length intervals."""
    from data_engineering_pipeline_project_cloud_spark.operators.intervals import (
        interval_overlap_join,
    )

    def df(rows, dedup):
        # one interval per id (the operator's pair-grain contract)
        seen = {}
        for i, s, ln in rows:
            seen.setdefault(i, (s, s + ln))
        data = [(i, dt.date(2020, 1, 1) + dt.timedelta(days=s),
                 dt.date(2020, 1, 1) + dt.timedelta(days=e))
                for i, (s, e) in seen.items()]
        return (spark.createDataFrame(
            data or [(999999, dt.date(2020, 1, 1), dt.date(2020, 1, 1))],
            "id long, s date, e date"), seen)

    adf, aseen = df(a, True)
    bdf, bseen = df(b, True)
    got = {(r["a_id"], r["b_id"], r["overlap_days"])
           for r in interval_overlap_join(
               adf, bdf, "id", "s", "e", "id", "s", "e",
               bin_days=bin_days).collect()}
    want = _brute_overlap(
        [(i, s, e) for i, (s, e) in aseen.items()] or [(999999, 0, 0)],
        [(i, s, e) for i, (s, e) in bseen.items()] or [(999999, 0, 0)])
    assert got == want


_iv_long = st.lists(
    st.tuples(st.integers(0, 40),
              st.integers(0, 60),
              # mixed lengths: mostly short, some YEARS-long outliers
              st.one_of(st.integers(0, 20), st.integers(500, 3000))),
    min_size=0, max_size=12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(a=_iv_long, b=_iv_long, max_bins=st.sampled_from([1, 3, 8]))
def test_interval_overlap_outlier_routing_matches_bruteforce(
        spark, a, b, max_bins):
    """With max_bins set, years-long intervals bypass binning and join
    via the broadcast residual path; the routed result must still equal
    brute force exactly (routing is semantically transparent)."""
    from data_engineering_pipeline_project_cloud_spark.operators.intervals import (
        interval_overlap_join,
    )

    def df(rows):
        seen = {}
        for i, s, ln in rows:
            seen.setdefault(i, (s, s + ln))
        data = [(i, dt.date(2020, 1, 1) + dt.timedelta(days=s),
                 dt.date(2020, 1, 1) + dt.timedelta(days=e))
                for i, (s, e) in seen.items()]
        return (spark.createDataFrame(
            data or [(999999, dt.date(2020, 1, 1), dt.date(2020, 1, 1))],
            "id long, s date, e date"), seen)

    adf, aseen = df(a)
    bdf, bseen = df(b)
    got = {(r["a_id"], r["b_id"], r["overlap_days"])
           for r in interval_overlap_join(
               adf, bdf, "id", "s", "e", "id", "s", "e",
               bin_days=7, max_bins=max_bins).collect()}
    want = _brute_overlap(
        [(i, s, e) for i, (s, e) in aseen.items()] or [(999999, 0, 0)],
        [(i, s, e) for i, (s, e) in bseen.items()] or [(999999, 0, 0)])
    assert got == want


def test_interval_overlap_residual_side_is_broadcast(spark):
    """The long-outlier residual joins must be planned as BROADCAST
    joins (never a shuffled theta join of the big side), and the
    short×short branch stays a shuffled equi join on the bin key."""
    import datetime as dtt

    from data_engineering_pipeline_project_cloud_spark.operators.intervals import (
        interval_overlap_join,
    )

    rows = [(i, dtt.date(2020, 1, 1), dtt.date(2020, 1, 10))
            for i in range(1, 6)]
    long_rows = [(100 + i, dtt.date(2018, 1, 1), dtt.date(2024, 1, 1))
                 for i in range(2)]
    adf = spark.createDataFrame(rows + long_rows, "id long, s date, e date")
    bdf = spark.createDataFrame(rows + long_rows, "id long, s date, e date")
    out = interval_overlap_join(adf, bdf, "id", "s", "e", "id", "s", "e",
                                bin_days=7, max_bins=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    # both residual branches broadcast their LONG side
    assert plan.count("BroadcastExchange") >= 2, plan


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(dels=st.lists(st.sets(st.integers(0, 24), max_size=12),
                     min_size=1, max_size=3))
def test_dv_delete_sequences_match_filter(spark, tmp_path_factory, dels):
    """Property: ANY sequence of deletion-vector deletes leaves the
    table equal to filtering the union of deleted keys — bitmaps OR
    correctly across commits, masks compose with reads, and fsck
    stays clean."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_vectors_from_manifest,
        fsck_manifest,
        register,
        write_manifest_table,
    )

    from pyspark.sql import functions as F

    register(spark)
    path = str(tmp_path_factory.mktemp("dvprop") / "t")
    base = spark.range(25).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    write_manifest_table(base.repartitionByRange(3, "k"), path, ["k"])
    doomed: set[int] = set()
    for keys in dels:
        if not keys:
            continue
        delete_vectors_from_manifest(
            spark.createDataFrame([(int(k),) for k in keys], "k long"),
            path, ["k"], ["k"])
        doomed |= keys
        got = {r["k"] for r in
               (spark.read.format("graft_manifest")
                .option("path", path).load().collect())}
        assert got == set(range(25)) - doomed
    assert fsck_manifest(path)["ok"]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lo=st.integers(0, 20), width=st.integers(0, 10),
       repl_n=st.integers(0, 8))
def test_overwrite_where_matches_bruteforce(spark, tmp_path_factory,
                                            lo, width, repl_n):
    """Property: for ANY scope [lo, hi] and any in-scope replacement
    set, replaceWhere leaves the table equal to (rows outside scope) ∪
    (replacement rows) — including empty replacements (scope purge)
    and scopes that miss every file."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        overwrite_where,
        register,
        write_manifest_table,
    )

    register(spark)
    hi = lo + width
    path = str(tmp_path_factory.mktemp("rwprop") / "t")
    base = spark.range(25).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    write_manifest_table(base.repartitionByRange(3, "k"), path, ["k"])
    repl_keys = [lo + (i * max(1, width) // max(1, repl_n)) % (width + 1)
                 for i in range(repl_n)]
    repl_rows = sorted({(int(k), int(-k)) for k in repl_keys
                        if lo <= k <= hi})
    repl = spark.createDataFrame(repl_rows or [], "k long, v long")
    overwrite_where(repl, path, "k", lo, hi, ["k"])
    got = {(r["k"], r["v"]) for r in
           (spark.read.format("graft_manifest")
            .option("path", path).load().collect())}
    want = {(k, 10 * k) for k in range(25) if k < lo or k > hi}
    want |= set(repl_rows)
    assert got == want
