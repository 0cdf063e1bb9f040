"""BPE tokenizer training (operators/bpe.py) against a from-scratch
Python reference: merge table equality on the real corpus, greedy
merge-application semantics, and encode-stats invariants.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_pipeline_project_cloud_spark.operators.bpe import (
    EOW,
    bpe_train,
    word_histogram,
)
from data_engineering_pipeline_project_cloud_spark.sources import load_table


def _py_apply(units: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right merge — the reference semantics."""
    out: list[str] = []
    for x in units:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_bpe(hist: dict[str, int], n_merges: int):
    """From-scratch BPE on a word histogram, ties to smallest (l, r)."""
    state = {w: (list(w) + [EOW], f) for w, (f) in hist.items()}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for units, f in state.values():
            for a, b in zip(units, units[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        merges.append((rank, l, r, n))
        state = {w: (_py_apply(u, l, r), f) for w, (u, f) in state.items()}
    return merges


def test_bpe_matches_python_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hist = {r["word"]: r["freq"]
            for r in word_histogram(docs).collect()}
    want = _py_bpe(hist, 8)
    got = bpe_train(docs, n_merges=8)
    assert got == want, f"\ngot:  {got}\nwant: {want}"
    # sanity: the loop learned real multi-char units with real support
    assert len(got) == 8
    assert all(n >= 2 for _, _, _, n in got)


def test_merge_apply_greedy_edge_cases(spark):
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.operators.bpe import (
        _apply_merge,
    )

    cases = [
        (["a", "a", "a"], ("a", "a"), ["aa", "a"]),
        (["a", "a", "a", "a"], ("a", "a"), ["aa", "aa"]),
        (["b", "a", "a"], ("b", "a"), ["ba", "a"]),
        (["x"], ("a", "b"), ["x"]),
        ([], ("a", "b"), []),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)],
        "i int, units array<string>")
    for i, (units, (l, r), want) in enumerate(cases):
        got = (df.filter(F.col("i") == i)
               .select(_apply_merge(F.col("units"), l, r).alias("m"))
               .first()["m"])
        assert got == want, f"case {i}: {got} != {want}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(units=st.lists(st.sampled_from(["a", "b", "ab"]), max_size=12),
       pair=st.tuples(st.sampled_from(["a", "b", "ab"]),
                      st.sampled_from(["a", "b", "ab"])))
def test_merge_apply_matches_reference_random(spark, units, pair):
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.operators.bpe import (
        _apply_merge,
    )

    df = spark.createDataFrame([(units,)], "units array<string>")
    got = df.select(
        _apply_merge(F.col("units"), *pair).alias("m")).first()["m"]
    assert got == _py_apply(units, *pair)


def test_encode_stats_invariants(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.plans.llmdata import (
        bpe_compression_stats,
    )

    rows = bpe_compression_stats(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        # merging only ever shrinks; every word keeps >= 1 unit
        assert r["n_words"] <= r["n_bpe_units"] <= r["n_char_units"]
        assert 0 < r["compression"] <= 1
    # the learned merges must actually compress this corpus
    assert any(r["n_bpe_units"] < r["n_char_units"] for r in rows)
