"""BPE tokenizer training and encoding as DataFrame pipelines.

Byte-pair encoding is THE tokenizer-construction loop behind modern
LM vocabularies (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016): repeatedly count adjacent unit
pairs and merge the most frequent one.  The loop is inherently
iterative-global (each round's argmax depends on the previous round's
merge), which makes it a model case for iterative DataFrame
algorithms:

* **Train on the word HISTOGRAM, not the corpus.**  Pair counts only
  depend on (distinct word, frequency) — Zipf bounds the histogram
  far below corpus size, so a 100 TB corpus trains on a vocab-grain
  table.  This is exactly how reference BPE trainers work.
* **One shuffle per round** (the pair-count aggregation, partial
  map-side); the argmax lands via a 1-row
  ``TakeOrderedAndProject``-style limit — bounded driver traffic, the
  merge decision IS the algorithm's global state.
* **Lineage truncation per round** (eager ``localCheckpoint``, as in
  ``dedup.connected_components``): the per-round merge-apply fold
  would otherwise nest ``n_merges`` deep and optimizer time blows up
  exponentially.
* **Merge application is a greedy left-to-right HOF fold** — map-side
  over the histogram, no Python.

Determinism: ties on pair count break to the lexicographically
smallest (left, right) pair, so the merge table is reproducible
cross-run and checkable against a Python reference implementation
(tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: end-of-word marker, appended as a separate unit so merges can learn
#: word-final subwords (the standard BPE convention)
EOW = "</w>"


def _adjacent_pairs(units: Column) -> Column:
    """Array of (l, r) structs for adjacent unit pairs."""
    pairs = F.zip_with(
        units, F.slice(units, 2, F.greatest(F.size(units) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")))
    return F.filter(pairs, lambda p: p["r"].isNotNull())


def _apply_merge(units: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    unit — a single fold, no explode."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    return F.aggregate(
        units,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l) & (x == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(lit_l, lit_r)))
        ).otherwise(F.concat(acc, F.array(x))))


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the training
    input; vocab-grain (Zipf-bounded), never corpus-grain.  Empty
    words (NULL or whitespace-only documents: trim+split of '' yields
    [''], and split('', '') yields [''] again — a phantom unit the
    Python reference never produces) are dropped."""
    return (docs.filter(F.col(text_col).isNotNull())
            .select(F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
                .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(rank, left, right, pair_freq), ...]`` — the merge table is the
    tokenizer artifact (like the PQ/IVF codebooks: bounded driver-side
    state at any corpus size)."""
    hist = word_histogram(docs, text_col)
    state = hist.select(
        "word", "freq",
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(EOW))).alias("units"))
    state = state.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts = (state.select(
            "freq", F.explode(_adjacent_pairs(F.col("units"))).alias("p"))
            .groupBy("p.l", "p.r").agg(F.sum("freq").alias("n")))
        top = (counts.orderBy(F.col("n").desc(), F.col("l").asc(),
                              F.col("r").asc())
               .limit(1).collect())
        if not top or top[0]["n"] < 2:
            break  # nothing left worth merging
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((rank, l, r, n))
        state = state.withColumn(
            "units", _apply_merge(F.col("units"), l, r))
        # truncate: the fold nests once per round otherwise
        state = state.localCheckpoint(eager=True)
    return merges


def bpe_segment(units: Column,
                merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply a learned merge table (in rank order) to a unit array."""
    out = units
    for _, left, right, _ in merges:
        out = _apply_merge(out, left, right)
    return out


def bpe_encode_stats(docs: DataFrame,
                     merges: list[tuple[int, str, str, int]],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE token counts (before vs after merges) — the
    compression the learned vocabulary buys, computed map-side over
    the corpus in one scan (the merge table inlines as ``n_merges``
    nested folds; bounded, so the plan is corpus-size-independent).
    NULL-text and zero-token documents are dropped — they would emit
    NULL stats, and the faces guarantee null-free canonical output."""
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda w: w != "")
    per_word_units = F.transform(
        words, lambda w: F.concat(F.split(w, ""), F.array(F.lit(EOW))))
    seg = F.transform(per_word_units, lambda u: bpe_segment(u, merges))
    n_chars = F.aggregate(per_word_units, F.lit(0),
                          lambda a, u: a + F.size(u))
    n_bpe = F.aggregate(seg, F.lit(0), lambda a, u: a + F.size(u))
    return (docs.filter(F.col(text_col).isNotNull())
            .select(
                F.col(id_col),
                F.size(words).cast("long").alias("n_words"),
                n_chars.cast("long").alias("n_char_units"),
                n_bpe.cast("long").alias("n_bpe_units"),
                F.round(n_bpe / n_chars, 6).alias("compression"))
            .filter(F.col("n_words") > 0))
