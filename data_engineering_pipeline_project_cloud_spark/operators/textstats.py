"""Text-analysis operators: quality scoring, token counts, language ID,
document fingerprinting.

All built-in column expressions (split/filter/transform/aggregate) —
JVM-side, no Python in the hot path.  At 100 TB these run as pure
map-side projections pipelined with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash64

#: Tiny embedded stopword lists for the n-gram/stopword language
#: heuristic.  Deliberately small and literal so the same lists can be
#: inlined into oracle SQL.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "es"],
    "fr": ["le", "la", "de", "et", "que", "en", "est"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def text_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: char/token counts, distinct-token
    ratio (repetition detector), mean token length, stopword ratio,
    digit/punct density — the standard cheap quality filters."""
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_char = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(text_col, r"[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(text_col, r"[^0-9]", ""))
    stop_hits = F.size(F.filter(
        toks, lambda w: F.lower(w).isin(STOPWORDS["en"])))
    return docs.select(
        F.col(id_col),
        n_char.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n_tok, 6).alias("distinct_ratio"),
        F.round((n_char - (n_tok - 1)) / n_tok, 6).alias("mean_token_len"),
        F.round(stop_hits / n_tok, 6).alias("stopword_ratio"),
        F.round(n_alpha / n_char, 6).alias("alpha_ratio"),
        F.round(n_digit / n_char, 6).alias("digit_ratio"),
    )


#: BPE-ish pre-tokenizer: letter runs, single digits, single
#: punctuation marks — the GPT-2-family pre-split shape, kept simple
#: enough to inline into ANSI-SQL oracles (RE2/Java-regex compatible).
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-style
    estimate (pre-tokenize with ``BPE_PRETOKEN_RE``, then ~4 chars per
    subword inside each letter run).  Map-side only."""
    text = F.col(text_col)
    ws = _tokens(text)
    pre = F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))
    est = F.aggregate(
        pre, F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4))
    return docs.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(pre).cast("long").alias("n_pretokens"),
        est.alias("est_bpe_tokens"),
        F.round(F.length(text) / est, 6).alias("chars_per_bpe_token"),
    )


def _quality_signals(text_col: str = "text") -> dict[str, Column]:
    """The five raw quality signals (unrounded) — single source for
    ``quality_score`` and ``quality_expr``; a tweak to any signal
    changes every consumer identically."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    stop_hits = F.size(F.filter(
        toks, lambda w: F.lower(w).isin(STOPWORDS["en"])))
    return {
        "length_score": F.least(n_tok.cast("double") / 100.0, F.lit(1.0)),
        "stopword_score": F.least(
            stop_hits.cast("double") / n_tok * 5.0, F.lit(1.0)),
        "alpha_score": n_alpha.cast("double") / n_char,
        "repetition_score":
            F.size(F.array_distinct(toks)).cast("double") / n_tok,
        "digit_score": F.lit(1.0) - n_digit.cast("double") / n_char,
    }


def _quality_mean(sig: dict[str, Column]) -> Column:
    return sum(sig.values(), F.lit(0.0)) / float(len(sig))


def quality_expr(text_col: str = "text") -> Column:
    """The composite quality signal as a bare column expression
    (rounded to 6 places), for operators that need quality alongside
    other per-doc columns in ONE scan (e.g. token-budget selection —
    joining ``quality_score``'s output back would scan the corpus
    twice)."""
    return F.round(_quality_mean(_quality_signals(text_col)), 6)


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Composite document quality score in [0, 1]: mean of five cheap
    signals (length saturation, stopword density, alphabetic fraction,
    repetition via distinct-token ratio, digit penalty) — the standard
    pre-training corpus filter, all in codegen."""
    sig = _quality_signals(text_col)
    quality = _quality_mean(sig)
    return docs.select(
        F.col(id_col),
        *[F.round(c, 6).alias(name) for name, c in sig.items()],
        F.round(quality, 6).alias("quality"),
        (quality >= 0.7).alias("passes_filter"),
    )


def normalize_text(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Pre-tokenization text canonicalization: control characters →
    space, whitespace runs collapsed to one space, ends trimmed — the
    cleanup that makes downstream token counts, shingles, and hashes
    insensitive to formatting noise.  Pure map-side regexps in
    codegen; ``changed`` flags rows the cleanup touched (the usual
    monitoring signal for upstream extraction regressions)."""
    text = F.col(text_col)
    cleaned = F.trim(F.regexp_replace(
        F.regexp_replace(text, r"[\x00-\x1F\x7F]", " "), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        cleaned.alias("norm_text"),
        F.length(text).cast("long").alias("n_chars_before"),
        F.length(cleaned).cast("long").alias("n_chars_after"),
        (cleaned != text).alias("changed"))


def inverted_index(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_postings: int = 20) -> DataFrame:
    """Token → posting-list index build: one row per distinct
    lowercase token with its document frequency and the first
    ``max_postings`` doc ids (ascending, pipe-joined — harnesses
    serialize arrays inconsistently, so the sample is a string).

    The cap is applied BEFORE collecting: rows are ranked inside each
    token's partition and filtered, so ``collect_list`` never holds
    more than ``max_postings`` ids — a stop-word token at corpus scale
    would otherwise accumulate millions of ids into one aggregation
    buffer.  Doc frequency comes from a partition-wide count in the
    same window pass (no second aggregation over the full pair set).
    Skew note: each hot token still sorts on one partition; at 100 TB
    either pre-filter a stop-list or split hot tokens by doc-id range
    and merge counts.
    """
    from pyspark.sql import Window

    pairs = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(F.array_distinct(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")))
        .alias("token"))
    w = Window.partitionBy("token")
    ranked = pairs.select(
        "token", id_col,
        F.row_number().over(w.orderBy(F.col(id_col).asc())).alias("__rn"),
        F.count(F.lit(1)).over(w).alias("__df"))
    return (ranked.filter(F.col("__rn") <= max_postings)
            .groupBy("token")
            .agg(F.first("__df").cast("long").alias("doc_freq"),
                 F.array_join(F.sort_array(F.collect_list(id_col)), "|")
                 .alias("posting_sample")))


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language heuristic: count hits against each
    language's stopword list; argmax with deterministic tie-break
    (higher hits, then language code ascending); 'und' when no list
    scores > 0."""
    toks = _tokens(F.lower(F.col(text_col)))

    def hit_count(words: list[str]):  # unary HOF lambda via closure
        return F.size(F.filter(toks, lambda w: w.isin(words)))

    hits = {lang: hit_count(ws) for lang, ws in STOPWORDS.items()}
    scored = docs.select(
        F.col(id_col),
        *[hits[lang].cast("long").alias(f"hits_{lang}") for lang in STOPWORDS])
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier lang wins ties → apply last
        pred = F.when((best > 0) & (F.col(f"hits_{lang}") == best),
                      F.lit(lang)).otherwise(pred)
    return scored.withColumn("predicted_lang", pred)


#: Scrub patterns (applied in order): URLs, emails, digit runs.
#: Conservative regexes valid in both Java regex and RE2 so the op is
#: oracle-checkable cross-engine.
SCRUB_RULES = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"[0-9]+", "<NUM>"),
)


def scrub_text(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """PII/noise scrubbing: mask URLs, emails, and digit runs — the
    standard pre-training redaction pass.  Chained regexp_replace in
    codegen; at 100 TB this pipelines with the scan (no shuffle)."""
    clean = F.col(text_col)
    for pat, repl in SCRUB_RULES:
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.length(text_col).cast("long").alias("n_chars_before"),
        F.length(clean).cast("long").alias("n_chars_after"),
        (F.length(clean) - F.length(text_col)).cast("long")
        .alias("delta_chars"),
    )


def chunk_documents(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Sliding-window chunking for training/RAG: split each document
    into ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap``.  Window starts are computed by index
    arithmetic and exploded — one output row per chunk; the token
    array is built once per document."""
    stride = chunk_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # start indices 1, 1+stride, ... while start <= max(n - overlap, 1)
    # (the last window may be short; empty tails beyond n are excluded)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)).cast("int")
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda i: i * stride + 1)
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s, chunk_tokens))
    out = docs.select(
        F.col(id_col),
        n.cast("long").alias("doc_tokens"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_toks"),
    )
    return out.select(
        id_col, "doc_tokens",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
        F.size("chunk_toks").cast("long").alias("chunk_tokens"),
    )


def pack_sequences(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   budget: int = 2048) -> DataFrame:
    """Greedy sequence packing: assign documents (in deterministic id
    order) to training sequences so each sequence holds ~``budget``
    tokens — running token total over the canonical order, sequence id
    = which budget bucket the document's span falls in.  One window
    pass; the global order is a single-reducer sort at this grain
    (documents are pre-aggregated rows, not raw text — fine far beyond
    test scale; shard-parallel packing would partition by hash(doc)
    first and pack within shards)."""
    from pyspark.sql import Window

    toks = F.size(_tokens(F.col(text_col))).cast("long")
    w = Window.orderBy(F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0)
    sized = docs.select(F.col(id_col), toks.alias("n_tokens"))
    with_cum = sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        with_cum.withColumn(
            "seq_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens"))
                    / F.lit(budget)).cast("long"))
        .groupBy("seq_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("seq_tokens"),
             F.min(id_col).alias("first_doc"),
             F.max(id_col).alias("last_doc"))
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", gram_chars: int = 8) -> DataFrame:
    """Document fingerprint via rolling char-n-gram hashing (winnowing
    family): min and max hash over all ``gram_chars``-length character
    windows.  Index arithmetic over the string — no explode; the
    per-row cost is O(len), the shuffle cost is 16 bytes/doc."""
    text = F.col(text_col)
    k = F.greatest(F.length(text) - F.lit(gram_chars - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: text.substr(i, F.lit(gram_chars)))
    hashes = F.transform(grams, lambda g: portable_hash64(g, salt="fp|"))
    return docs.select(
        F.col(id_col),
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.length(text).cast("long").alias("n_chars"),
    )


#: Feature-hashing dimensionality: 2^9 buckets keeps each doc's sparse
#: vector human-inspectable in tests while exercising real collisions.
FEATURE_HASH_DIM = 512


def feature_hash_tf(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    dim: int = FEATURE_HASH_DIM) -> DataFrame:
    """The hashing trick (Weinberger et al., "Feature Hashing for
    Large Scale Multitask Learning", ICML 2009): fixed-dimension
    term-frequency features with NO vocabulary pass — each token maps
    to ``hash(token) mod dim`` and contributes ``±1`` (sign from an
    independent hash bit, which keeps collision noise zero-mean).
    Output is the sparse form ``(doc, bucket, tf)`` with exact-zero
    cancellations dropped.

    100 TB shape: one explode → one partial-aggregating groupBy; no
    vocabulary state, no broadcast, bounded ``dim`` buckets per doc —
    the featurizer that needs no second pass and no driver model.
    Hashes are the portable md5 fold, so an ANSI engine reproduces
    every bucket and sign exactly."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        .alias("token"))
    bucket = F.pmod(portable_hash64(F.col("token"), salt="fh|"),
                    F.lit(dim))
    sign = (F.when(F.pmod(portable_hash64(F.col("token"), salt="fhs|"),
                          F.lit(2)) == 1, 1).otherwise(-1))
    return (toks.groupBy(F.col(id_col), bucket.alias("bucket"))
            .agg(F.sum(sign).cast("long").alias("tf"))
            .filter(F.col("tf") != 0)
            .select(F.col(id_col), F.col("bucket").cast("long"),
                    F.col("tf")))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     top_bigram_max: float = 0.2,
                     dup_5gram_max: float = 0.3) -> DataFrame:
    """Gopher-style repetition filters: the fraction of bigrams taken
    by the single most frequent bigram, and the fraction of 5-gram
    slots occupied by repeats (1 - distinct/total).  Docs breaching
    either limit are flagged ``is_repetitive`` — the standard cheap
    cut for boilerplate / looping-generator text.

    The top-bigram count needs a per-(doc, bigram) frequency, so
    bigrams ARE exploded — but the two-level aggregation partial-
    aggregates map-side and the shuffle rows are (id, bigram-hash-size)
    tuples, collapsing back to doc grain immediately.  The 5-gram
    repeat ratio never explodes: array_distinct over the shingle array,
    map-side.
    """
    from .dedup import shingles

    bg = (docs.select(F.col(id_col),
                      F.explode(shingles(F.col(text_col), 2)).alias("bg"))
          .groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("cnt"))
          .groupBy(id_col)
          .agg(F.sum("cnt").cast("long").alias("n_bigrams"),
               F.max("cnt").cast("long").alias("top_bigram_count")))
    five = docs.select(
        F.col(id_col),
        F.size(shingles(F.col(text_col), 5)).cast("long").alias("n_5grams"),
        F.size(F.array_distinct(shingles(F.col(text_col), 5)))
        .cast("long").alias("n_distinct_5grams"))
    top_frac = F.round(F.col("top_bigram_count") / F.col("n_bigrams"), 6)
    dup_frac = F.round(
        (F.col("n_5grams") - F.col("n_distinct_5grams")) / F.col("n_5grams"), 6)
    return (five.join(bg, id_col)
            .select(F.col(id_col),
                    F.col("n_bigrams"), F.col("top_bigram_count"),
                    top_frac.alias("top_bigram_frac"),
                    dup_frac.alias("dup_5gram_frac"),
                    ((top_frac > top_bigram_max) | (dup_frac > dup_5gram_max))
                    .alias("is_repetitive")))


def contamination_check(docs: DataFrame, eval_docs: DataFrame,
                        gram_n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        flag_threshold: float = 0.5) -> DataFrame:
    """Benchmark-contamination scan: for every training document, the
    fraction of its distinct word n-grams that appear anywhere in the
    held-out ``eval_docs`` set.  Docs at or above ``flag_threshold``
    are flagged for exclusion — the standard decontamination pass run
    before training.

    Scale shape: the eval-set gram table is tiny next to the corpus
    (benchmarks are MBs, corpora are TBs), so it broadcasts and the
    corpus side stays a map-side explode + partial-agg count.  The
    corpus is never shuffled at gram grain against itself.
    """
    from .dedup import shingles

    eval_grams = (eval_docs.select(
        F.explode(F.array_distinct(shingles(F.col(text_col), gram_n)))
        .alias("g")).distinct())
    corpus = docs.select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), gram_n)).alias("gs"))
    hits = (corpus.select(F.col(id_col), F.explode("gs").alias("g"))
            .join(F.broadcast(eval_grams), "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated")))
    rate = F.round(F.col("n_contaminated") / F.col("n_grams"), 6)
    return (corpus.select(F.col(id_col), F.size("gs").cast("long").alias("n_grams"))
            .join(hits, id_col, "left")
            .select(F.col(id_col), F.col("n_grams"),
                    F.coalesce("n_contaminated", F.lit(0)).cast("long")
                    .alias("n_contaminated"))
            .select(F.col(id_col), "n_grams", "n_contaminated",
                    rate.alias("contamination_rate"),
                    (rate >= flag_threshold).alias("flagged")))


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF (natural-log IDF), the
    classic relevance/topic signal for corpus curation.  Tokens are
    lowercased; ties break on the rounded score then token text, so
    the ranking is deterministic cross-engine.

    Shape: one explode to (doc, token) grain, token frequencies and
    document frequencies both hash-aggregate with map-side partials,
    the 1-row corpus count broadcasts, and the final top-k is a
    per-doc window over ≤ distinct-token rows.
    """
    from pyspark.sql import Window

    toks = docs.select(F.col(id_col),
                       F.explode(_tokens(F.lower(F.col(text_col))))
                       .alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("cnt"))
    doc_len = tf.groupBy(id_col).agg(F.sum("cnt").alias("n_tokens"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(doc_len, id_col).join(dfreq, "token")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf", F.round(
                  (F.col("cnt") / F.col("n_tokens"))
                  * F.log(F.col("n_docs") / F.col("df")), 6)))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(id_col), "token", "tfidf",
                    F.col("rank").cast("long").alias("rank")))


def unigram_lm_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Unigram language-model scoring (the CCNet-style perplexity
    quality signal): each document's mean negative log-probability
    under a unigram model, plus the perplexity it implies — low-ppl
    documents look like the corpus at large, high-ppl ones are
    outliers (noise, boilerplate, wrong-language text).

    The model here is fit on the corpus itself (token frequency /
    total tokens — no OOV by construction); in a production pipeline
    the frequency table would come from a held-out reference corpus
    and be loaded as a static table, with Laplace smoothing for OOV —
    the join shape below is identical either way.

    Scale shape: tokens explode once to (doc, token) grain but
    collapse immediately to per-doc term frequencies via a partial-
    aggregated groupBy, so the token→logp join moves distinct
    (doc, token) pairs, not raw token instances.  The frequency table
    is vocab-grain (bounded far below corpus size; Zipf guarantees
    it); the planner/AQE picks broadcast vs shuffle join on it.  The
    1-row total broadcasts.
    """
    from ..caching import scoped_persist

    toks = docs.select(
        F.col(id_col),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("token"))
    # consumed twice (model fit + scoring join): persist the narrow
    # (doc, token, cnt) frame so the corpus text is scanned and
    # exploded ONCE — without it both branches re-run the tokenize
    tf = scoped_persist(
        toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("cnt")))
    freq = tf.groupBy("token").agg(F.sum("cnt").alias("gcnt"))
    total = freq.agg(F.sum("gcnt").alias("total"))
    logp = (freq.crossJoin(F.broadcast(total))
            .select("token",
                    F.log(F.col("gcnt") / F.col("total")).alias("logp")))
    nll = -F.sum(F.col("cnt") * F.col("logp")) / F.sum("cnt")
    return (tf.join(logp, "token")
            .groupBy(id_col)
            .agg(F.sum("cnt").cast("long").alias("n_tokens"),
                 F.round(nll, 6).alias("avg_neg_logp"),
                 F.round(F.exp(nll), 2).alias("unigram_ppl")))


#: Gopher-style rule thresholds, tuned to split the synthetic corpus
#: into mixed outcomes (each rule passes most but not all documents).
#: Literal so the same numbers inline into the oracle SQL.
RULE_THRESHOLDS = {
    "min_tokens": 25,
    "max_tokens": 85,
    "min_mean_token_len": 4.3,
    "max_mean_token_len": 4.75,
    "min_stopword_hits": 2,
    "min_distinct_ratio": 0.35,
}


def rule_filter(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                thresholds: dict | None = None) -> DataFrame:
    """Gopher-style rule-based document filter: hard per-rule pass/
    fail flags (length band, mean-word-length band, minimum stopword
    evidence, repetition via distinct-token ratio) and the AND of all
    of them as ``keep``.  Complements ``quality_score`` (a soft
    composite) — production curation stacks run the hard rules first
    and score only the survivors.

    All signals are integer or exact-rational arithmetic over one
    tokenization, so the flags are bit-identical cross-engine.  Pure
    map-side projection: pipelines with the scan, no shuffle.
    """
    t = dict(RULE_THRESHOLDS, **(thresholds or {}))
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    # mean length of the TOKENS themselves (not char-count minus
    # separator arithmetic, which over-counts when whitespace runs
    # longer than one char)
    tok_chars = F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
    mean_len = tok_chars / n_tok
    stop_hits = F.size(F.filter(
        toks, lambda w: F.lower(w).isin(STOPWORDS["en"])))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    pass_length = ((n_tok >= t["min_tokens"]) & (n_tok <= t["max_tokens"]))
    pass_word_len = ((mean_len >= t["min_mean_token_len"])
                     & (mean_len <= t["max_mean_token_len"]))
    pass_stopwords = stop_hits >= t["min_stopword_hits"]
    pass_repetition = distinct_ratio >= t["min_distinct_ratio"]
    return docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        stop_hits.cast("long").alias("stopword_hits"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        pass_length.alias("pass_length"),
        pass_word_len.alias("pass_word_len"),
        pass_stopwords.alias("pass_stopwords"),
        pass_repetition.alias("pass_repetition"),
        (pass_length & pass_word_len & pass_stopwords & pass_repetition)
        .alias("keep"))


def source_mix(docs: DataFrame, source_col: str = "source",
               lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Per-source corpus mix report: document and token counts, their
    corpus shares, language breadth, and mean document length — the
    table a data-mixing pass starts from when deciding per-source
    sampling weights (up/down-weighting over-represented domains).

    Shape: one hash aggregate over the corpus to source grain with
    map-side partials (token counts are computed in the partial, so
    the shuffle carries per-source sums, not text), then corpus totals
    via an unpartitioned window over the AGGREGATED frame — sources
    are a bounded set, so the single-partition window sees |sources|
    rows, never corpus rows.
    """
    from pyspark.sql import Window

    toks = F.size(_tokens(F.col(text_col)))
    per_src = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.countDistinct(lang_col).cast("long").alias("n_langs"),
        F.sum(F.length(text_col)).cast("long").alias("sum_chars"),
    )
    w = Window.partitionBy()
    return per_src.select(
        F.col(source_col),
        "n_docs",
        "n_tokens",
        "n_langs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6)
        .alias("doc_share"),
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 6)
        .alias("token_share"),
        F.round(F.col("sum_chars") / F.col("n_docs"), 6).alias("avg_chars"),
    )


def nb_classifier_scores(docs: DataFrame, label_col: str = "label",
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Multinomial Naive Bayes quality classifier — train AND score in
    one distributed pipeline (the CCNet/fastText-style learned quality
    signal that production curation stacks layer on top of hard rules:
    weak-label a slice, fit a cheap bag-of-words model, score the
    whole corpus).

    ``docs`` carries a boolean ``label_col`` (the weak label, e.g. the
    Gopher rule filter's ``keep``).  Laplace-smoothed per-class token
    log-probabilities over the GLOBAL vocabulary:
    ``ln((cnt_c(t) + 1) / (N_c + V))``; per-document score per class =
    class log-prior + Σ cnt(t)·logp_c(t).

    Scale shape: tokens explode once and collapse immediately to
    (doc, token, cnt) grain (partial agg); the model is ONE
    vocab-grain table carrying both class counts per token (r11: the
    former vocab × class grid + its left join + the double-matching
    scoring join collapsed into this pivot — same Laplace zeros via
    COALESCE, measured 2.39 s → 1.69 s at sf0.1 with identical
    output, 26 → 18 Spark jobs); class totals and vocab size ride in
    one single-row broadcast; scoring is one join of the
    term-frequency table against the model — corpus-size-independent
    model, corpus-linear scoring pass, no driver-side math.
    ``predicted_pass`` compares the ROUNDED scores so the
    cross-engine boundary is exact.

    Contract: both classes must be present in the weak labels — a
    single-class corpus has nothing to fit (its log-prior degenerates
    to null/-inf; engines disagree on which).
    """
    from ..caching import scoped_persist

    toks = docs.select(
        F.col(id_col), F.col(label_col).alias("__y"),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("token"))
    tf = scoped_persist(
        toks.groupBy(id_col, "__y", "token")
        .agg(F.count(F.lit(1)).alias("cnt")))
    # per-token class counts in ONE row (the pivot of the old
    # vocab × class grid): a (token, class) pair with no occurrences
    # gets the same COALESCE(0) the grid's left join produced, so the
    # Laplace numerator is bit-identical.
    tokstats = tf.groupBy("token").agg(
        F.coalesce(F.sum(F.when(F.col("__y"), F.col("cnt"))), F.lit(0))
        .alias("c_pass"),
        F.coalesce(F.sum(F.when(~F.col("__y"), F.col("cnt"))), F.lit(0))
        .alias("c_fail"))
    totals = tokstats.agg(
        F.sum("c_pass").alias("tot_pass"),
        F.sum("c_fail").alias("tot_fail"),
        F.count(F.lit(1)).alias("v"))
    lbl = F.col(label_col)
    priors = docs.agg(
        F.log(F.count(F.when(lbl, 1)) / F.count(F.lit(1)))
        .alias("prior_pass"),
        F.log(F.count(F.when(~lbl, 1)) / F.count(F.lit(1)))
        .alias("prior_fail"))
    logp_pass = F.log((F.col("c_pass") + 1)
                      / (F.col("tot_pass") + F.col("v")))
    logp_fail = F.log((F.col("c_fail") + 1)
                      / (F.col("tot_fail") + F.col("v")))
    scored = (tf.join(tokstats, "token")
              .crossJoin(F.broadcast(totals))
              .groupBy(id_col)
              .agg(F.sum("cnt").cast("long").alias("n_tokens"),
                   F.sum(F.col("cnt") * logp_pass).alias("__sp"),
                   F.sum(F.col("cnt") * logp_fail).alias("__sf"),
                   F.first("__y").alias("weak_label"))
              .crossJoin(F.broadcast(priors)))
    sp = F.round(F.col("__sp") + F.col("prior_pass"), 6)
    sf = F.round(F.col("__sf") + F.col("prior_fail"), 6)
    return scored.select(
        F.col(id_col), "n_tokens", "weak_label",
        sp.alias("score_pass"), sf.alias("score_fail"),
        (sp >= sf).alias("predicted_pass"))


def prune_rare_tokens(docs: DataFrame, id_col: str, text_col: str,
                      min_fraction: float, unk: str = "<unk>") -> DataFrame:
    """Vocabulary-pruned corpus rewrite (the tokenizer-prep OOV pass):
    every token whose CORPUS frequency is below ``min_fraction`` of
    total tokens is replaced by ``unk``, and each document's text is
    reassembled in original token order.  This is the explode → global
    vocab → broadcast-join → ordered-collapse plan shape shared by all
    rewrite-the-corpus operators: the vocabulary is corpus-grain
    metadata (bounded — real corpora have ~10⁵–10⁷ types against 10¹²
    tokens), so the keep-set broadcasts; the only shuffle is the
    per-document regroup, and ``array_sort(collect_list(struct(pos,
    word)))`` restores order without a per-partition sort.

    Returns ``(id_col, clean_text, n_unk)``.  Tokenization is literal
    single-space split, matching the oracle's ``string_split``.
    """
    import math

    from ..caching import scoped_persist

    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"))
    # vocab-grain and bounded (real corpora: ~1e5-1e7 types against
    # 1e12 tokens) with TWO consumers — the total for the threshold
    # and the keep-set — each of which would otherwise re-explode the
    # whole corpus (r11; the token-instance-grain `words` itself stays
    # unpersisted by design, it is corpus-sized)
    freq = scoped_persist(words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("c")))
    total = freq.agg(F.sum("c")).collect()[0][0] or 0
    threshold = math.ceil(min_fraction * total)
    keep = (freq.filter(F.col("c") >= threshold)
            .select("word", F.lit(1).alias("__keep")))
    tagged = words.join(F.broadcast(keep), "word", "left")
    replaced = F.when(F.col("__keep").isNull(),
                      F.lit(unk)).otherwise(F.col("word"))
    return (tagged
            .select(id_col, "pos", replaced.alias("w"),
                    F.col("__keep").isNull().cast("long").alias("u"))
            .groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("pos", "w"))),
                         lambda x: x["w"]), " ").alias("clean_text"),
                 F.sum("u").cast("long").alias("n_unk")))
