"""Deduplication operators for training-data pipelines.

Exact dedup, MinHash+LSH near-dup, SimHash, and n-gram Jaccard — the
standard large-corpus dedup ladder.  All Spark-side logic is built-in
higher-order functions (transform/filter/aggregate over arrays) inside
whole-stage codegen: signatures are computed WITHOUT exploding shingles
(an explode would multiply the shuffle by shingle count; at 100 TB
that's the difference between shuffling 100 TB and shuffling ~1 KB of
signature per document).

Hashing uses ``portable_hash64`` (md5-based) so every step is
reproducible cross-engine and oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import scoped_persist
from ..functions import portable_hash64


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array, built by index arithmetic over the
    token array (no explode).  Docs shorter than n yield the whole
    text as a single shingle."""
    toks = _tokens(text)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    # try_element_at: docs shorter than n index past the token array;
    # the NULLs are skipped by concat_ws, leaving the whole text as the
    # single shingle (plain element_at would throw at runtime).
    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", *[F.try_element_at(toks, (i + j).cast("int"))
                                     for j in range(n)]),
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate clustering: group by content hash, keep the
    smallest id as survivor.  Grouping on the 60-bit content hash (not
    the full text) keeps shuffle rows small — the standard trick when
    documents are MBs.  Output: one row per distinct content."""
    h = portable_hash64(F.col(text_col)).alias("content_hash")
    return (
        docs.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).cast("long").alias("keep_doc_id"),
             F.count(F.lit(1)).cast("long").alias("n_copies"))
    )


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", gram_chars: int = 8,
                        window: int = 4) -> DataFrame:
    """WINNOWING fingerprint selection (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003): hash every ``gram_chars``-length character window of
    the document, then select the MINIMUM hash of each ``window``
    consecutive hashes.  The winnowing guarantee: any substring match
    of length ≥ ``gram_chars + window − 1`` between two documents
    yields at least one SHARED selected fingerprint — which makes the
    selected set the scalable stand-in for suffix-array substring
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL 2022: exact duplicated SPANS, not just
    whole-document near-dups).

    r12: like ``minhash_signatures``/``simhash``, the per-position
    work runs as ORDINARY expressions over an exploded position
    row-stream instead of array-HOF folds — the old form paid TWO
    interpreted passes (a ``transform`` lambda per md5, then a
    ``slice`` allocation + ``array_min`` per window position), where
    explode → md5 → sliding ``MIN OVER (ORDER BY pos ROWS window-1
    PRECEDING)`` stays in whole-stage codegen end to end (guide §4.1).
    The explode multiplies rows only inside the stage: on an
    id-distributed input (the registry corpus) the window and the
    final distinct reuse that partitioning, so the plan adds a local
    sort and NO exchange; an arbitrary caller pays one (id, pos, hash)
    exchange — the same grain the old form's final ``distinct``
    shuffled.  Output is the DISTINCT ``(doc_id, fp)`` set,
    ~len/window rows per document (the density bound winnowing
    guarantees).  Hashes are the portable md5 construction, so an
    ANSI engine reproduces every selected print exactly.

    Selection semantics (bit-identical to the historical fold): with
    ``n`` gram hashes, full windows ``j = 1..n-window+1`` each select
    their minimum — at row position ``p >= window`` the trailing
    window ``[p-window+1, p]`` IS window ``j = p-window+1``; a doc
    shorter than ``window`` grams keeps the single minimum of all its
    hashes — the row ``p = n`` with ``p >= least(window, n)``."""
    from pyspark.sql import Window

    text = F.col(text_col)
    n = F.greatest(F.length(text) - F.lit(gram_chars - 1), F.lit(1))
    ex = docs.select(
        F.col(id_col), n.alias("__n"),
        F.explode(F.sequence(F.lit(1), n)).alias("__p"),
        text.alias("__txt"))
    h = portable_hash64(
        F.col("__txt").substr(F.col("__p"), F.lit(gram_chars)), salt="wf|")
    w = (Window.partitionBy(id_col).orderBy("__p")
         .rowsBetween(-(window - 1), Window.currentRow))
    return (ex.select(F.col(id_col), F.col("__n"), F.col("__p"),
                      h.alias("__h"))
            .select(F.col(id_col), F.col("__n"), F.col("__p"),
                    F.min("__h").over(w).alias("fp"))
            .filter(F.col("__p") >= F.least(F.lit(window), F.col("__n")))
            .select(F.col(id_col), "fp")
            .distinct())


def duplicate_span_pairs(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", gram_chars: int = 8,
                         window: int = 4, min_shared: int = 2,
                         max_bucket: int = 32) -> DataFrame:
    """Cross-document duplicated-SPAN detection over winnowed
    fingerprints: documents sharing ``min_shared`` selected prints
    share (with the winnowing guarantee per print) duplicated
    substrings of ≥ ``gram_chars + window − 1`` characters — the
    copy-paste/boilerplate relation document-level near-dup misses.

    Shape at 100 TB: fingerprints whose posting list exceeds
    ``max_bucket`` documents are DROPPED before pairing (ubiquitous
    boilerplate would otherwise explode the join quadratically — the
    same cap discipline as the LSH band join), so pair generation is
    Σ bounded-bucket² work, never an all-pairs product.  Output:
    ``(doc_a, doc_b, n_shared)`` with ``doc_a < doc_b``."""
    # the fingerprint table has THREE consumers below (the posting-
    # list size aggregate and both sides of the pairing join); without
    # materialization each one re-runs the winnowing selection — the
    # most expensive per-document pass in the dedup family (one md5
    # per character position).  Persist the (doc, fp) set instead:
    # ~len/window 16-byte rows per document, the density bound
    # winnowing guarantees (r11: measured 5.8 s → 2.1 s at sf0.1,
    # identical 1,313-pair output; session-scoped, released by the
    # registry before the next query).  Sizing at extreme scale (r12):
    # len/window · 16 B ≈ corpus_bytes · 16/window — ~4 TB cached per
    # 100 TB of text at window 8 — so the level is pinned to
    # MEMORY_AND_DISK explicitly: overflow spills to local disk
    # instead of evicting hot blocks, and the cache still beats three
    # md5-per-character recomputes by an order of magnitude.
    from pyspark.storagelevel import StorageLevel
    fps = scoped_persist(winnow_fingerprints(docs, text_col, id_col,
                                             gram_chars, window),
                         StorageLevel.MEMORY_AND_DISK)
    sized = (fps.groupBy("fp")
             .agg(F.count(F.lit(1)).alias("__n"))
             .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket))
             .select("fp"))
    ok = fps.join(sized, "fp")
    a = ok.select(F.col("fp"), F.col(id_col).alias("doc_a"))
    b = ok.select(F.col("fp"), F.col(id_col).alias("doc_b"))
    return (a.join(b, "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       shingle_n: int = 3,
                       hash_fn: str = "portable") -> DataFrame:
    """MinHash signature matrix: for each of ``num_hashes`` seeded hash
    functions, the minimum hash over the document's shingle set.

    Entirely map-side (per-row array expressions, zero shuffle); at
    cluster scale this pipelines with the parquet scan.  Columns:
    ``mh_0 .. mh_{k-1}``.

    ``hash_fn``: ``"portable"`` = md5-based ``portable_hash64`` so the
    signature VALUES are reproducible in ANSI SQL (the oracle-checked
    path); ``"fast"`` = ``xxhash64`` right-shifted to 59 bits — ~an
    order of magnitude cheaper per shingle (no hex-string conv), the
    production path when signatures are an internal LSH detail.

    Precondition: ``id_col`` is unique (one row per document) — the
    r11 explode + groupBy(id) form aggregates over ALL rows sharing an
    id, so duplicate ids would merge into one combined-shingle
    signature where the historical per-row fold emitted one row each.
    The corpus registry guarantees this; ``_bucket_pairs`` guards the
    analogous duplicate-id hazard on the pairing side.
    """
    # Kirsch-Mitzenmacher combination h1 + s*h2 with 60-bit hashes:
    # 8*2^60 = 2^63 is the signed-64 overflow edge, so k > 8 would wrap
    # negative in Spark while a HUGEINT-promoting oracle would not.
    if num_hashes > 8:
        raise ValueError(
            f"num_hashes={num_hashes} > 8 overflows the 64-bit "
            "double-hash combination; use more bands instead")
    sh = shingles(F.col(text_col), shingle_n)

    # Two efficiency choices that matter at corpus scale:
    #  - Kirsch-Mitzenmacher double hashing: hash function i is
    #    h1 + i*h2, so each shingle costs one md5 digest (sliced into
    #    both 60-bit halves) or 2 xxhash64 calls instead of k hashes
    #    (59/60-bit values: h1 + 7*h2 < 2^63 — no overflow).
    #  - r11: the per-shingle hashing runs as ORDINARY expressions
    #    over an exploded shingle row-stream, not inside an array-HOF
    #    fold — higher-order-function lambdas are interpreted
    #    (CodegenFallback), so the old fold paid interpreted eval +
    #    two array allocations per shingle, while explode → hash →
    #    partial-MIN aggregation stays in whole-stage codegen with
    #    codegen-level common-subexpression elimination sharing the
    #    one md5 digest between h1/h2 (measured ~10-15% per signature
    #    pass at sf0.1, bit-identical both hash families).  The
    #    explode multiplies rows only INSIDE the stage: the partial
    #    aggregate collapses each task's docs to k minima before any
    #    exchange, so the shuffle (none at all when the input is
    #    already hash-distributed by id, as the registry corpus is)
    #    carries doc-grain rows, never shingle-grain.
    #  - LEAST(sentinel, MIN(..)) reproduces the historical fold
    #    init exactly: h1 + s·h2 can exceed 2^62 for s ≥ 6, and the
    #    fold's sentinel clipped those — the oracle-checked values
    #    keep that clip.
    sentinel = F.lit(1 << 62).cast("long")
    ex = docs.select(F.col(id_col), F.explode(sh).alias("__sh"))
    x = F.col("__sh")
    if hash_fn == "portable":
        # one md5 digest per shingle, sliced into two independent
        # 60-bit halves (chars 1-15 and 17-31 of the 32-hex digest);
        # codegen CSE evaluates the digest once for both slices
        d = F.md5(F.concat(F.lit("mh|"), x))
        h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long")
        h2 = F.conv(F.substring(d, 17, 15), 16, 10).cast("long")
    elif hash_fn == "fast":
        h1 = F.shiftrightunsigned(F.xxhash64(F.lit("mh1"), x), 5)
        h2 = F.shiftrightunsigned(F.xxhash64(F.lit("mh2"), x), 5)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    # shingles() never yields an empty array (short/null docs collapse
    # to one shingle), so the explode drops no document
    return ex.groupBy(id_col).agg(
        *[F.least(sentinel, F.min(h1 + F.lit(s) * h2)).alias(f"mh_{s}")
          for s in range(num_hashes)])


def _cap_buckets(buckets: DataFrame, keys: list[str],
                 max_bucket: int | None) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket`` members before
    pairing.  A mega-bucket (boilerplate text hashing identically, a
    degenerate band) produces O(bucket²) candidate pairs — the one
    quadratic blow-up a banded design still allows; at corpus scale the
    cap bounds any single bucket's contribution.  The aggregate runs on
    the (doc, band) table — ``bands`` small rows per doc — so the extra
    pass is negligible next to the pairing join it protects."""
    if max_bucket is None:
        return buckets
    ok = (buckets.groupBy(*keys)
          .agg(F.count(F.lit(1)).alias("__bucket_n"))
          .filter(F.col("__bucket_n") <= max_bucket)
          .drop("__bucket_n"))
    return buckets.join(ok, keys, "left_semi")


def _bucket_pairs(buckets: DataFrame, keys: list[str], id_col: str,
                  max_bucket: int | None) -> DataFrame:
    """Candidate pairs from a (member, *bucket-keys) table: drop
    over-cap buckets FIRST with the constant-state count + semi-join
    pass (``_cap_buckets`` — the collect_list below materializes a
    whole bucket's member array in one aggregation buffer, so the cap
    must bound memory BEFORE that, not just prune pair output after),
    then ONE groupBy collects each surviving bucket's sorted distinct
    members and upper-triangle pairs generate map-side.
    ``array_distinct`` guards duplicate member ids (a re-ingested or
    unioned corpus): a repeated id would otherwise pair with itself.

    With a cap, the band table has THREE consumers (the cap's count
    aggregate, its semi-join probe side, and the pairing groupBy), so
    it is persisted here — otherwise the whole upstream
    shingle/signature pipeline would recompute per consumer (round-3
    advisory; the cache is session-scoped and released by the registry
    before the next query).  Uncapped, the single consumer needs no
    materialization.

    r11: the persisted band table is REPARTITIONED BY THE BUCKET KEYS
    first, so the cap's count aggregate and the pairing collect both
    reuse that one exchange (cached plans keep their output
    partitioning) instead of each shuffling the band table themselves
    — one band-grain shuffle instead of two, same pair set (measured
    2.08 s → 1.65 s for candidate generation at sf0.1).
    """
    if max_bucket is not None:
        buckets = scoped_persist(
            buckets.repartition(*[F.col(k) for k in keys]))
    buckets = _cap_buckets(buckets, keys, max_bucket)
    grouped = (buckets.groupBy(*keys)
               .agg(F.array_distinct(F.array_sort(F.collect_list(id_col)))
                    .alias("ids"))
               .filter(F.size("ids") >= 2))
    n = F.size(F.col("ids"))
    # upper triangle: element i pairs with every LATER element — the
    # (element, index) 2-arg transform lambda is the documented Spark
    # HOF form (elsewhere the unary form is mandatory)
    combos = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2, n),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    return (grouped.select(F.explode(combos).alias("p"))
            .select(F.col("p.a").alias("doc_a"),
                    F.col("p.b").alias("doc_b"))
            .distinct())


def band_table(signatures: DataFrame, id_col: str = "doc_id",
               num_hashes: int = 8, bands: int = 4,
               band_key: str = "hash") -> DataFrame:
    """Explode a MinHash signature table to its LSH band buckets:
    (id, band_idx, band_hash), ``bands`` rows per document.

    ``band_key``: ``"hash"`` buckets on ``xxhash64`` of the band's
    signature rows (cheap JVM hash — right whenever the bucket id is
    internal); ``"raw"`` buckets on the concatenated signature values
    themselves, reproducible in ANSI SQL for the oracle-checked
    pipeline (same candidates, engine-independent).
    """
    rows_per_band = num_hashes // bands

    def band_val(b: int):
        cols = [F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        if band_key == "hash":
            return F.xxhash64(F.lit(b), *cols).cast("string")
        if band_key == "raw":
            return F.concat_ws("|", *[c.cast("string") for c in cols])
        raise ValueError(f"unknown band_key {band_key!r}")

    band_cols = [
        F.struct(F.lit(b).alias("band_idx"), band_val(b).alias("band_hash"))
        for b in range(bands)
    ]
    return (
        signatures.select(F.col(id_col),
                          F.explode(F.array(*band_cols)).alias("band"))
        .select(id_col, "band.band_idx", "band.band_hash")
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        num_hashes: int = 8, bands: int = 4,
                        band_key: str = "hash",
                        max_bucket: int | None = 1000) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows, hash each band, and emit candidate pairs
    of documents sharing any band bucket.

    Scale shape: explode to (doc, band, band_hash) — ``bands`` rows per
    doc (``band_table``) — then the single-pass per-bucket pairing of
    ``_bucket_pairs``: over-cap buckets dropped by a constant-state
    count pass first (memory bound), one groupBy collects each
    surviving bucket's member array, upper-triangle pairs generate
    map-side.  vs the equivalent bucket self-join this is one shuffle
    of the band table instead of two — measured ~40% faster end-to-end
    at sf0.1 with an identical pair set.  The band table itself is
    persisted inside ``_bucket_pairs`` whenever a cap is set (three
    consumers there).  Per-bucket pair fan-out is
    O(``max_bucket``²)-bounded.
    """
    buckets = band_table(signatures, id_col, num_hashes, bands, band_key)
    return _bucket_pairs(buckets, ["band_idx", "band_hash"], id_col,
                         max_bucket)


def cross_corpus_neardup(corpus: DataFrame, reference: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         num_hashes: int = 8, bands: int = 4,
                         threshold: float = 0.5,
                         hash_fn: str = "portable",
                         band_key: str = "raw",
                         max_bucket: int | None = 1000) -> DataFrame:
    """Near-duplicate decontamination against a REFERENCE corpus (eval
    benchmarks, a licensed-content blocklist, a previous training mix):
    every corpus document is scored by its best shingle-Jaccard against
    any reference document it shares an LSH band bucket with.

    The exact-overlap sibling (``textstats.contamination_check``)
    catches verbatim n-gram leaks; this catches paraphrase-level
    near-dups the way corpus-vs-corpus dedup is actually run — as a
    band JOIN against the reference, never a corpus self-join.

    Scale shape: the reference is small by construction (benchmarks are
    MBs, corpora TBs), so its band table is broadcast; the corpus side
    is one map-side signature pass + the band join, with corpus-side
    buckets above ``max_bucket`` dropped first (identical short/
    boilerplate docs share one signature — without the cap that bucket
    alone yields |bucket|×|ref-bucket| candidates).  Verification
    shingles only candidate docs (``jaccard_pairs`` semi-join), each
    side against ITS OWN corpus — the two id spaces may overlap.  Docs
    with no candidate are reported with sentinel (-1, 0.0, false) —
    null-free canonical output.

    Output: (doc_id, best_ref_id, best_jaccard, flagged) at corpus
    grain; ties on jaccard break to the smallest reference id.
    """
    sig_kw = dict(num_hashes=num_hashes, hash_fn=hash_fn)
    sigs_c = minhash_signatures(corpus, text_col, id_col, **sig_kw)
    sigs_r = minhash_signatures(reference, text_col, id_col, **sig_kw)
    bc = band_table(sigs_c, id_col, num_hashes, bands, band_key)
    bc = _cap_buckets(bc, ["band_idx", "band_hash"], max_bucket)
    br = band_table(sigs_r, id_col, num_hashes, bands, band_key)
    cand = (
        bc.join(F.broadcast(br.withColumnRenamed(id_col, "__ref_id")),
                ["band_idx", "band_hash"])
        .select(F.col(id_col).alias("doc_a"),
                F.col("__ref_id").alias("doc_b"))
        .distinct()
    )
    ver = jaccard_pairs(corpus.select(id_col, text_col), cand,
                        text_col, id_col,
                        docs_b=reference.select(id_col, text_col))
    best = ver.groupBy("doc_a").agg(
        F.max_by(F.struct(F.col("doc_b"), F.col("jaccard")),
                 F.struct(F.col("jaccard").alias("j"),
                          (-F.col("doc_b")).alias("t"))).alias("b"))
    # `best` is corpus-grain (one row per corpus doc with any LSH
    # candidate) — in the heavily-contaminated case it approaches
    # |corpus| rows, so it must NOT carry a broadcast hint; only the
    # reference-side band table above is small by construction.  Leave
    # the strategy to the planner/AQE.
    return (
        corpus.select(F.col(id_col).cast("long").alias(id_col))
        .join(best, F.col(id_col) == F.col("doc_a"), "left")
        .select(
            id_col,
            F.coalesce(F.col("b.doc_b"), F.lit(-1)).cast("long")
            .alias("best_ref_id"),
            F.coalesce(F.col("b.jaccard"), F.lit(0.0)).cast("double")
            .alias("best_jaccard"),
            (F.coalesce(F.col("b.jaccard"), F.lit(0.0)) >= threshold)
            .alias("flagged"),
        )
    )


def jaccard_pairs(docs: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_n: int = 3,
                  threshold: float = 0.0,
                  docs_b: DataFrame | None = None) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard.

    Joins the (small) candidate-pair set back to the docs twice, then
    computes |A∩B| / |A∪B| with array intersection — per-row, no
    explode.  At scale the pair set is ≪ corpus size: shingle sets are
    built ONLY for documents that appear in some candidate pair (the
    semi-join below), so the expensive per-doc work and the join input
    scale with |candidates|, not |corpus| — shingling the whole corpus
    twice would be the dominant cost at 100 TB.

    ``docs_b``: bipartite mode — ``doc_a`` ids resolve against
    ``docs``, ``doc_b`` ids against ``docs_b``.  Required whenever the
    two pair sides come from DIFFERENT corpora whose id spaces may
    overlap (cross-corpus decontamination): a shared id in a unioned
    frame would let one side's text stand in for the other's.
    """
    # the candidate subplan (typically an LSH band self-join) is
    # referenced 3x below (two semi-join id sets + the final join);
    # without materialization each reference re-runs the pairing join —
    # and a lazy persist still races its own copies when the three
    # references land in one job's parallel stages.  Materialize
    # eagerly with a LINEAGE-TRUNCATING localCheckpoint (r11): persist
    # +count kept the full candidate-pipeline plan attached, so every
    # downstream action re-analyzed the whole LSH tree (the dominant
    # driver cost once data is banded — measured 4.99 s → 3.34 s on the
    # sf0.1 face, identical 13,642-pair output); the checkpoint stores
    # the same two-ids-per-row table (tiny at any scale — at cluster
    # scale this is the candidate table an LSH index job writes before
    # verification) and replaces the separate count() job.  On a
    # cluster swap for a reliable checkpoint dir if executor loss must
    # be survivable (same caveat as connected_components below).
    pairs = pairs.localCheckpoint(eager=True)

    def _shingle_side(src: DataFrame, side: str) -> DataFrame:
        ids = pairs.select(F.col(side).alias(id_col)).distinct()
        cand = src.join(ids, id_col, "left_semi")
        sh = cand.select(F.col(id_col),
                         F.array_distinct(shingles(F.col(text_col), shingle_n))
                         .alias("sh"))
        # may be evaluated more than once downstream: materialize;
        # scoped so the next registry query releases it (caching.py)
        return scoped_persist(sh)

    if docs_b is None:
        # self-join mode: ids from BOTH sides resolve in the one corpus
        cand_ids = (pairs.select(F.col("doc_a").alias(id_col))
                    .union(pairs.select(F.col("doc_b").alias(id_col)))
                    .distinct())
        cand_docs = docs.join(cand_ids, id_col, "left_semi")
        sh = scoped_persist(cand_docs.select(
            F.col(id_col),
            F.array_distinct(shingles(F.col(text_col), shingle_n))
            .alias("sh")))
        sh_a = sh_b = sh
    else:
        sh_a = _shingle_side(docs, "doc_a")
        sh_b = _shingle_side(docs_b, "doc_b")
    out = (
        pairs.join(sh_a.select(F.col(id_col).alias("doc_a"),
                               F.col("sh").alias("sh_a")), "doc_a")
        .join(sh_b.select(F.col(id_col).alias("doc_b"),
                          F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("n_common",
                    F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn("n_union",
                    (F.size("sh_a") + F.size("sh_b") - F.col("n_common"))
                    .cast("long"))
        .withColumn("jaccard",
                    F.round(F.col("n_common") / F.col("n_union"), 6))
        .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


SIMHASH_BITS = 60        # full width of portable_hash64 (60-bit md5 prefix)
SIMHASH_BAND_BITS = 10   # 6 bands × 10 bits over the 60-bit fingerprint


def simhash_pairs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", bits: int = SIMHASH_BITS,
                  max_hamming: int = 3,
                  max_bucket: int | None = 1000) -> DataFrame:
    """SimHash near-dup pairs: band the fingerprint into 10-bit bands,
    pair documents sharing ANY band, verify Hamming distance ≤
    ``max_hamming`` via bit_count(xor).

    Banding is the same LSH recall trade as MinHash banding: with 6
    bands over 60 bits, any pair at hamming ≤ 5 shares a band
    (pigeonhole) — so the ``max_hamming``-verified output has full
    recall; wider distances are probabilistic.  60-bit fingerprints
    give 2^10 buckets per band: at 16 bits (round-1 shape) the 2^8
    byte-buckets saturate on any real corpus and candidate generation
    degenerates toward all-pairs.  Buckets above ``max_bucket`` are
    dropped before pairing (boilerplate-corpus guard).  The fingerprint
    table is persisted — 8 bytes/doc — because the Hamming
    verification joins reuse it on both pair sides.
    """
    sigs = scoped_persist(simhash(docs, text_col, id_col, bits))
    n_bands = bits // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_cols = [
        F.struct(F.lit(b).alias("band_idx"),
                 F.shiftright("simhash", b * SIMHASH_BAND_BITS)
                 .bitwiseAND(F.lit(mask)).alias("band_val"))
        for b in range(n_bands)
    ]
    buckets = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, "b.band_idx", "b.band_val")
    cand = _bucket_pairs(buckets, ["band_idx", "band_val"], id_col,
                         max_bucket)
    sa = sigs.select(F.col(id_col).alias("doc_a"),
                     F.col("simhash").alias("sim_a"))
    sb = sigs.select(F.col(id_col).alias("doc_b"),
                     F.col("simhash").alias("sim_b"))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("hamming",
                    F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
                    .cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "sim_a", "sim_b", "hamming")
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint: per bit position, majority vote of token
    hash bits; near-duplicates differ in few bits (Hamming).

    r11: like ``minhash_signatures``, the per-token work runs as
    ORDINARY expressions over an exploded token row-stream instead of
    an array-HOF fold — the fold expanded each token hash to a
    ``bits``-wide array and zip-added it under interpreted evaluation
    (CodegenFallback), where explode → ``bits`` conditional SUM
    aggregates stays in whole-stage codegen (measured 3.2 s → 1.75 s
    at sf0.1, bit-identical).  The explode multiplies rows only
    inside the stage: the partial aggregate collapses to one
    ``bits``-counter row per document before any exchange (none at
    all on an id-distributed input).  ``explode_outer`` keeps
    NULL-text documents in the output with the same all-zero
    fingerprint the fold's null-propagating majority vote produced.
    ``bits`` ≤ 60 — the usable width of ``portable_hash64`` — keeps
    the value a plain BIGINT in any engine.

    Precondition: ``id_col`` is unique (one row per document) — the
    groupBy(id) vote merges all rows sharing an id into one combined
    fingerprint (see the same note on ``minhash_signatures``).
    """
    toks = _tokens(F.col(text_col))
    ex = docs.select(F.col(id_col), F.size(toks).alias("__n"),
                     F.explode_outer(toks).alias("__t"))
    h = portable_hash64(F.col("__t"), salt="sim|")
    counts = ex.groupBy(id_col).agg(
        F.first("__n").alias("__n"),
        *[F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1))).alias(f"__c{b}")
          for b in range(bits)])
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"__c{b}") * 2 > F.col("__n"),
                      F.lit(1 << b).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return counts.select(F.col(id_col),
                         fingerprint.cast("long").alias("simhash"))


def connected_components(pairs: DataFrame, id_a: str = "doc_a",
                         id_b: str = "doc_b",
                         max_iters: int = 25) -> DataFrame:
    """Duplicate-cluster labels over a near-dup pair list: iterative
    min-label propagation until fixpoint (each node adopts the
    smallest id reachable through the pair graph).  Returns
    ``(node, cluster_id)`` for every node that appears in a pair —
    singletons are absent, callers COALESCE to the node's own id.

    Scale notes: each round is one shuffle keyed by node (edges join
    labels + min-agg).  Rounds needed = graph diameter; near-dup
    clusters are dense and shallow (diameter ≤ 3-4 in practice:
    SRR/FineWeb-style dedup reports star-shaped clusters), so this
    converges in a handful of rounds where the alternating
    large-star/small-star formulation (Kiveris et al., "Connected
    Components in MapReduce") would be needed for adversarial
    long-chain graphs.  Each round's result is LINEAGE-TRUNCATED with
    an eager ``localCheckpoint`` — ``persist`` alone keeps the logical
    plan, and an iterative plan embeds the previous round's tree twice
    per round (labels appears on both union branches) plus the whole
    upstream candidate pipeline, so optimizer time on the driver grows
    exponentially with rounds (measured: 18 s → 70 s/round by round 2
    on a 24-edge graph).  On a cluster swap ``localCheckpoint`` for a
    reliable ``checkpoint`` dir — local checkpoint blocks don't
    survive executor loss.  The convergence probe is a LIMIT-1 count
    on changed labels, not a collect.

    Block release: checkpointed rounds have NO lineage, so an eager
    unpersist would make a still-referenced frame unrecomputable —
    intermediate rounds are instead dropped by the ContextCleaner as
    their Python/JVM references die each iteration.  The retained
    footprint is bounded and tiny regardless: each round's block set
    is the (node, label) long-pair table, ≤ max_iters of them,
    independent of corpus width.
    """
    edges = (
        pairs.select(F.col(id_a).cast("long").alias("src"),
                     F.col(id_b).cast("long").alias("dst"))
        .union(pairs.select(F.col(id_b).cast("long").alias("src"),
                            F.col(id_a).cast("long").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # truncate the candidate pipeline
    )
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iters):
        nbr = (edges.join(labels, edges["src"] == labels["node"])
               .select(F.col("dst").alias("node"), F.col("label")))
        new_labels = (
            labels.select("node", "label").union(nbr)
            .groupBy("node").agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True))
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_keep_one(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Keep-one canonical dedup: cluster near-dup pairs with
    ``connected_components``, then for every document report its
    cluster, the cluster size, and whether it is the kept
    representative (smallest id — deterministic).  Documents in no
    pair are their own singleton cluster and always kept.

    The cluster label table is ≤ |docs| tiny rows (id, label), so the
    join back to the corpus broadcasts at any realistic dup rate; the
    per-cluster size/min rolls up on the label table BEFORE touching
    the corpus (agg-below-join).
    """
    cc = connected_components(pairs, id_a="doc_a", id_b="doc_b")
    sizes = (cc.groupBy("cluster_id")
             .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"),
                  F.min("node").cast("long").alias("keep_id")))
    labeled = (cc.join(sizes, "cluster_id")
               .select(F.col("node"), F.col("cluster_id"),
                       F.col("cluster_size"), F.col("keep_id")))
    return (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(F.broadcast(labeled),
              F.col(id_col) == F.col("node"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col))
            .cast("long").alias("cluster_id"),
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long").alias("cluster_size"),
            (F.coalesce(F.col("keep_id"), F.col(id_col)) == F.col(id_col))
            .alias("is_kept"),
        )
    )
