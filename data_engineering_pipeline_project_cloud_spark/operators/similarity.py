"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is actually run on clusters:
 - ``cosine_topk_bruteforce``: exact top-k via broadcast cross join —
   the baseline, correct for any query set that fits in a broadcast.
 - ``lsh_ann_topk``: random-hyperplane LSH bucketing — the scale path.
   Candidates come only from matching buckets, so the cross product
   shrinks from |Q|×|N| to |Q|×bucket.  Hyperplanes are derived
   deterministically from the hash of (plane, dim), so results are
   reproducible without a stored model.

All vector math uses built-in higher-order functions (zip_with /
aggregate) — JVM codegen, no Python UDF, Arrow irrelevant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (deterministic —
    matches an ANSI-SQL list_sum over the same element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(emb: DataFrame, query_ids: list[int], k: int = 5,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Plan: filter the query rows (tiny) → broadcast → cross join against
    the full corpus → per-row cosine → per-query top-k window.  The
    corpus is scanned once, never shuffled except the final k rows per
    query.  Similarity rounded to 6 dp for cross-engine stability, with
    a (sim DESC, candidate ASC) deterministic tie-break.
    """
    from pyspark.sql import Window

    q = F.broadcast(
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")))
    cand = emb.select(F.col(id_col).alias("candidate_id"),
                      F.col(vec_col).alias("cv"))
    sims = (
        q.join(cand, F.col("query_id") != F.col("candidate_id"))
        .select("query_id", "candidate_id",
                F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("candidate_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine_sim",
                F.col("rank").cast("long").alias("rank"))
    )


def _hyperplane_sign(vec: Column, plane: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[d] is a deterministic
    pseudo-random ±1 derived from xxhash64(plane, d).  Built via
    index arithmetic, no stored planes."""
    signed = F.zip_with(
        vec,
        F.transform(F.sequence(F.lit(1), F.size(vec)),
                    lambda d: F.when(
                        F.xxhash64(F.lit(plane), d).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1.0)).otherwise(F.lit(-1.0))),
        lambda x, s: x.cast("double") * s)
    total = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(total >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec: Column, num_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: ``num_planes`` sign bits packed
    into an int.  Vectors in the same bucket are likely cosine-close."""
    acc = F.lit(0)
    for p in range(num_planes):
        acc = acc + _hyperplane_sign(vec, p) * F.lit(1 << p)
    return acc.cast("long")


def lsh_ann_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                 num_planes: int = 6, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (single-probe).  At 100 TB the corpus is written bucketed
    (``partitionBy(bucket)``) so a query touches one partition — this
    function expresses the same plan over the raw table."""
    from pyspark.sql import Window

    bucketed = emb.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(F.col(vec_col), num_planes).alias("bucket"))
    q = F.broadcast(
        bucketed.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                F.col("bucket")))
    cand = bucketed.select(F.col(id_col).alias("candidate_id"),
                           F.col(vec_col).alias("cv"), "bucket")
    sims = (
        q.join(cand, "bucket")
        .filter(F.col("query_id") != F.col("candidate_id"))
        .select("query_id", "candidate_id",
                F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("candidate_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine_sim",
                F.col("rank").cast("long").alias("rank"))
    )


def embedding_norms(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-vector diagnostics: dimension, L2 norm, min/max component —
    the sanity profile run before any similarity job."""
    v = F.col(vec_col)
    return emb.select(
        F.col(id_col),
        F.size(v).cast("long").alias("dim"),
        F.round(_norm(v), 6).alias("l2_norm"),
        F.round(F.array_min(v).cast("double"), 6).alias("min_component"),
        F.round(F.array_max(v).cast("double"), 6).alias("max_component"),
        F.col("label"),
    )
