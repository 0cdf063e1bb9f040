"""Scaling-curve probe (round 9 — VERDICT r8 item 4): measure the
heaviest registry faces at sf0.1 vs a locally synthesized sf1 and
report per-face scaling exponents, the first EMPIRICAL backing for
the 100x plan-shape claims beyond `.explain` inspection.

sf1 synthesis (no network in this container, so DuckDB's tpch
extension is unavailable): deterministic 10x replication of the
driver's sf0.1 parquet with CONSISTENT key offsets — every replica i
shifts each table's primary key AND every foreign key that references
it by ``i * (max_key + 1)`` of the referenced table, so per-key join
cardinalities, group sizes, and selectivities are IDENTICAL to sf0.1
while row volume is 10x.  That is exactly the property a linear-
scaling probe needs (TPC-H's own dbgen also scales entity counts,
not per-key fan-out).  Dimension constants (region, nation) stay 1x,
as in TPC-H at every scale factor.

documents get a per-replica SALT token injected every 8 words: a
verbatim 10x copy would make every document a member of a 10-way
near-duplicate group and blow the MinHash candidate-pair count up
quadratically BY CONSTRUCTION — the salt drops replica-pair shingle
overlap below any banding threshold, so the near-dup workload stays
shaped like the original corpus.  Embeddings perturb one coordinate
per replica for the same reason.

Usage:
    python tools/scale_probe.py [--faces f1,f2,...] [--runs 3]
Writes nothing outside the repo; sf1 lands in .scale_probe/sf1
(gitignored) and is reused across runs.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".scale_probe", "sf1")
FACTOR = 10

DEFAULT_FACES = [
    "master_table",
    "dedup_minhash_pairs",
    "nb_quality_classifier",
    "dsir_importance_weights",
    "q1_pricing_summary",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)

    def off(table: str, key: str) -> int:
        df = spark.read.parquet(f"{SF01}/{table}.parquet")
        return int(df.agg(F.max(key)).collect()[0][0]) + 1

    offs = {t: off(t, k) for t, k in [
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id")]}

    def replicate(table: str, shifts: dict[str, str],
                  extra=None) -> None:
        dst = f"{SF1}/{table}.parquet"
        if os.path.exists(dst):
            return
        src = spark.read.parquet(f"{SF01}/{table}.parquet")
        reps = []
        for i in range(FACTOR):
            r = src
            for col, ref in shifts.items():
                r = r.withColumn(
                    col, (F.col(col) + F.lit(i * offs[ref]))
                    .cast(src.schema[col].dataType))
            if extra is not None:
                r = extra(r, i)
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        tmp = dst + "_dir"
        out.coalesce(max(1, FACTOR // 2)).write.mode(
            "overwrite").parquet(tmp)
        # faces expect one file per table (driver layout); merge via
        # pyarrow and COERCE timestamps back to naive µs — the driver
        # testdata's physical type (TESTDATA/verify gotcha: ns or
        # LTZ-adjusted timestamps break watermarks and epoch casts)
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(tmp)
        fields = [
            pa.field(f.name, pa.timestamp("us"))
            if pa.types.is_timestamp(f.type) else f
            for f in t.schema]
        t = t.cast(pa.schema(fields))
        pq.write_table(t, dst, row_group_size=1 << 20)
        shutil.rmtree(tmp)

    for t in ("region", "nation"):
        dst = f"{SF1}/{t}.parquet"
        if not os.path.exists(dst):
            import shutil

            shutil.copyfile(f"{SF01}/{t}.parquet", dst)

    replicate("customer", {"c_custkey": "customer"})
    replicate("part", {"p_partkey": "part"})
    replicate("supplier", {"s_suppkey": "supplier"})
    replicate("orders", {"o_orderkey": "orders",
                         "o_custkey": "customer"})
    replicate("lineitem", {"l_orderkey": "orders",
                           "l_partkey": "part",
                           "l_suppkey": "supplier"})
    replicate("events", {"event_id": "events"})

    def salt_text(r, i):
        from pyspark.sql import functions as F

        if i == 0:
            return r
        # inject a replica-unique token every 8 words: kills
        # replica-pair shingle overlap without changing length stats
        # materially (see module docstring)
        salt = F.concat(F.lit(f"zrep{i}x"), F.col("doc_id"))
        words = F.split(F.col("text"), " ")
        salted = F.array_join(
            F.flatten(F.transform(
                words,
                lambda w, j: F.when(j % 8 == 0, F.array(salt, w))
                .otherwise(F.array(w)))), " ")
        return r.withColumn("text", salted) \
                .withColumn("n_chars", F.length("text"))

    replicate("documents", {"doc_id": "documents"}, extra=salt_text)

    def perturb_vec(r, i):
        from pyspark.sql import functions as F

        if i == 0:
            return r
        return r.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda v, j: F.when(j == i % 8, v + F.lit(float(i)))
                .otherwise(v).cast("float")))

    replicate("embeddings", {"vec_id": "embeddings"},
              extra=perturb_vec)


def time_faces(spark, faces: list[str], sf_dir: str,
               runs: int) -> dict[str, float]:
    from data_engineering_pipeline_project_cloud_spark.plans import all_queries

    qs = all_queries()
    out = {}
    for name in faces:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm (layout build, code cache)
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            samples.append(time.monotonic() - t0)
        out[name] = statistics.median(samples)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", default=",".join(DEFAULT_FACES))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    faces = [f for f in args.faces.split(",") if f]

    from data_engineering_pipeline_project_cloud_spark.session import get_spark

    spark = get_spark("scale_probe")
    build_sf1(spark)
    t01 = time_faces(spark, faces, SF01, args.runs)
    t1 = time_faces(spark, faces, SF1, args.runs)
    rows = {}
    for f in faces:
        exp = math.log(t1[f] / t01[f]) / math.log(FACTOR)
        rows[f] = {"sf0.1_sec": round(t01[f], 3),
                   "sf1_sec": round(t1[f], 3),
                   "ratio": round(t1[f] / t01[f], 2),
                   "exponent": round(exp, 3)}
    print(json.dumps({"factor": FACTOR, "runs": args.runs,
                      "loadavg": os.getloadavg()[0],
                      "faces": rows}, indent=2))


if __name__ == "__main__":
    main()
