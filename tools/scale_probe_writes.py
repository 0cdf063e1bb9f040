"""Write-leg scaling probe (round 10 — VERDICT r9 task 6): the r9
curve measured read/analytics faces only; this times the WRITE legs —
UPDATE (CoW rewrite), MERGE (upsert commit), COPY INTO (idempotent
ingest), DV DELETE (merge-on-read), and DV DELETE under accumulated
mask debt — at sf0.1 vs the synthesized sf1 and reports scaling
exponents.  These legs carry the copy-on-write rewrite costs that
dominate real table maintenance, which the read probe cannot see
(registry write faces build once under scoped_scratch and then only
re-read).

Each timed sample operates on a FRESH seeded table (seeding is
untimed), so the measurement is one write leg at table scale, not an
accumulation artifact.  sf1 synthesis is shared with scale_probe.py
(10x replication, consistent key offsets).

Usage:
    python tools/scale_probe_writes.py [--runs 2] [--legs l1,l2,...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scale_probe import SF1, SF01, FACTOR, build_sf1  # noqa: E402


def _orders(spark, sf_dir):
    from pyspark.sql import functions as F

    return (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select(F.col("o_orderkey").cast("long")
                    .alias("o_orderkey"),
                    F.col("o_orderstatus").alias("status"),
                    F.col("o_totalprice").cast("double")
                    .alias("total_price"),
                    F.year("o_orderdate").cast("int")
                    .alias("order_year")))


def _lineitem(spark, sf_dir):
    from pyspark.sql import functions as F

    return (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(F.col("l_orderkey").cast("long")
                    .alias("l_orderkey"),
                    F.col("l_linenumber").cast("int")
                    .alias("l_linenumber"),
                    F.col("l_quantity").cast("double")
                    .alias("l_quantity"),
                    F.col("l_extendedprice").cast("double")
                    .alias("l_extendedprice"),
                    F.year("l_shipdate").cast("int")
                    .alias("ship_year")))


def _seed(spark, sf_dir, root, dv=False) -> str:
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        set_table_properties,
        write_manifest_table,
    )

    path = os.path.join(root, "t")
    write_manifest_table(
        _orders(spark, sf_dir).repartitionByRange(16, "o_orderkey"),
        path, ["o_orderkey", "order_year"])
    if dv:
        set_table_properties(path, {"enableDeletionVectors": "true"})
    return path


def _seed_li(spark, sf_dir, root, dv=False) -> str:
    """Lineitem seed — the VOLUME-sensitive legs use this (6M rows at
    sf1): at orders size the per-commit fixed costs (FIND job,
    scheduling, commit JSON) swamp the data-proportional cost and the
    exponent reads ~0 regardless of plan shape."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        set_table_properties,
        write_manifest_table,
    )

    path = os.path.join(root, "li")
    write_manifest_table(
        _lineitem(spark, sf_dir)
        .repartitionByRange(16, "l_orderkey"),
        path, ["l_orderkey", "ship_year"])
    if dv:
        set_table_properties(path, {"enableDeletionVectors": "true"})
    return path


def leg_update(spark, sf_dir, root):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        update_manifest,
    )

    path = _seed_li(spark, sf_dir, root)
    t0 = time.monotonic()
    update_manifest(spark, path,
                    {"l_extendedprice": "l_extendedprice * 1.01"},
                    "ship_year <= 1995")
    return time.monotonic() - t0


def leg_merge(spark, sf_dir, root):
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        merge_into_manifest,
    )

    path = _seed(spark, sf_dir, root)
    updates = (_orders(spark, sf_dir)
               .filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("status", F.lit("U")))
    t0 = time.monotonic()
    merge_into_manifest(updates, path, ["o_orderkey"],
                        ["o_orderkey", "order_year"])
    return time.monotonic() - t0


def leg_merge_cdc(spark, sf_dir, root):
    """The round-10 general clause matrix (merge_apply)."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        merge_apply,
    )

    path = _seed(spark, sf_dir, root)
    cdc = (_orders(spark, sf_dir)
           .filter(F.col("o_orderkey") % 20 < 2)
           .withColumn("op", F.when(F.col("o_orderkey") % 20 == 0,
                                    "U").otherwise("D")))
    t0 = time.monotonic()
    merge_apply(cdc, path, ["o_orderkey"],
                ["o_orderkey", "order_year"],
                matched=[
                    {"cond": "s.op = 'D'", "action": "delete"},
                    {"cond": None, "action": "update",
                     "set": {"total_price": "s.total_price + 1.0"}}],
                source_alias="s")
    return time.monotonic() - t0


def leg_copy_into(spark, sf_dir, root):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        copy_into,
    )

    landing = os.path.join(root, "landing")
    os.makedirs(landing, exist_ok=True)
    shutil.copyfile(f"{sf_dir}/lineitem.parquet",
                    os.path.join(landing, "lineitem.parquet"))
    path = os.path.join(root, "copy_t")
    t0 = time.monotonic()
    copy_into(spark, path, landing, "parquet")
    return time.monotonic() - t0


def leg_dv_delete(spark, sf_dir, root):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_where_dv,
    )

    path = _seed_li(spark, sf_dir, root, dv=True)
    t0 = time.monotonic()
    delete_where_dv(spark, path, "l_orderkey % 10 = 1",
                    max_dv_rows=10_000_000)
    return time.monotonic() - t0


def leg_dv_delete_debt(spark, sf_dir, root):
    """The r10 distributed-exclusion contract: the timed delete runs
    against masks accumulated by three earlier DV deletes — planner
    time must stay flat in the debt (O(masked files), not O(masked
    positions))."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        delete_where_dv,
    )

    path = _seed_li(spark, sf_dir, root, dv=True)
    for k in (1, 2, 3):  # untimed: accumulate mask debt
        delete_where_dv(spark, path, f"l_orderkey % 10 = {k}",
                        max_dv_rows=10_000_000)
    t0 = time.monotonic()
    delete_where_dv(spark, path, "l_orderkey % 10 = 4",
                    max_dv_rows=10_000_000)
    return time.monotonic() - t0


def leg_replace_where(spark, sf_dir, root):
    """replaceWhere backfill (round 11 — VERDICT r10 task 8): rewrite
    ONE ship_year slice of a table whose files are range-laid-out on
    ship_year — the production backfill shape, where scope-stat
    pruning must keep the rewrite O(slice), not O(table)."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        overwrite_where,
        write_manifest_table,
    )

    path = os.path.join(root, "li_by_year")
    write_manifest_table(
        _lineitem(spark, sf_dir)
        .repartitionByRange(16, "ship_year", "l_orderkey"),
        path, ["l_orderkey", "ship_year"])
    backfill = (_lineitem(spark, sf_dir)
                .filter(F.col("ship_year") == 1994)
                .withColumn("l_quantity",
                            F.col("l_quantity") + 1.0))
    t0 = time.monotonic()
    overwrite_where(backfill, path, "ship_year", 1994, 1994,
                    ["l_orderkey", "ship_year"])
    return time.monotonic() - t0


def leg_optimize_zorder(spark, sf_dir, root):
    """OPTIMIZE with persisted clustering (round 11 — VERDICT r10
    task 8): the z-order maintenance rewrite — the full-table CoW
    cost a user pays per maintenance window.  Expected ~linear (every
    row re-sorted and rewritten); the probe pins that it is not
    SUPER-linear (no global-sort blowup — the curve key sorts
    per-range)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        optimize_manifest,
        set_cluster_by,
    )

    path = _seed_li(spark, sf_dir, root)
    set_cluster_by(path, ["l_orderkey", "ship_year"])
    t0 = time.monotonic()
    optimize_manifest(spark, path, target_rows=500_000)
    return time.monotonic() - t0


LEGS = {
    "update_cow": leg_update,
    "merge_upsert": leg_merge,
    "merge_cdc_apply": leg_merge_cdc,
    "copy_into": leg_copy_into,
    "dv_delete": leg_dv_delete,
    "dv_delete_debt": leg_dv_delete_debt,
    "replace_where": leg_replace_where,
    "optimize_zorder": leg_optimize_zorder,
}


def time_leg(spark, fn, sf_dir: str, runs: int) -> float:
    samples = []
    # one untimed warm-up pass: the first write leg of a session pays
    # JVM codegen + parquet reader init, which would otherwise load
    # entirely onto the sf0.1 sample and fake a sub-linear exponent
    for i in range(runs + 1):
        root = tempfile.mkdtemp(prefix="scale_w_")
        try:
            s = fn(spark, sf_dir, root)
            if i > 0:
                samples.append(s)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return statistics.median(samples)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default=",".join(LEGS))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    legs = [x for x in args.legs.split(",") if x]

    from data_engineering_pipeline_project_cloud_spark.session import get_spark

    spark = get_spark("scale_probe_writes")
    build_sf1(spark)
    rows = {}
    for name in legs:
        t01 = time_leg(spark, LEGS[name], SF01, args.runs)
        t1 = time_leg(spark, LEGS[name], SF1, args.runs)
        exp = math.log(t1 / t01) / math.log(FACTOR)
        rows[name] = {"sf0.1_sec": round(t01, 3),
                      "sf1_sec": round(t1, 3),
                      "ratio": round(t1 / t01, 2),
                      "exponent": round(exp, 3)}
        print(json.dumps({name: rows[name]}), flush=True)
    print(json.dumps({"factor": FACTOR, "runs": args.runs,
                      "loadavg": os.getloadavg()[0],
                      "legs": rows}, indent=2))


if __name__ == "__main__":
    main()
