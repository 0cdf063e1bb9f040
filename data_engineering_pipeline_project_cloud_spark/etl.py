"""End-to-end ELT pipeline (SURVEY.md §2.8 O1-O3).

The reference orchestrates three subprocesses passing state through
Postgres (``scripts/pipeline.py:4-18``): raw load (``main.py``) →
dimension build (``create_dimensions.py``) → transform.  Here the
pipeline is ONE Spark application of sequential stage functions —
state passes as parquet layers, failure propagates as exceptions
(fail-fast, matching ``pipeline.py:9-11``).

Intentional divergence (SURVEY.md O3): the reference wires a
placeholder copy of the dimension build as step 3 and never runs its
real master transform; this pipeline runs the COMPLEX transform as
step 3 — the intended semantics, not the wiring bug.

Every sink is overwrite-mode: re-running any stage (or the whole
pipeline) is safe — the reference's idempotent-replace contract
(``scripts/main.py:58``).

Scale notes: stages communicate only through partitioned parquet (no
driver-side state), so each stage is restartable and the pipeline
survives executor loss; at 100 TB the raw layer is the only full-data
copy and would normally be skipped (query source parquet in place) —
kept here for contract parity with the reference's raw-layer load.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from .plans.parity import dim_locations, write_master
from .sources import TABLES, load_table, write_overwrite


def run_raw_load(spark: SparkSession, sf_dir: str, out_dir: str,
                 tables: tuple[str, ...] = TABLES) -> dict[str, int]:
    """Stage 1 — raw layer (``scripts/main.py``): land every source
    table verbatim, full-overwrite.  Executor-parallel scan + write;
    the reference's whole-file-into-driver-RAM pattern is the central
    limit this removes (SURVEY.md §3.2)."""
    counts: dict[str, int] = {}
    for t in tables:
        df = load_table(spark, sf_dir, t)
        write_overwrite(df, f"{out_dir}/raw/{t}")
        # observability count (A6, ``main.py:64``) from the written
        # files — avoids a second scan of the source
        counts[t] = spark.read.parquet(f"{out_dir}/raw/{t}").count()
    return counts


def run_dim_build(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Stage 2 — conformed dimension (``scripts/create_dimensions.py``):
    union-conform-dedup + broadcast enrich + deterministic surrogate
    key, overwrite-written."""
    dim = dim_locations(spark, sf_dir)
    write_overwrite(dim, f"{out_dir}/dim_locations")
    return spark.read.parquet(f"{out_dir}/dim_locations").count()


def run_quality_gate(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Stage 2.5 — data contracts: the expectation suite over the
    sources; ANY violation aborts the pipeline before the expensive
    master build (the reference relies on Postgres constraints to
    reject bad data at load time — this is the explicit, earlier
    equivalent)."""
    from .plans.relational import data_quality_report

    report = {r["check"]: r["n_violations"]
              for r in data_quality_report(spark, sf_dir).collect()}
    violations = {k: v for k, v in report.items() if v > 0}
    if violations:
        raise ValueError(f"data-quality gate failed: {violations}")
    return report


def run_master_build(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """Stage 3 — the complex transform
    (``scripts/transform-complex-full.py``): wide fact build, grain
    enforced, month-partitioned serving layout."""
    write_master(spark, sf_dir, f"{out_dir}/master_table")
    return spark.read.parquet(f"{out_dir}/master_table").count()


def run_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """The full DAG, fail-fast: any stage exception aborts the run
    (``pipeline.py:9-11``).  Returns per-stage row counts + timings —
    the structured form of the reference's print-based observability."""
    report: dict = {"stages": []}
    for name, fn in (
        ("raw_load", lambda: run_raw_load(spark, sf_dir, out_dir)),
        ("dim_build", lambda: run_dim_build(spark, sf_dir, out_dir)),
        ("quality_gate", lambda: run_quality_gate(spark, sf_dir)),
        ("master_build", lambda: run_master_build(spark, sf_dir, out_dir)),
    ):
        t0 = time.perf_counter()
        result = fn()  # exceptions propagate: fail-fast
        report["stages"].append({
            "stage": name,
            "result": result,
            "seconds": round(time.perf_counter() - t0, 3),
        })
    return report
