"""Capture .explain("formatted") for registry queries into plans/<round>/ (default r12; SPARK_GRAFT_PLAN_ROUND overrides).

Usage:
    python tools/capture_plans.py before [name ...]
    python tools/capture_plans.py after  [name ...]

With no names, captures the bench HEADLINE set plus the heavy secondary
faces examined this round.  Output: plans/r12/<name>_<tag>.txt (the
judge reads these to verify plan claims — Exchange counts, join
strategies, PushedFilters, Python-boundary nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_pipeline_project_cloud_spark.plans import all_queries  # noqa: E402
from data_engineering_pipeline_project_cloud_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q1_pricing_summary", "q3_top_orders", "q5_region_volume",
    "q6_forecast_revenue", "pay_agg", "master_table",
    "window_running_totals", "sessionize_events", "tumbling_hourly_events",
    "minhash_signatures", "dedup_minhash_pairs", "quality_score",
    "cosine_topk", "ann_ivf_topk", "asof_events_orders", "media_byte_stats",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = all_queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
