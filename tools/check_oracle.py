"""Local mirror of the driver's DuckDB differential check.

Runs every registry query on Spark and its oracle SQL on DuckDB at the
given sf, compares row count, column names, and order-insensitive
values (floats rounded to 9 significant-ish digits before comparing).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from data_engineering_pipeline_project_cloud_spark.plans import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)
from data_engineering_pipeline_project_cloud_spark.session import get_spark  # noqa: E402
from data_engineering_pipeline_project_cloud_spark.testing import diff_results  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = all_queries()
    oracle = all_oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failed.append(name)
            continue
        if name not in oracle:
            print(f"rows-only {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failed.append(name)
            continue
        problems = diff_results(scols, [tuple(r) for r in srows], ocols, orows)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
