"""Local mirror of the driver's DuckDB differential check.

Two comparison layers per query:

1. *Value* check (round-1 behavior): Spark ``collect()`` vs DuckDB
   ``fetchall()`` — both yield exact Python objects (Decimal, datetime),
   so this verifies SEMANTIC equality.
2. *Strict serialization* check (round-2 default): Spark ``collect()``
   vs DuckDB ``.df()`` — the pandas path collapses DECIMAL → float64
   and NULL → NaN, exactly the serialization divergence that turned 20
   semantically-identical round-1 queries hash-red.  Every cell is
   rendered with ``str()`` and compared as a sorted multiset; a query
   passes only if its output survives ANY reasonable harness
   serialization.  This is the regression gate for the canonical
   output-type rule (plans/parity.py docstring).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from data_engineering_pipeline_project_cloud_spark.plans import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)
from data_engineering_pipeline_project_cloud_spark.session import get_spark  # noqa: E402
from data_engineering_pipeline_project_cloud_spark.testing import diff_results  # noqa: E402


def _canon_cell(v) -> str:
    s = str(v)
    # a float-frame NULL renders 'nan'/'NaT', an object-frame NULL
    # renders 'None' — treat all as one token so the strict check
    # flags VALUE divergence, not which-null-spelling divergence;
    # outputs should be null-free anyway (sentinel rule)
    if s in ("None", "nan", "NaT", "<NA>"):
        return "\0NULL"
    return s


def strict_multiset(cols, rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        "\x01".join(_canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[2:] if not a.startswith("-"))
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
            spark.catalog.clearCache()
            continue
        if name not in oracle:
            print(f"rows-only {name}: {len(srows)} rows")
            spark.catalog.clearCache()
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            opdf = con.execute(oracle[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failed.append(name)
            spark.catalog.clearCache()
            continue
        problems = diff_results(scols, [tuple(r) for r in srows], ocols, orows)
        # strict layer: spark objects vs the duckdb pandas frame
        sm = strict_multiset(scols, [tuple(r) for r in srows])
        om = strict_multiset(list(opdf.columns),
                             list(opdf.itertuples(index=False, name=None)))
        if sm != om:
            extra = list((sm - om).keys())[:2]
            missing = list((om - sm).keys())[:2]
            problems.append(
                f"strict serialization diff: {len((sm - om))} spark-only / "
                f"{len((om - sm))} oracle-only rows; "
                f"e.g. spark={extra} oracle={missing}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows")
        # dedup/ANN faces persist() intermediates; release between
        # queries so repeated runs do not accumulate cached blocks
        spark.catalog.clearCache()
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
