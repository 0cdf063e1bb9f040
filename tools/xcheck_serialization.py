"""4-way serialization cross-check for driver hash robustness.

The round-1 driver recorded ``hash_match: false`` for 20 queries whose
values were bit-identical to the oracle — the divergence lived in the
HARNESS serialization (decimal→float64 collapse, None/NaN spelling),
not the values.  The canonical-output rule (plans/parity.py docstring)
fixes that; this tool proves the fix holds under every plausible
driver collection path by comparing stringified row multisets across:

  - Spark ``toPandas()``  (Arrow batch path)
  - DuckDB ``fetchall()`` (exact Python objects)
  - DuckDB ``.df()``      (pandas path: DECIMAL→float64, NULL→NaN)

(tools/check_oracle.py covers the fourth pairing, Spark ``collect()``
vs DuckDB ``.df()``.)  Any query whose output survives all of these
identically cannot be flipped by the driver's choice of frame.

Usage: python tools/xcheck_serialization.py [sf_dir] [query ...]
(default: every oracle-checked registry query at sf0.01)
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from data_engineering_pipeline_project_cloud_spark.plans import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)
from data_engineering_pipeline_project_cloud_spark.session import get_spark  # noqa: E402


def _canon(v) -> str:
    # decide NULL-ness on the Python object, not its string form — a
    # genuine string value 'None'/'nan' must NOT collapse into the
    # NULL sentinel (that conflation could hide a real divergence)
    if v is None:
        return "\0NULL"
    try:
        if v != v:  # IEEE NaN / NaT: the only self-unequal scalars
            return "\0NULL"
    except TypeError:
        return "\0NULL"  # pandas NA: comparisons propagate, bool() raises
    except ValueError:
        pass  # numpy arrays: elementwise compare is ambiguous, not a null
    return str(v)


def _ms(cols, rows) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter("\x01".join(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("xcheck")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    qs, oracle = all_queries(), all_oracle_sql()
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")
    no_oracle = only & (set(qs) - set(oracle))
    if no_oracle:
        raise SystemExit(f"rows-only (no oracle to cross-check): "
                         f"{sorted(no_oracle)}")
    bad = []
    for name in qs:
        if name not in oracle or (only and name not in only):
            continue
        pdf = qs[name](spark, sf_dir).toPandas()
        m_spark = _ms(list(pdf.columns),
                      list(pdf.itertuples(index=False, name=None)))
        res = con.execute(oracle[name])
        m_fetch = _ms([d[0] for d in res.description], res.fetchall())
        odf = con.execute(oracle[name]).df()
        m_df = _ms(list(odf.columns),
                   list(odf.itertuples(index=False, name=None)))
        ok = m_spark == m_fetch == m_df
        print(("OK   " if ok else "FAIL ") + name, flush=True)
        if not ok:
            bad.append(name)
        spark.catalog.clearCache()
    print(f"\n{len(bad)} mismatches" + (f": {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
