"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented per SURVEY.md's custom-operator ladder, option (b): a
cogrouped ``applyInPandas`` — both sides are co-partitioned by the join
key (ONE shuffle each), then each key group is merged with pandas
``merge_asof`` (sorted backward search) inside an Arrow batch.

Scale shape: identical to how Flink/kdb-style asof joins distribute —
partition by entity key, sort within partition by time.  Skewed
entities are the risk; for a hot key, pre-split by time range and
merge boundaries (not needed at test scale).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on_left: str, on_right: str,
              by_left: str, by_right: str,
              value_cols: list[str]) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on_right`` <= ``on_left`` within the same ``by`` key (backward
    as-of).  Left rows with no match keep NULLs (left-outer).

    ``right`` must be unique per (by_right, on_right); callers dedup
    first so the match is deterministic.
    """
    left_cols = left.columns
    out_fields = []
    for c in left_cols:
        out_fields.append(f"`{c}` {left.schema[c].dataType.simpleString()}")
    for c in value_cols:
        out_fields.append(f"`{c}` {right.schema[c].dataType.simpleString()}")
    out_schema = ", ".join(out_fields)

    right_cols = list(dict.fromkeys([by_right, on_right, *value_cols]))
    merge_cols = list(dict.fromkeys([on_right, *value_cols]))
    right_sel = right.select(*right_cols)

    def merge(lkey, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(on_left)
        if rdf.empty:
            for c in value_cols:
                ldf[c] = None
            return ldf[left_cols + value_cols]
        rdf = rdf.sort_values(on_right)
        merged = pd.merge_asof(
            ldf, rdf[merge_cols],
            left_on=on_left, right_on=on_right, direction="backward",
            allow_exact_matches=True)
        return merged[left_cols + value_cols]

    return (
        left.groupBy(by_left)
        .cogroup(right_sel.groupBy(by_right))
        .applyInPandas(merge, out_schema)
    )
