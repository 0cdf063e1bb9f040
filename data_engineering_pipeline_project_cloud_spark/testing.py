"""Differential-test comparison helpers.

Shared by ``tools/check_oracle.py`` (the local mirror of the driver's
DuckDB check) and the pytest suite, so both compare Spark results to
the oracle with EXACTLY the same canonicalization: row count, column
names, and order-insensitive values with floats rounded to 9
significant digits.
"""

from __future__ import annotations

import math


def canon(v):
    """Canonical scalar: floats to 9 sig digits, everything else str."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return str(v)


def rowset(cols, rows):
    """Order-insensitive canonical rowset: columns sorted by name,
    rows sorted by canonicalized values (None sorts first)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    c = [tuple(canon(r[i]) for i in idx) for r in rows]
    return sorted(c, key=lambda row: tuple(
        (v is None, "" if v is None else str(v)) for v in row))


def diff_results(scols, srows, ocols, orows, max_diffs: int = 3) -> list[str]:
    """Compare a Spark result to an oracle result; return a list of
    human-readable problems (empty = match)."""
    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sset = rowset(scols, [tuple(r) for r in srows])
        oset = rowset(ocols, orows)
        if sset != oset:
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:max_diffs]
            problems.append(f"values differ, first diffs: {diffs}")
    return problems
