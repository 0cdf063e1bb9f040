"""Property tests for the SQL front-end's lexer-based clause
splitting (statements._P and friends): keyword search and top-level
splitting must never be confused by string literals, backtick
identifiers, or nesting — randomized by hypothesis.

These are pure-Python (no Spark session): the parser is the part of
graft_sql that is new code; the dispatch targets have their own
suites.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from data_engineering_pipeline_project_cloud_spark.statements import (
    _P,
    _lex,
    _parse_assignments,
    _split_top,
    _split_top_kw,
)

# text that may contain keywords, quotes-to-be-escaped, parens — the
# adversarial content for a string literal
_payload = st.text(
    alphabet=string.ascii_letters + string.digits
    + " ,()=<>!'\"`AND WHERE SET",
    min_size=0, max_size=30)


def _q(s: str) -> str:
    """SQL-quote a payload (doubling embedded quotes)."""
    return "'" + s.replace("'", "''") + "'"


@given(_payload)
@settings(max_examples=200, deadline=None)
def test_string_literals_lex_as_single_tokens(s):
    sql = f"a = {_q(s)} AND b = 2"
    toks = _lex(sql)
    lits = [t for t in toks if t.kind == "str"]
    assert len(lits) == 1
    assert lits[0].raw == _q(s)


@given(st.lists(_payload, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_parse_assignments_roundtrip(vals):
    # build `c0 = '<v0>', c1 = '<v1>', ...` — commas/keywords inside
    # the quoted values must not split or shift assignments
    src = ", ".join(f"c{i} = {_q(v)}" for i, v in enumerate(vals))
    got = _parse_assignments(src)
    assert got == {f"c{i}": _q(v) for i, v in enumerate(vals)}


@given(st.lists(_payload, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_split_top_kw_ignores_quoted_and_parenthesized(parts):
    # top-level AND joins; each conjunct hides an adversarial payload
    # inside quotes AND a parenthesized (x AND y) group
    conjs = [f"f{i}({_q(p)} , col) > (1 AND 2)"
             for i, p in enumerate(parts)]
    src = " AND ".join(conjs)
    got = _split_top_kw(src, "AND")
    assert got == conjs


@given(_payload)
@settings(max_examples=200, deadline=None)
def test_find_keyword_skips_literals(s):
    sql = f"SET x = {_q(s)} WHERE y = 1"
    p = _P(sql)
    w = p.find("WHERE")
    assert w >= 0
    assert p.slice(w + 1, None) == "y = 1"
    # exactly one top-level WHERE regardless of payload content
    assert p.slice(p.i, w).startswith("SET")


@given(st.integers(min_value=0, max_value=5),
       st.lists(_payload, min_size=1, max_size=3))
@settings(max_examples=100, deadline=None)
def test_split_top_comma_depth(depth, parts):
    # wrap each part in `depth` paren levels: inner commas never split
    wrapped = ["(" * depth + f"g({_q(p)}, 1)" + ")" * depth
               for p in parts]
    src = " , ".join(wrapped)
    assert _split_top(src, ",") == wrapped


@given(st.lists(_payload, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_split_statements_respects_literals(parts):
    """Round 10: script splitting at top-level semicolons — a `;`
    inside a string literal or parens never splits, and each piece
    round-trips to its statement text."""
    from data_engineering_pipeline_project_cloud_spark.statements import split_statements

    stmts = [f"UPDATE `t{i}` SET c = {_q(p + ';x')}"
             for i, p in enumerate(parts)]
    script = "; ".join(stmts) + ";"
    got = split_statements(script)
    assert got == stmts


@given(_payload)
@settings(max_examples=200, deadline=None)
def test_find_clause_skips_case_end_spans(s):
    """Round 10: WHEN/THEN inside CASE..END (and string literals)
    are never clause boundaries."""
    p = _P(f"CASE WHEN a = {_q(s)} THEN 1 ELSE 2 END WHEN")
    # the only top-level WHEN is the trailing one
    j = p.find_clause("WHEN")
    assert p.toks[j].up == "WHEN" and j == len(p.toks) - 1
    p2 = _P(f"x = {_q(s)} THEN")
    assert p2.find_clause("THEN") == len(p2.toks) - 1


@given(st.lists(_payload, min_size=1, max_size=3),
       st.booleans())
@settings(max_examples=150, deadline=None)
def test_merge_clause_list_roundtrip(vals, with_cond):
    """Round 10: the WHEN clause parser recovers every clause's kind,
    condition, and assignments from adversarial payload text."""
    from data_engineering_pipeline_project_cloud_spark.statements import _merge_clauses

    conds = [f"s.op = {_q(v)}" for v in vals]
    parts = []
    for i, v in enumerate(vals):
        cond = f" AND {conds[i]}" if with_cond or i < len(vals) - 1 \
            else ""
        parts.append(f"WHEN MATCHED{cond} THEN UPDATE SET "
                     f"c{i} = {_q(v)}")
    parts.append("WHEN NOT MATCHED THEN INSERT *")
    p = _P(" ".join(parts))
    matched, not_matched, nmbs = _merge_clauses(p)
    assert len(matched) == len(vals) and len(not_matched) == 1
    assert not nmbs
    for i, (cl, v) in enumerate(zip(matched, vals)):
        assert cl["action"] == "update"
        assert cl["set"] == {f"c{i}": _q(v)}
        if with_cond or i < len(vals) - 1:
            assert cl["cond"] == f"s.op = {_q(v)}"
        else:
            assert cl["cond"] is None
    assert not_matched[0] == {"cond": None, "values": None}
