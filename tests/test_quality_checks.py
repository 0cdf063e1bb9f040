"""Data-quality expectation suite: violations must actually be
counted (the sf tables are clean, so the registry query alone can't
prove detection)."""

from __future__ import annotations

from data_engineering_pipeline_project_cloud_spark.operators.quality import (
    expect_accepted_values,
    expect_in_range,
    expect_not_null,
    expect_references,
    expect_unique,
    union_reports,
)


def test_expectations_detect_violations(spark):
    bad = spark.createDataFrame(
        [(1, "A", 0.5), (1, "A", 1.5), (None, "X", -0.1), (3, "N", 0.0)],
        "k int, flag string, ratio double")
    parent = spark.createDataFrame([(1,), (2,)], "k int")
    report = union_reports([
        expect_not_null(bad, "k"),
        expect_accepted_values(bad, "flag", ["A", "N", "R"]),
        expect_in_range(bad, "ratio", 0.0, 1.0),
        expect_unique(bad, ["k"]),
        expect_references(bad, "k", parent, "k"),
    ])
    got = {r["check"]: r["n_violations"] for r in report.collect()}
    assert got == {
        "not_null:k": 1,
        "accepted_values:flag": 1,
        "in_range:ratio": 2,          # 1.5 and -0.1
        "unique:k": 1,                # k=1 appears twice
        "references:k->k": 2,         # k=3 and k=NULL have no parent
    }


def test_clean_table_reports_zero(spark):
    clean = spark.createDataFrame([(1, "A"), (2, "N")], "k int, flag string")
    report = union_reports([
        expect_not_null(clean, "k"),
        expect_unique(clean, ["k"]),
        expect_accepted_values(clean, "flag", ["A", "N", "R"]),
    ])
    assert all(r["n_violations"] == 0 for r in report.collect())
