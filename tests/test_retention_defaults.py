"""Per-table retention defaults (round 11 — VERDICT r10 task 6):
``VACUUM`` with no explicit ``RETAIN`` consults the table's
``retentionVersions`` / ``retentionHours`` TBLPROPERTIES — governance
in table state.  Explicit RETAIN always wins; absent both, the
engine-wide defaults (1 version, 1-hour in-flight guard) hold.
"""

from __future__ import annotations

import pytest

from data_engineering_pipeline_project_cloud_spark import graft_sql
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    load_manifest,
    register,
    write_frame,
)


def _versions(path: str) -> list[int]:
    out = []
    head = load_manifest(path)["version"]
    for v in range(head + 1):
        try:
            load_manifest(path, v)
            out.append(v)
        except (ValueError, FileNotFoundError, OSError):
            pass
    return out


@pytest.fixture()
def path(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "t")
    graft_sql(spark, f"""
        CREATE TABLE `{p}` (k BIGINT)
        TBLPROPERTIES ('retentionVersions' = 3,
                       'retentionHours' = 0)
    """)
    for i in range(5):
        write_frame(spark.range(i * 10, i * 10 + 10).selectExpr(
            "id AS k").coalesce(1), p, "append")
    return p


def test_vacuum_uses_table_retention_properties(spark, path):
    assert len(_versions(path)) == 6  # v0 create + 5 appends
    graft_sql(spark, f"VACUUM `{path}`")  # no RETAIN: property wins
    kept = _versions(path)
    assert len(kept) == 3
    assert kept[-1] == 5  # newest always kept


def test_explicit_retain_overrides_property(spark, path):
    # explicit VERSIONS wins over retentionVersions; the absent
    # HOURS side still falls to the retentionHours property (0 here,
    # or nothing would delete)
    graft_sql(spark, f"VACUUM `{path}` RETAIN 1 VERSIONS")
    assert len(_versions(path)) == 1


def test_engine_default_guard_without_properties(spark, tmp_path):
    import os

    register(spark)
    p = str(tmp_path / "nodefaults")
    for i in range(3):
        write_frame(spark.range(10).selectExpr("id AS k").coalesce(1),
                    p, "append" if i else "overwrite")
    graft_sql(spark, f"VACUUM `{p}`")
    # engine defaults apply (keep 1 version, 1-hour in-flight
    # guard): the head stays fully readable and every live data
    # file — all younger than an hour — survives
    head = load_manifest(p)
    assert sum(f["rows"] for f in head["files"]
               if not f.get("dead")) == 30
    for f in head["files"]:
        if not f.get("dead"):
            assert os.path.exists(f["path"])


def test_dry_run_reports_without_deleting(spark, path):
    res = graft_sql(spark, f"VACUUM `{path}` DRY RUN").collect()
    assert len(_versions(path)) == 6  # nothing deleted
    assert res  # summary row came back
