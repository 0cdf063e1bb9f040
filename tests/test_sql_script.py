"""Multi-statement SQL scripts with transactional BEGIN..COMMIT spans
(``statements.graft_sql_script`` — VERDICT r9 task 3): statement
splitting at top-level semicolons, compensating rollback on mid-script
failure (no partial state), consistent-cut publication through
``table_group.pin_group``, and group-level DESCRIBE HISTORY.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark import graft_sql, graft_sql_script
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    load_manifest,
    read_manifest,
    register,
    write_manifest_table,
)
from data_engineering_pipeline_project_cloud_spark.sources.table_group import (
    load_group,
    read_group_table,
)
from data_engineering_pipeline_project_cloud_spark.statements import split_statements


@pytest.fixture()
def src(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "src")
    write_manifest_table(
        spark.range(0, 10).select(F.col("id").alias("k"),
                                  (F.col("id") * 1.0).alias("v")),
        path, ["k"])
    return path


def test_split_statements_respects_strings_and_parens():
    assert split_statements(
        "UPDATE `t` SET a = 'x;y'; -- c;\nDELETE FROM `t`;") == \
        ["UPDATE `t` SET a = 'x;y'", "DELETE FROM `t`"]
    assert split_statements(
        "DELETE FROM `t` WHERE k IN (SELECT 1; )") == \
        ["DELETE FROM `t` WHERE k IN (SELECT 1; )"]


def test_script_runs_statements_in_order(spark, src):
    res = graft_sql_script(spark, f"""
        UPDATE `{src}` SET v = v + 1 WHERE k < 5;
        SELECT count(*) AS n FROM graft.`{src}` WHERE v = 3.0;
    """)
    assert res.collect()[0]["n"] == 1  # k=2: 2.0 + 1


def test_script_commit_publishes_group_cut(spark, src, tmp_path):
    agg = str(tmp_path / "agg")
    grp = str(tmp_path / "grp")
    graft_sql_script(spark, f"""
        BEGIN;
        CREATE TABLE `{agg}` AS
            SELECT k % 2 AS par, sum(v) AS total
            FROM graft.`{src}` GROUP BY k % 2;
        UPDATE `{src}` SET v = 0;
        COMMIT;
    """, group=grp)
    g = load_group(grp)
    assert set(g["tables"]) == {os.path.abspath(agg),
                                os.path.abspath(src)}
    # the cut pins the POST-script versions: the agg reflects the
    # PRE-update values (CTAS ran first), src reflects the update
    assert read_group_table(spark, grp, os.path.abspath(agg)) \
        .count() == 2
    assert read_group_table(spark, grp, os.path.abspath(src)) \
        .filter("v <> 0").count() == 0
    hist = graft_sql(spark, f"DESCRIBE HISTORY `{grp}`").collect()
    assert hist[0]["operation"] == "GROUP COMMIT"


def test_script_midfail_rolls_back_all_state(spark, src, tmp_path):
    """The pytest contract from the verdict: a failure between
    statements leaves NO partial state — created tables removed,
    updated tables restored."""
    agg = str(tmp_path / "agg2")
    before = {r["k"]: r["v"]
              for r in read_manifest(spark, src).collect()}
    with pytest.raises(ValueError, match="unknown column"):
        graft_sql_script(spark, f"""
            BEGIN;
            CREATE TABLE `{agg}` AS SELECT k FROM graft.`{src}`;
            UPDATE `{src}` SET v = -1;
            UPDATE `{src}` SET nope = 1;
            COMMIT;
        """)
    assert not os.path.exists(agg)
    after = {r["k"]: r["v"]
             for r in read_manifest(spark, src).collect()}
    assert after == before
    # the compensation is an auditable RESTORE commit, not history
    # rewriting: time travel to the mid-script state still works
    assert load_manifest(src)["version"] > 1


def test_script_rollback_statement(spark, src):
    graft_sql_script(spark, f"""
        BEGIN;
        UPDATE `{src}` SET v = -5;
        ROLLBACK;
    """)
    assert read_manifest(spark, src).filter("v = -5.0").count() == 0


def test_script_open_transaction_rolls_back_and_raises(spark, src):
    with pytest.raises(ValueError, match="open transaction"):
        graft_sql_script(spark, f"""
            BEGIN;
            UPDATE `{src}` SET v = -7;
        """)
    assert read_manifest(spark, src).filter("v = -7.0").count() == 0


def test_script_refuses_irreversible_statements_in_txn(spark, src):
    with pytest.raises(ValueError, match="irreversible"):
        graft_sql_script(spark,
                         f"BEGIN; VACUUM `{src}` RETAIN 5 VERSIONS; "
                         f"COMMIT;")
    with pytest.raises(ValueError, match="nested BEGIN"):
        graft_sql_script(spark, "BEGIN; BEGIN; COMMIT;")
    with pytest.raises(ValueError, match="COMMIT without BEGIN"):
        graft_sql_script(spark, "COMMIT;")
    with pytest.raises(ValueError, match="ROLLBACK without BEGIN"):
        graft_sql_script(spark, "ROLLBACK;")


def test_script_group_commit_is_monotonic_across_runs(spark, src,
                                                      tmp_path):
    grp = str(tmp_path / "grp_m")
    for i in range(2):
        graft_sql_script(spark, f"""
            BEGIN;
            UPDATE `{src}` SET v = v + 1 WHERE k = {i};
            COMMIT;
        """, group=grp)
    g = load_group(grp)
    assert g["version"] == 1  # v0 then v1
    # group time travel to the first cut
    g0 = load_group(grp, 0)
    assert g0["tables"][os.path.abspath(src)]["version"] < \
        g["tables"][os.path.abspath(src)]["version"]


# ------------------------------------------- round-10 idempotent retry


def test_script_txn_id_skips_consumed_span(spark, src, tmp_path):
    grp = str(tmp_path / "grp_t")
    script = f"""
        BEGIN TRANSACTION 'load-001';
        UPDATE `{src}` SET v = v + 1 WHERE k < 3;
        COMMIT;
    """
    graft_sql_script(spark, script, group=grp)
    vals1 = {r["k"]: r["v"]
             for r in read_manifest(spark, src).collect()}
    assert vals1[0] == 1.0
    # the EXACT retry (crash-after-commit, driver restart, double
    # submission) replays as a no-op — never a double apply
    res = graft_sql_script(spark, script, group=grp)
    assert res.collect()[0]["operation"] == "COMMIT (replayed)"
    vals2 = {r["k"]: r["v"]
             for r in read_manifest(spark, src).collect()}
    assert vals2 == vals1
    # a FRESH id applies
    graft_sql_script(spark, f"""
        BEGIN TRANSACTION 'load-002';
        UPDATE `{src}` SET v = v + 1 WHERE k < 3;
        COMMIT;
    """, group=grp)
    assert read_manifest(spark, src).filter("k = 0") \
        .collect()[0]["v"] == 2.0


def test_script_txn_id_recovers_from_crash(spark, src, tmp_path):
    """Hard-crash simulation: a prior attempt wrote PART of the span
    (its intent journal persisted, its id never consumed).  The retry
    must first restore the captured pre-versions — undoing the
    partial writes — then re-execute the whole span cleanly."""
    import json as _json

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest as _lm,
    )

    grp = str(tmp_path / "grp_c")
    os.makedirs(grp)
    pre_version = _lm(src).get("version", 0)
    # the "crashed attempt": one statement landed, then the process
    # died — exactly what the intent journal records
    graft_sql(spark, f"UPDATE `{src}` SET v = -100 WHERE k = 0")
    with open(os.path.join(grp, "intent-job7.json"), "w") as fh:
        _json.dump({"pre": {os.path.abspath(src): pre_version},
                    "order": [os.path.abspath(src)],
                    "catalog": -1}, fh)
    # retry with the same id: partial write undone, span re-applied
    graft_sql_script(spark, f"""
        BEGIN TRANSACTION 'job7';
        UPDATE `{src}` SET v = v + 0.5 WHERE k = 0;
        COMMIT;
    """, group=grp)
    assert read_manifest(spark, src).filter("k = 0") \
        .collect()[0]["v"] == 0.5  # NOT -99.5 (crashed write undone)
    assert not os.path.exists(os.path.join(grp, "intent-job7.json"))
    # the id is consumed in the group snapshot
    assert "job7" in load_group(grp).get("txns", {})


def test_script_txn_id_requires_group_and_valid_id(spark, src):
    with pytest.raises(ValueError, match="requires a group"):
        graft_sql_script(spark, f"""
            BEGIN TRANSACTION 'x1';
            UPDATE `{src}` SET v = 0;
            COMMIT;
        """)
    with pytest.raises(ValueError, match="transaction id"):
        graft_sql_script(spark, "BEGIN TRANSACTION 'bad id!'; "
                                "COMMIT;", group="/tmp/g")


def test_rollback_compensates_only_own_catalog_entries(
        spark, src, tmp_path):
    """A failing span's compensation restores ONLY the catalog
    entries the span itself created/repointed (ADVICE r10): a
    CONCURRENT session's CREATE committed mid-span must survive the
    rollback, and the span's own CREATE must be erased."""
    from data_engineering_pipeline_project_cloud_spark.sources import metastore as ms

    cdir = str(tmp_path / "cat_scoped")
    spark.conf.set("spark.graft.catalogDir", cdir)
    try:
        graft_sql(spark, f"CREATE TABLE pre_existing LOCATION '{src}'")

        class Boom(Exception):
            pass

        # interleave a concurrent session's CREATE mid-span by
        # monkey-driving the script: statement 2 fails AFTER the
        # concurrent create landed
        import data_engineering_pipeline_project_cloud_spark.statements as st

        real_graft_sql = st.graft_sql
        state = {"fired": False}

        def wrapped(sp, sql):
            if "explode_now" in sql and not state["fired"]:
                state["fired"] = True
                # the concurrent session commits between statements
                ms.create_table_entry(spark, "concurrent_t", src)
                raise Boom("mid-span failure")
            return real_graft_sql(sp, sql)

        st.graft_sql = wrapped
        try:
            with pytest.raises(Boom):
                graft_sql_script(spark, f"""
                    BEGIN;
                    CREATE TABLE span_t AS SELECT k FROM graft.`{src}`;
                    UPDATE `{src}` SET v = v WHERE k = 'explode_now';
                    COMMIT;
                """)
        finally:
            st.graft_sql = real_graft_sql
        names = {r["name"] for r in ms.list_tables(spark)}
        assert "concurrent_t" in names      # survived the rollback
        assert "span_t" not in names        # span's own create erased
        assert "pre_existing" in names
        # the span's managed data directory is gone too
        assert not os.path.exists(ms.managed_location(cdir, "span_t"))
    finally:
        spark.conf.unset("spark.graft.catalogDir")


def test_drop_inside_failed_span_rolls_back(spark, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        register,
        write_manifest_table,
    )
    from data_engineering_pipeline_project_cloud_spark.statements import (
        graft_sql_script,
    )

    register(spark)
    spark.conf.set("spark.graft.catalogDir", str(tmp_path / "cat"))
    try:
        ext = str(tmp_path / "ext")
        write_manifest_table(
            spark.range(5).selectExpr("id AS k"), ext, ["k"])
        graft_sql(spark, f"CREATE TABLE rolld LOCATION '{ext}'")
        with pytest.raises(Exception):
            graft_sql_script(spark, f"""
                BEGIN;
                DROP TABLE rolld;
                UPDATE `{ext}` SET k = no_such_col + 1;
                COMMIT;
            """)
        # round-11 review fix: the DROPPED external entry is restored
        # by the compensation (it only captured CREATEs before)
        n = graft_sql(spark, "SELECT COUNT(*) AS n "
                             "FROM graft.rolld").collect()[0]["n"]
        assert n == 5
        graft_sql(spark, "DROP TABLE rolld")
    finally:
        spark.conf.unset("spark.graft.catalogDir")
