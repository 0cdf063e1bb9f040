"""SQL statement front-end (statements.graft_sql): every statement
form dispatches to the existing lakehouse API with identical
semantics — the twin-face contract (VERDICT r8 item 1) — and
malformed statements fail loudly with the offending fragment.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark import graft_sql
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    load_manifest,
    read_manifest,
    register,
    write_manifest_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("grp"),
        (F.col("id") * 1.5).alias("val"),
        F.concat(F.lit("row"), F.col("id")).alias("name"))
    write_manifest_table(df.repartitionByRange(5, "k"), path,
                         ["k", "grp"])
    return path


# ------------------------------------------------------------------ DML


def test_sql_update(spark, table):
    res = graft_sql(
        spark,
        f"UPDATE `{table}` SET val = val * 2, name = upper(name) "
        f"WHERE grp = 7;")
    assert res.collect()[0]["operation"] == "UPDATE"
    rows = {r["k"]: (r["val"], r["name"])
            for r in read_manifest(spark, table).collect()}
    assert rows[7] == (7 * 1.5 * 2, "ROW7")
    assert rows[8] == (8 * 1.5, "row8")


def test_sql_update_without_where_hits_all_rows(spark, table):
    graft_sql(spark, f"UPDATE `{table}` SET grp = 0")
    assert all(r["grp"] == 0
               for r in read_manifest(spark, table).collect())


def test_sql_delete(spark, table):
    graft_sql(spark, f"DELETE FROM `{table}` WHERE grp = 3")
    rows = read_manifest(spark, table).collect()
    assert len(rows) == 90 and all(r["grp"] != 3 for r in rows)


def test_sql_merge_upsert(spark, table):
    src = spark.createDataFrame(
        [(1, 99, 0.0, "upd"), (1000, 5, 1.0, "new")],
        "k long, grp long, val double, name string")
    src.createOrReplaceTempView("merge_src")
    graft_sql(spark, f"""
        MERGE INTO `{table}` AS t USING merge_src AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    rows = {r["k"]: (r["grp"], r["name"])
            for r in read_manifest(spark, table).collect()}
    assert rows[1] == (99, "upd")
    assert rows[1000] == (5, "new")
    assert len(rows) == 101


def test_sql_merge_subquery_source_and_nmbs_delete(spark, table):
    # keep only k < 10 via NOT MATCHED BY SOURCE DELETE; the source is
    # a subquery over the table ITSELF through a graft. reference
    graft_sql(spark, f"""
        MERGE INTO `{table}` t
        USING (SELECT k, grp, val, name FROM graft.`{table}`
               WHERE k < 10) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    rows = read_manifest(spark, table).collect()
    assert len(rows) == 10 and all(r["k"] < 10 for r in rows)


def test_sql_merge_matched_delete(spark, table):
    spark.createDataFrame([(5,), (7,)], "k long") \
        .createOrReplaceTempView("doomed_keys")
    graft_sql(spark, f"""
        MERGE INTO `{table}` t USING doomed_keys s ON t.k = s.k
        WHEN MATCHED THEN DELETE""")
    ks = {r["k"] for r in read_manifest(spark, table).collect()}
    assert len(ks) == 98 and not ({5, 7} & ks)


def test_sql_copy_into(spark, tmp_path):
    register(spark)
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    import glob
    import shutil

    for name, lo in [("a.parquet", 0), ("b.parquet", 10)]:
        tmp = os.path.join(landing, "_t")
        (spark.range(lo, lo + 10)
         .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        shutil.move(glob.glob(os.path.join(tmp, "*.parquet"))[0],
                    os.path.join(landing, name))
        shutil.rmtree(tmp)
    tbl = str(tmp_path / "tbl")
    r1 = graft_sql(spark, f"""
        COPY INTO `{tbl}` FROM '{landing}'
        FILEFORMAT = PARQUET PATTERN = '*.parquet'""").collect()[0]
    assert (r1["loaded_files"], r1["skipped_files"]) == (2, 0)
    r2 = graft_sql(spark, f"COPY INTO `{tbl}` FROM '{landing}' "
                          f"FILEFORMAT = PARQUET").collect()[0]
    assert (r2["loaded_files"], r2["skipped_files"]) == (0, 2)
    assert read_manifest(spark, tbl).count() == 20
    # FORCE = re-load registered files
    r3 = graft_sql(spark, f"""
        COPY INTO `{tbl}` FROM '{landing}' FILEFORMAT = PARQUET
        COPY_OPTIONS ('force' = 'true')""").collect()[0]
    assert r3["loaded_files"] == 2
    assert read_manifest(spark, tbl).count() == 40


def test_sql_insert_and_ctas(spark, table, tmp_path):
    graft_sql(spark,
              f"INSERT INTO `{table}` VALUES (500, 5, 0.5, 'ins')")
    rows = {r["k"]: r["name"]
            for r in read_manifest(spark, table).collect()}
    assert rows[500] == "ins" and len(rows) == 101
    dst = str(tmp_path / "ctas")
    graft_sql(spark, f"""
        CREATE TABLE `{dst}` AS
        SELECT grp, count(*) AS n, sum(val) AS total
        FROM graft.`{table}` GROUP BY grp""")
    got = {r["grp"]: r["n"]
           for r in read_manifest(spark, dst).collect()}
    assert sum(got.values()) == 101
    graft_sql(spark, f"""
        INSERT OVERWRITE `{dst}`
        SELECT grp, count(*) AS n, sum(val) AS total
        FROM graft.`{table}` WHERE k < 50 GROUP BY grp""")
    got = {r["grp"]: r["n"] for r in read_manifest(spark, dst).collect()}
    assert sum(got.values()) == 50


def test_sql_select_with_graft_refs_and_time_travel(spark, table):
    v0 = load_manifest(table)["version"]
    graft_sql(spark, f"DELETE FROM `{table}` WHERE k >= 50")
    now = graft_sql(spark, f"SELECT count(*) AS n "
                           f"FROM graft.`{table}`").collect()[0]["n"]
    then = graft_sql(
        spark, f"SELECT count(*) AS n FROM graft.`{table}` "
               f"VERSION AS OF {v0}").collect()[0]["n"]
    assert (now, then) == (50, 100)


# ------------------------------------------------------------------ DDL


def test_sql_alter_constraint_lifecycle(spark, table):
    graft_sql(spark, f"ALTER TABLE `{table}` ADD CONSTRAINT "
                     f"pos_val CHECK (val >= 0)")
    assert any(c.get("name") == "pos_val"
               for c in load_manifest(table)["constraints"])
    with pytest.raises(Exception, match="pos_val"):
        graft_sql(spark, f"INSERT INTO `{table}` "
                         f"VALUES (9999, 1, -5.0, 'bad')")
    graft_sql(spark, f"ALTER TABLE `{table}` DROP CONSTRAINT pos_val")
    assert not load_manifest(table).get("constraints")


def test_sql_alter_default_and_generated(spark, table):
    graft_sql(spark, f"ALTER TABLE `{table}` ALTER COLUMN name "
                     f"SET DEFAULT 'anon'")
    assert load_manifest(table)["columnDefaults"] == {"name": "'anon'"}
    graft_sql(spark, f"ALTER TABLE `{table}` ALTER COLUMN name "
                     f"DROP DEFAULT")
    assert not load_manifest(table).get("columnDefaults")
    graft_sql(spark, f"ALTER TABLE `{table}` ADD COLUMN k10 bigint "
                     f"GENERATED ALWAYS AS (k * 10)")
    rows = {r["k"]: r["k10"]
            for r in read_manifest(spark, table).collect()}
    assert rows[4] == 40
    assert load_manifest(table)["generatedCols"] == {"k10": "k * 10"}


def test_sql_alter_rename_drop_props_cluster(spark, table):
    graft_sql(spark, f"ALTER TABLE `{table}` RENAME COLUMN name "
                     f"TO label")
    assert "label" in read_manifest(spark, table).columns
    graft_sql(spark, f"ALTER TABLE `{table}` DROP COLUMN label")
    assert "label" not in read_manifest(spark, table).columns
    graft_sql(spark, f"ALTER TABLE `{table}` SET TBLPROPERTIES "
                     f"('targetFileRows' = '50')")
    assert load_manifest(table)["properties"]["targetFileRows"] == "50"
    graft_sql(spark, f"ALTER TABLE `{table}` CLUSTER BY (grp, k)")
    assert load_manifest(table)["clusterBy"] == ["grp", "k"]
    graft_sql(spark, f"ALTER TABLE `{table}` CLUSTER BY NONE")
    assert not load_manifest(table).get("clusterBy")


# ---------------------------------------------------------- maintenance


def test_sql_optimize_vacuum_history_detail_restore(spark, table):
    # fragment, optimize, vacuum, then restore
    for lo in (1000, 1010, 1020):
        graft_sql(spark, f"INSERT INTO `{table}` SELECT id, id % 10, "
                         f"id * 1.5, concat('row', id) FROM "
                         f"range({lo}, {lo + 10})")
    pre = read_manifest(spark, table).count()
    graft_sql(spark, f"OPTIMIZE `{table}`")
    assert read_manifest(spark, table).count() == pre
    hist = graft_sql(spark, f"DESCRIBE HISTORY `{table}`")
    ops = [r["operation"] for r in hist.collect()]
    assert "REWRITE" in ops and ops[-1] == "CREATE"
    detail = graft_sql(spark,
                       f"DESCRIBE DETAIL `{table}`").collect()[0]
    assert detail["num_rows"] == pre
    v_opt = load_manifest(table)["version"]
    res = graft_sql(spark, f"VACUUM `{table}` RETAIN 1 VERSIONS")
    assert res.collect()[0]["operation"] == "VACUUM"
    graft_sql(spark, f"DELETE FROM `{table}` WHERE k >= 1000")
    graft_sql(spark,
              f"RESTORE TABLE `{table}` TO VERSION AS OF {v_opt}")
    assert read_manifest(spark, table).count() == pre


def test_sql_optimize_zorder(spark, table):
    graft_sql(spark, f"OPTIMIZE `{table}` ZORDER BY (grp, k)")
    m = load_manifest(table)
    live = [f for f in m["files"] if not f.get("dead")]
    assert live and all(f.get("clusteredBy") for f in live)
    # z-ordering a column with no stats surfaces the engine's
    # contract error, not a silent mis-layout
    with pytest.raises(ValueError, match="no stats"):
        graft_sql(spark, f"OPTIMIZE `{table}` ZORDER BY (val)")


# --------------------------------------------------------- error paths


def test_sql_error_paths(spark, table):
    with pytest.raises(ValueError, match="unsupported statement"):
        graft_sql(spark, f"GRANT SELECT ON `{table}` TO alice")
    with pytest.raises(ValueError, match="malformed assignment"):
        graft_sql(spark, f"UPDATE `{table}` SET val WHERE k = 1")
    with pytest.raises(ValueError, match="unknown column"):
        graft_sql(spark, f"UPDATE `{table}` SET nope = 1")
    with pytest.raises(ValueError, match="assigned twice"):
        graft_sql(spark, f"UPDATE `{table}` SET val = 1, val = 2")
    with pytest.raises(ValueError, match="backtick-quoted"):
        graft_sql(spark, "DELETE FROM not_a_path WHERE k = 1")
    spark.createDataFrame([(1,)], "k long") \
        .createOrReplaceTempView("one_key")
    with pytest.raises(ValueError, match="non-equi"):
        graft_sql(spark, f"MERGE INTO `{table}` t USING one_key s "
                         f"ON t.k > s.k WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="unknown alias"):
        graft_sql(spark, f"MERGE INTO `{table}` t USING one_key s "
                         f"ON t.k = x.k WHEN MATCHED THEN DELETE")
    with pytest.raises(ValueError, match="LAST of its kind"):
        graft_sql(spark, f"MERGE INTO `{table}` t USING one_key s "
                         f"ON t.k = s.k "
                         f"WHEN MATCHED THEN DELETE "
                         f"WHEN MATCHED AND s.k = 1 THEN DELETE")
    with pytest.raises(ValueError, match="trailing"):
        graft_sql(spark, f"DELETE FROM `{table}` garbage here")
    with pytest.raises(ValueError, match="RETAIN"):
        graft_sql(spark, f"VACUUM `{table}` RETAIN 5 FORTNIGHTS")
    with pytest.raises(ValueError, match="SHOW COLUMNS"):
        graft_sql(spark, f"SHOW COLUMNS `{table}`")  # missing FROM/IN
    with pytest.raises(ValueError, match="empty statement"):
        graft_sql(spark, "   ;")


def test_sql_statement_strings_keep_keywords_intact(spark, table):
    # WHERE/AND inside string literals must not confuse the parser
    graft_sql(spark, f"UPDATE `{table}` SET name = 'WHERE AND SET' "
                     f"WHERE k = 1")
    r = read_manifest(spark, table).filter("k = 1").collect()[0]
    assert r["name"] == "WHERE AND SET"


def test_sql_add_column_metadata_only(spark, table):
    """Round 9: plain ADD COLUMN is an O(1) metadata commit — no data
    file touched; existing rows NULL-fill at read; later appends
    carry values; dropped/renamed names are refused."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_column_to_manifest,
    )

    files0 = {f["path"] for f in load_manifest(table)["files"]}
    graft_sql(spark, f"ALTER TABLE `{table}` ADD COLUMN note string")
    m = load_manifest(table)
    assert {f["path"] for f in m["files"]} == files0, "metadata only"
    rows = read_manifest(spark, table).collect()
    assert all(r["note"] is None for r in rows) and len(rows) == 100
    graft_sql(spark, f"INSERT INTO `{table}` "
                     f"VALUES (777, 7, 7.0, 'x', 'noted')")
    got = read_manifest(spark, table).filter("k = 777").collect()[0]
    assert got["note"] == "noted"
    with pytest.raises(ValueError, match="already exists"):
        graft_sql(spark, f"ALTER TABLE `{table}` ADD COLUMN note string")
    graft_sql(spark, f"ALTER TABLE `{table}` DROP COLUMN note")
    with pytest.raises(ValueError, match="previously dropped"):
        add_column_to_manifest(spark, table, "note", "string")
    graft_sql(spark, f"ALTER TABLE `{table}` RENAME COLUMN name "
                     f"TO label")
    with pytest.raises(ValueError, match="rename chain"):
        add_column_to_manifest(spark, table, "name", "string")
    # decimal types parse through fromDDL
    graft_sql(spark, f"ALTER TABLE `{table}` ADD COLUMN amt "
                     f"decimal(12,2)")
    assert "amt" in read_manifest(spark, table).columns


def test_sql_truncate_and_dv_delete_property(spark, table):
    """TRUNCATE TABLE is metadata-only through SQL; and with
    enableDeletionVectors set, DELETE goes merge-on-read (no file
    rewritten) — the Delta property contract."""
    graft_sql(spark, f"ALTER TABLE `{table}` SET TBLPROPERTIES "
                     f"('enableDeletionVectors' = 'true')")
    files0 = {f["path"] for f in load_manifest(table)["files"]}
    graft_sql(spark, f"DELETE FROM `{table}` WHERE grp = 4")
    m = load_manifest(table)
    assert {f["path"] for f in m["files"]} == files0, "DV, not CoW"
    assert any(f.get("dv") for f in m["files"])
    assert read_manifest(spark, table).count() == 90
    res = graft_sql(spark, f"TRUNCATE TABLE `{table}`")
    assert res.collect()[0]["operation"] == "TRUNCATE"
    assert read_manifest(spark, table).count() == 0
    assert {f["path"] for f in load_manifest(table)["files"]} == files0


def test_sql_optimize_where_scopes_partition(spark, tmp_path):
    """OPTIMIZE `t` WHERE p = <literal> compacts ONLY that
    partition's files (Delta's OPTIMIZE WHERE) — other partitions'
    entries stay byte-identical."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        write_frame,
    )

    register(spark)
    path = str(tmp_path / "pt")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 2).alias("p"), F.col("id").alias("k"))

    write_frame(batch(0, 100).repartition(2), path, "overwrite",
                statCols="k", partitionCols="p")
    for lo in (100, 120):
        write_frame(batch(lo, lo + 20), path, "append",
                    statCols="k", partitionCols="p")
    graft_sql(spark, f"ALTER TABLE `{path}` SET TBLPROPERTIES "
                     f"('targetFileRows' = '100000')")

    def live_parts(val):
        return {f["path"] for f in load_manifest(path)["files"]
                if not f.get("dead")
                and str((f.get("partition") or {}).get("p")) == val}

    p1_before = live_parts("1")
    assert len(live_parts("0")) > 1, "fixture must be fragmented"
    graft_sql(spark, f"OPTIMIZE `{path}` WHERE p = 1")
    assert live_parts("1") != p1_before, "p=1 compacted"
    # p=0 untouched by the scoped run
    n0 = len(live_parts("0"))
    assert n0 > 1
    assert read_manifest(spark, path).count() == 140
    with pytest.raises(ValueError, match="expected '='"):
        graft_sql(spark, f"OPTIMIZE `{path}` WHERE p > 1")
    with pytest.raises(ValueError, match="col = literal"):
        graft_sql(spark, f"OPTIMIZE `{path}` WHERE p = 1 OR p = 0")


def test_sql_where_derives_stats_pruning_filters(spark, table,
                                                 monkeypatch):
    """The SQL UPDATE/DELETE path derives stats-pruning filters from
    simple WHERE conjuncts — a selective statement FIND-scans the
    stats-surviving slice, not every candidate file (the 100 TB
    reason the API forms take `filters` explicitly)."""
    import data_engineering_pipeline_project_cloud_spark.sources.manifest_source as ms
    from data_engineering_pipeline_project_cloud_spark.statements import (
        _derive_filters,
    )

    # unit: shapes that must derive, and shapes that must not
    assert _derive_filters(spark, table, "k <= 10") == \
        [("k", "<=", 10)]
    assert _derive_filters(
        spark, table, "grp IN (1, 2) AND name = 'x' AND k > 5") == \
        [("grp", "in", [1, 2]), ("name", "=", "x"), ("k", ">", 5)]
    # unsound or unparseable shapes are skipped, never guessed
    assert _derive_filters(spark, table, "k = 1 OR grp = 2") is None
    assert _derive_filters(spark, table, "upper(name) = 'X'") is None
    assert _derive_filters(spark, table, "k = '5'") is None  # type mix
    assert _derive_filters(spark, table, "k = 5 + 1") is None
    assert _derive_filters(
        spark, table, "nope = 1 AND k < 3") == [("k", "<", 3)]

    # integration: the pruned UPDATE touches only the one range file
    seen: dict = {}
    real = ms.update_manifest

    def spy(spark_, path_, set_exprs, where, stat_cols=None,
            filters=None, subquery=False):
        seen["filters"] = filters
        return real(spark_, path_, set_exprs, where,
                    stat_cols=stat_cols, filters=filters,
                    subquery=subquery)

    monkeypatch.setattr(ms, "update_manifest", spy)
    graft_sql(spark, f"UPDATE `{table}` SET name = 'hit' "
                     f"WHERE k = 50")
    assert seen["filters"] == [("k", "=", 50)]
    rows = {r["k"]: r["name"]
            for r in read_manifest(spark, table).collect()}
    assert rows[50] == "hit" and rows[49] == "row49"


def test_sql_timestamp_as_of(spark, table):
    """TIMESTAMP AS OF time travel through SELECT graft refs and
    RESTORE (resolved to the latest version committed at or before
    the stamp, Delta's contract)."""
    import time

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _commit_time,
    )

    v0 = load_manifest(table)["version"]
    t0 = _commit_time(table, v0)
    time.sleep(0.05)
    graft_sql(spark, f"DELETE FROM `{table}` WHERE k >= 50")
    stamp = str(t0)  # _parse_ts accepts epoch seconds or UTC dates
    n_then = graft_sql(
        spark, f"SELECT count(*) AS n FROM graft.`{table}` "
               f"TIMESTAMP AS OF '{stamp}'").collect()[0]["n"]
    assert n_then == 100
    graft_sql(spark, f"RESTORE TABLE `{table}` TO TIMESTAMP AS OF "
                     f"'{stamp}'")
    assert read_manifest(spark, table).count() == 100
    with pytest.raises(ValueError, match="VERSION AS OF"):
        graft_sql(spark, f"RESTORE TABLE `{table}` TO YESTERDAY")


def test_sql_create_table_existence_semantics(spark, table, tmp_path):
    dst = str(tmp_path / "ct")
    graft_sql(spark, f"CREATE TABLE `{dst}` AS "
                     f"SELECT k FROM graft.`{table}` WHERE k < 10")
    assert read_manifest(spark, dst).count() == 10
    with pytest.raises(ValueError, match="already exists"):
        graft_sql(spark, f"CREATE TABLE `{dst}` AS "
                         f"SELECT k FROM graft.`{table}`")
    r = graft_sql(spark, f"CREATE TABLE IF NOT EXISTS `{dst}` AS "
                         f"SELECT k FROM graft.`{table}`").collect()[0]
    assert "exists" in r["operation"]
    assert read_manifest(spark, dst).count() == 10  # untouched
    graft_sql(spark, f"CREATE OR REPLACE TABLE `{dst}` AS "
                     f"SELECT k FROM graft.`{table}` WHERE k < 5")
    assert read_manifest(spark, dst).count() == 5
    with pytest.raises(ValueError, match="does not exist"):
        graft_sql(spark, f"INSERT INTO `{tmp_path / 'nope'}` "
                         f"VALUES (1)")


def test_sql_convert_to_adopts_plain_parquet(spark, tmp_path):
    """CONVERT TO (Delta's CONVERT TO DELTA): an existing plain
    parquet directory becomes a manifest table in place — zero
    rewrite, footer-harvested stats, and the full surface (DML, time
    travel) from the first commit."""
    import glob

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        manifest_files,
    )

    plain = str(tmp_path / "plain")
    (spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("n"), F.col("id")).alias("name"))
     .repartition(4).write.mode("overwrite").parquet(plain))
    before = sorted(glob.glob(os.path.join(plain, "*.parquet")))
    r = graft_sql(spark, f"CONVERT TO GRAFT `{plain}`").collect()[0]
    assert (r["num_files"], r["num_rows"]) == (4, 100)
    # zero rewrite: the adopted files ARE the table
    assert sorted(glob.glob(os.path.join(plain, "*.parquet"))) == before
    assert {f["path"] for f in load_manifest(plain)["files"]} == \
        set(before)
    # stats harvested → pruning works; full surface works
    got = read_manifest(spark, plain)
    assert got.count() == 100
    assert manifest_files(spark, plain).count() == 4
    graft_sql(spark, f"UPDATE `{plain}` SET name = 'hit' WHERE k = 3")
    assert read_manifest(spark, plain).filter("k = 3") \
        .collect()[0]["name"] == "hit"
    # refusal matrix: double convert, hive layout, empty dir
    with pytest.raises(ValueError, match="already a manifest"):
        graft_sql(spark, f"CONVERT TO GRAFT `{plain}`")
    hive = str(tmp_path / "hive")
    (spark.range(10).select((F.col("id") % 2).alias("p"),
                            F.col("id").alias("k"))
     .write.partitionBy("p").mode("overwrite").parquet(hive))
    with pytest.raises(ValueError, match="Hive-partitioned"):
        graft_sql(spark, f"CONVERT TO GRAFT `{hive}`")
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet files"):
        graft_sql(spark, f"CONVERT TO GRAFT `{empty}`")


def test_sql_comments_are_skipped(spark, table):
    graft_sql(spark, f"""
        -- audit pass
        UPDATE `{table}` /* inline note */ SET name = 'c'
        WHERE k = 1  -- only the first row
    """)
    rows = {r["k"]: r["name"]
            for r in read_manifest(spark, table)
            .filter("k < 3").collect()}
    assert rows == {0: "row0", 1: "c", 2: "row2"}
    n = graft_sql(spark, f"SELECT count(*) AS n -- tail comment\n"
                         f"FROM graft.`{table}`").collect()[0]["n"]
    assert n == 100


def test_sql_describe_history_labels_round9_ops(spark, tmp_path):
    """Operation labels across the round-9 surface: CONVERT lands as
    the CREATE-shaped v0 (truncate delta), a DV DELETE labels
    DELETE (DV), an UPDATE labels REWRITE, ADD COLUMN labels
    ADD COLUMN, TRUNCATE labels REWRITE (tombstone-only commit)."""
    plain = str(tmp_path / "hist_ops")
    (spark.range(20).select(F.col("id").alias("k"),
                            (F.col("id") % 3).alias("g"))
     .coalesce(2).write.mode("overwrite").parquet(plain))
    import glob
    for junk in glob.glob(os.path.join(plain, "_SUCCESS")):
        os.remove(junk)
    graft_sql(spark, f"CONVERT TO GRAFT `{plain}`")            # v0
    graft_sql(spark, f"ALTER TABLE `{plain}` SET TBLPROPERTIES "
                     f"('enableDeletionVectors' = 'true')")    # v1
    graft_sql(spark, f"DELETE FROM `{plain}` WHERE k = 3")     # v2 DV
    graft_sql(spark, f"UPDATE `{plain}` SET g = 0 WHERE k = 5")  # v3
    graft_sql(spark, f"ALTER TABLE `{plain}` ADD COLUMN note "
                     f"string")                                # v4
    graft_sql(spark, f"TRUNCATE TABLE `{plain}`")              # v5
    hist = {r["version"]: r["operation"]
            for r in graft_sql(
                spark, f"DESCRIBE HISTORY `{plain}`").collect()}
    assert hist[0] == "CREATE"
    assert hist[1] == "SET TBLPROPERTIES"
    assert hist[2] == "DELETE (DV)"
    assert hist[3] == "REWRITE"
    assert hist[4] == "ADD COLUMN"
    assert hist[5] == "REWRITE"  # tombstone-only truncate commit


# ------------------------------------------------- round-10 ADVICE fixes


def test_derive_filters_bails_on_mixed_and_or(spark, table):
    """ADVICE r9 (high): AND binds tighter than OR, so splitting
    'a = 1 AND b = 2 OR c = 3' on AND yields pieces the predicate
    does NOT imply — any top-level OR must disable derivation."""
    from data_engineering_pipeline_project_cloud_spark.statements import (
        _derive_filters,
    )

    assert _derive_filters(
        spark, table, "k = 1 AND grp = 2 OR name = 'x'") is None
    assert _derive_filters(
        spark, table, "grp = 2 OR k = 1 AND name = 'x'") is None
    # parenthesized OR is not top-level: that conjunct is skipped but
    # sound siblings still derive
    assert _derive_filters(
        spark, table, "(grp = 2 OR grp = 3) AND k < 5") == \
        [("k", "<", 5)]


def test_sql_update_mixed_and_or_hits_or_branch(spark, table):
    """Integration regression for the same defect: the row matching
    only the OR branch (k=99) must be updated even though a filter
    naively derived from 'k = 1' would have stats-pruned its file."""
    graft_sql(spark, f"UPDATE `{table}` SET val = -1 "
                     f"WHERE k = 1 AND grp = 2 OR name = 'row99'")
    rows = {r["k"]: r["val"]
            for r in read_manifest(spark, table).collect()}
    assert rows[99] == -1.0          # OR branch touched
    assert rows[1] == 1.5            # k=1 has grp=1: no match
    assert rows[98] == 98 * 1.5      # everything else untouched


def test_sql_delta_prefix_consistent_read_write(spark, table):
    """ADVICE r9 (low): delta.`path` is accepted in DML table refs,
    so SELECT and MERGE USING must resolve it too."""
    n = graft_sql(
        spark, f"SELECT count(*) AS n FROM delta.`{table}`"
    ).collect()[0]["n"]
    assert n == 100
    graft_sql(spark, f"UPDATE delta.`{table}` SET val = 0 "
                     f"WHERE k = 0")
    assert read_manifest(spark, table) \
        .filter("k = 0").collect()[0]["val"] == 0.0


def test_sql_delete_merge_missing_target_value_error(spark, tmp_path):
    """ADVICE r9 (low): a missing target path raises the documented
    ValueError (with the path), never a raw FileNotFoundError."""
    ghost = str(tmp_path / "nope")
    with pytest.raises(ValueError, match="does not exist"):
        graft_sql(spark, f"DELETE FROM `{ghost}` WHERE 1 = 1")
    spark.createDataFrame([(1,)], "k long") \
        .createOrReplaceTempView("ghost_src")
    with pytest.raises(ValueError, match="does not exist"):
        graft_sql(spark, f"MERGE INTO `{ghost}` t USING ghost_src s "
                         f"ON t.k = s.k WHEN MATCHED THEN DELETE")


def test_sql_backslash_escaped_quote_lexes(spark, table):
    """ADVICE r9 (low): Spark SQL accepts backslash-escaped quotes;
    the statement lexer must too (previously a tokenize error)."""
    graft_sql(spark, f"UPDATE `{table}` SET name = 'it\\'s' "
                     f"WHERE k = 2")
    r = read_manifest(spark, table).filter("k = 2").collect()[0]
    assert r["name"] == "it's"
    # and in the parser's own consumed strings (COPY INTO paths etc.)
    from data_engineering_pipeline_project_cloud_spark.statements import _P
    q = _P(r"'a\'b' rest")
    assert q.string() == "a'b"


# ---------------------------------------------- round-10 DML subqueries


def test_sql_delete_in_subquery_over_graft_table(spark, table,
                                                 tmp_path):
    lk = str(tmp_path / "lk")
    write_manifest_table(
        spark.createDataFrame([(3,), (5,), (7,)], "kk long"), lk,
        ["kk"])
    graft_sql(spark, f"DELETE FROM `{table}` WHERE k IN "
                     f"(SELECT kk FROM graft.`{lk}`)")
    ks = {r["k"] for r in read_manifest(spark, table).collect()}
    assert ks == set(range(100)) - {3, 5, 7}


def test_sql_update_with_correlated_exists(spark, table):
    spark.createDataFrame([(10,), (11,)], "m long") \
        .createOrReplaceTempView("sq_marks")
    graft_sql(spark, f"UPDATE `{table}` SET name = 'marked' WHERE "
                     f"EXISTS (SELECT 1 FROM sq_marks WHERE "
                     f"sq_marks.m = k)")
    rows = {r["k"]: r["name"]
            for r in read_manifest(spark, table).collect()}
    assert rows[10] == "marked" and rows[11] == "marked"
    assert rows[12] == "row12"


def test_sql_delete_not_in_with_null_deletes_nothing(spark, table):
    """ANSI NOT IN: a NULL in the subquery result makes the predicate
    never TRUE — nothing deletes (the spark.sql route gives this for
    free; a naive anti-join would delete everything)."""
    spark.createDataFrame([(1,), (None,)], "n long") \
        .createOrReplaceTempView("sq_null")
    graft_sql(spark, f"DELETE FROM `{table}` WHERE k NOT IN "
                     f"(SELECT n FROM sq_null)")
    assert read_manifest(spark, table).count() == 100


def test_sql_delete_subquery_dv_route(spark, table):
    """Subquery predicates compose with the deletion-vector route."""
    graft_sql(spark, f"ALTER TABLE `{table}` SET TBLPROPERTIES "
                     f"('enableDeletionVectors' = 'true')")
    spark.createDataFrame([(42,), (43,)], "d long") \
        .createOrReplaceTempView("sq_dv")
    res = graft_sql(spark, f"DELETE FROM `{table}` WHERE k IN "
                           f"(SELECT d FROM sq_dv)")
    assert res.collect()[0]["operation"] == "DELETE"
    ks = {r["k"] for r in read_manifest(spark, table).collect()}
    assert ks == set(range(100)) - {42, 43}
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
    )
    # merge-on-read: no file rewritten, masks recorded
    assert any(f.get("dv") for f in load_manifest(table)["files"])


def test_sql_update_subquery_keeps_simple_filter_derivation(
        spark, table, monkeypatch):
    """The non-subquery conjunct still derives a stats-pruning filter
    and the subquery flag reaches the API."""
    import data_engineering_pipeline_project_cloud_spark.sources.manifest_source as ms

    seen = {}
    real = ms.update_manifest

    def spy(spark_, path_, set_exprs, where, stat_cols=None,
            filters=None, subquery=False):
        seen["filters"] = filters
        seen["subquery"] = subquery
        return real(spark_, path_, set_exprs, where,
                    stat_cols=stat_cols, filters=filters,
                    subquery=subquery)

    monkeypatch.setattr(ms, "update_manifest", spy)
    spark.createDataFrame([(50,)], "m long") \
        .createOrReplaceTempView("sq_one")
    graft_sql(spark, f"UPDATE `{table}` SET name = 'hit' WHERE "
                     f"k >= 50 AND k IN (SELECT m FROM sq_one)")
    assert seen["subquery"] is True
    assert seen["filters"] == [("k", ">=", 50)]
    rows = {r["k"]: r["name"]
            for r in read_manifest(spark, table).collect()}
    assert rows[50] == "hit" and rows[51] == "row51"


# ----------------------------------------------- round-10 DDL additions


def test_sql_alter_column_type_widens(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "w")
    write_manifest_table(
        spark.range(0, 10).select(F.col("id").cast("int").alias("k"),
                                  (F.col("id").cast("float"))
                                  .alias("x")), path, ["k"])
    graft_sql(spark, f"ALTER TABLE `{path}` ALTER COLUMN k TYPE "
                     f"bigint")
    graft_sql(spark, f"ALTER TABLE `{path}` ALTER COLUMN x SET DATA "
                     f"TYPE double")
    df = read_manifest(spark, path)
    assert dict(df.dtypes) == {"k": "bigint", "x": "double"}
    # existing rows upcast losslessly
    assert df.agg(F.sum("k")).collect()[0][0] == 45
    # narrowing / cross-family refused
    with pytest.raises(ValueError, match="widening"):
        graft_sql(spark, f"ALTER TABLE `{path}` ALTER COLUMN k "
                         f"TYPE int")
    with pytest.raises(ValueError, match="widening"):
        graft_sql(spark, f"ALTER TABLE `{path}` ALTER COLUMN x "
                         f"TYPE bigint")
    # metadata-only: no data file touched
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
    )
    assert not any(f.get("dead") for f in load_manifest(path)["files"])


def test_sql_plain_describe_lists_schema(spark, table):
    graft_sql(spark, f"ALTER TABLE `{table}` ALTER COLUMN name "
                     f"SET DEFAULT 'anon'")
    rows = {r["col_name"]: r
            for r in graft_sql(spark,
                               f"DESCRIBE `{table}`").collect()}
    assert rows["k"]["data_type"] == "bigint"
    assert rows["name"]["extra"] == "DEFAULT 'anon'"
    # DESCRIBE EXTENDED (round 11): same listing + the detail section
    ext = {r["col_name"]: r["data_type"]
           for r in graft_sql(spark,
                              f"DESCRIBE EXTENDED `{table}`").collect()}
    assert ext["k"] == "bigint"
    assert ext["Provider"] == "GRAFT"
    assert "# Detailed Table Information" in ext


def test_string_literal_escape_table():
    """Backslash escapes decode per Spark's lexer (ADVICE r10): '\\n'
    is a NEWLINE, not the letter n; regex/path backslashes survive
    where Spark's own unescape keeps them."""
    from data_engineering_pipeline_project_cloud_spark.statements import _P

    def lit(src: str) -> str:
        return _P(src).string()

    assert lit(r"'a\nb'") == "a\nb"
    assert lit(r"'a\tb'") == "a\tb"
    assert lit(r"'a\\b'") == "a\\b"
    assert lit(r"'it''s'") == "it's"
    assert lit(r"'a\%b'") == r"a\%b"     # LIKE escape keeps backslash
    assert lit(r"'a\_b'") == r"a\_b"
    assert lit(r"'a\qb'") == "aqb"       # unknown pair: drop backslash


def test_comma_from_list_resolves_graft_refs(spark, table):
    # round-11 review regression: the table-position gate must treat
    # a comma that continues a FROM list as table position
    got = graft_sql(spark, f"""
        SELECT COUNT(*) AS n
        FROM graft.`{table}` a, graft.`{table}` b
        WHERE a.k = b.k
    """).collect()[0]["n"]
    rows = graft_sql(spark, f"SELECT COUNT(*) AS n "
                            f"FROM graft.`{table}`").collect()[0]["n"]
    assert got == rows
    # ...while an IN-list comma before an alias named like a prefix
    # still does NOT resolve as a table (alias passthrough intact)
    ok = graft_sql(spark, f"""
        SELECT delta.k FROM (SELECT k FROM graft.`{table}`
                             WHERE k IN (1, 2)) delta
    """).count()
    assert ok <= 2
