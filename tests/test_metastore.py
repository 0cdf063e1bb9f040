"""Name → path catalog (``sources.metastore`` + the SQL surface —
VERDICT r9 task 4): CREATE TABLE name LOCATION / CTAS, SHOW TABLES,
DROP TABLE, names usable wherever backtick paths are, CAS-versioned
state that survives a fresh process, managed-vs-external drop
semantics.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark import graft_sql
from data_engineering_pipeline_project_cloud_spark.sources import metastore as ms
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    read_manifest,
    register,
    write_manifest_table,
)


@pytest.fixture()
def cat(spark, tmp_path):
    cdir = str(tmp_path / "catalog")
    spark.conf.set("spark.graft.catalogDir", cdir)
    yield cdir
    spark.conf.unset("spark.graft.catalogDir")


@pytest.fixture()
def src(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "data")
    write_manifest_table(
        spark.range(0, 10).select(F.col("id").alias("k"),
                                  (F.col("id") * 1.0).alias("v")),
        path, ["k"])
    return path


def test_catalog_names_work_everywhere(spark, cat, src):
    graft_sql(spark, f"CREATE TABLE orders LOCATION '{src}'")
    # DML by name
    graft_sql(spark, "UPDATE orders SET v = -1 WHERE k = 3")
    graft_sql(spark, "DELETE FROM orders WHERE k = 4")
    # SELECT + time travel by name
    assert graft_sql(spark, "SELECT count(*) AS n FROM graft.orders"
                     ).collect()[0]["n"] == 9
    assert graft_sql(spark, "SELECT count(*) AS n FROM graft.orders "
                            "VERSION AS OF 0").collect()[0]["n"] == 10
    # DDL by name
    graft_sql(spark, "ALTER TABLE orders ADD CONSTRAINT big "
                     "CHECK (k >= 0)")
    graft_sql(spark, "DESCRIBE HISTORY orders")
    # MERGE by name, source by name
    graft_sql(spark, "MERGE INTO orders t USING orders s "
                     "ON t.k = s.k "
                     "WHEN MATCHED AND s.k = 5 THEN UPDATE SET "
                     "v = 500")
    out = {r["k"]: r["v"] for r in read_manifest(spark, src).collect()}
    assert out[5] == 500.0 and out[3] == -1.0 and 4 not in out


def test_catalog_managed_ctas_and_drop(spark, cat, src):
    graft_sql(spark, f"CREATE TABLE base LOCATION '{src}'")
    graft_sql(spark, "CREATE TABLE agg AS SELECT k % 2 AS p, "
                     "count(*) AS n FROM graft.base GROUP BY k % 2")
    rows = {r["name"]: r for r in
            graft_sql(spark, "SHOW TABLES").collect()}
    assert rows["agg"]["managed"] is True
    assert rows["base"]["managed"] is False
    loc = rows["agg"]["location"]
    assert loc.startswith(cat)
    graft_sql(spark, "DROP TABLE agg")
    assert not os.path.exists(loc)  # managed: data goes with the name
    graft_sql(spark, "DROP TABLE base")
    assert os.path.exists(src)      # external: data survives
    assert graft_sql(spark, "SHOW TABLES").count() == 0


def test_catalog_create_semantics(spark, cat, src, tmp_path):
    graft_sql(spark, f"CREATE TABLE t LOCATION '{src}'")
    with pytest.raises(ValueError, match="already exists"):
        graft_sql(spark, f"CREATE TABLE t LOCATION '{src}'")
    graft_sql(spark, f"CREATE TABLE IF NOT EXISTS t LOCATION '{src}'")
    other = str(tmp_path / "other")
    write_manifest_table(spark.range(3).select(F.col("id").alias("k")),
                         other, ["k"])
    graft_sql(spark, f"CREATE OR REPLACE TABLE t LOCATION '{other}'")
    assert ms.resolve_table(spark, "t") == other
    # names are case-insensitive, validated
    assert ms.resolve_table(spark, "T") == other
    with pytest.raises(ValueError, match="invalid table name"):
        ms.create_table_entry(spark, "bad name!", "/x")
    with pytest.raises(ValueError, match="invalid table name"):
        ms.create_table_entry(spark, "a.b", "/x")
    with pytest.raises(ValueError, match="no manifest table"):
        graft_sql(spark, f"CREATE TABLE ghost LOCATION "
                         f"'{tmp_path / 'ghost'}'")
    with pytest.raises(ValueError, match="LOCATION"):
        graft_sql(spark, "CREATE TABLE bare")


def test_catalog_is_versioned_and_survives_reload(spark, cat, src):
    graft_sql(spark, f"CREATE TABLE a LOCATION '{src}'")
    graft_sql(spark, "DROP TABLE a")
    graft_sql(spark, f"CREATE TABLE b LOCATION '{src}'")
    # versioned snapshots on disk: v0 create, v1 drop, v2 create
    assert ms.load_catalog(cat)["version"] == 2
    assert set(ms.load_catalog(cat, 0)["tables"]) == {"a"}
    assert set(ms.load_catalog(cat, 1)["tables"]) == set()
    # a fresh reader (new process) sees the latest state from disk
    assert ms.resolve_table(None, "b") == src \
        if os.environ.get("GRAFT_CATALOG_DIR") == cat else True
    assert set(ms.load_catalog(cat)["tables"]) == {"b"}
    # compensating restore publishes a NEW version (append-only)
    ms.restore_catalog(spark, 0)
    assert set(ms.load_catalog(cat)["tables"]) == {"a"}
    assert ms.load_catalog(cat)["version"] == 3


def test_catalog_unknown_name_error_lists_options(spark, cat, src):
    graft_sql(spark, f"CREATE TABLE known LOCATION '{src}'")
    with pytest.raises(ValueError, match="unknown table name"):
        graft_sql(spark, "UPDATE missing SET v = 1")
    with pytest.raises(ValueError, match="known"):
        graft_sql(spark, "DELETE FROM missing WHERE k = 1")


def test_catalog_views_lifecycle(spark, cat, src):
    graft_sql(spark, f"CREATE TABLE base LOCATION '{src}'")
    graft_sql(spark, "CREATE VIEW evens AS SELECT k, v FROM "
                     "graft.base WHERE k % 2 = 0")
    assert graft_sql(spark, "SELECT count(*) AS n FROM graft.evens"
                     ).collect()[0]["n"] == 5
    # views compose (view over view), and reflect the CURRENT table
    graft_sql(spark, "CREATE VIEW evens_small AS SELECT * FROM "
                     "graft.evens WHERE k < 4")
    graft_sql(spark, "DELETE FROM base WHERE k = 0")
    assert graft_sql(spark, "SELECT count(*) AS n FROM "
                            "graft.evens_small"
                     ).collect()[0]["n"] == 1  # k=2 only
    rows = {r["name"]: r["kind"]
            for r in graft_sql(spark, "SHOW TABLES").collect()}
    assert rows == {"base": "table", "evens": "view",
                    "evens_small": "view"}
    # a view is not a DML target, and DROP statements check kind
    with pytest.raises(ValueError, match="VIEW"):
        graft_sql(spark, "UPDATE evens SET v = 1")
    with pytest.raises(ValueError, match="is a view"):
        graft_sql(spark, "DROP TABLE evens")
    with pytest.raises(ValueError, match="is a table"):
        graft_sql(spark, "DROP VIEW base")
    graft_sql(spark, "DROP VIEW evens_small")
    graft_sql(spark, "DROP VIEW evens")
    assert graft_sql(spark, "SHOW TABLES").count() == 1


def test_catalog_view_create_validates_eagerly(spark, cat, src):
    graft_sql(spark, f"CREATE TABLE base LOCATION '{src}'")
    with pytest.raises(Exception):
        graft_sql(spark, "CREATE VIEW broken AS SELECT nope "
                         "FROM graft.base")
    names = {r["name"]
             for r in graft_sql(spark, "SHOW TABLES").collect()}
    assert "broken" not in names
    # OR REPLACE repoints; plain CREATE refuses
    graft_sql(spark, "CREATE VIEW v1 AS SELECT k FROM graft.base")
    with pytest.raises(ValueError, match="already exists"):
        graft_sql(spark, "CREATE VIEW v1 AS SELECT v FROM graft.base")
    graft_sql(spark, "CREATE OR REPLACE VIEW v1 AS "
                     "SELECT v FROM graft.base")
    cols = graft_sql(spark, "SELECT * FROM graft.v1").columns
    assert cols == ["v"]


def test_catalog_concurrent_creates_all_land(spark, cat, src):
    """The CAS mutation loop under racing writers: every create lands
    exactly once (lost publishes rebase and retry), the same
    put-if-absent discipline as table commits."""
    from concurrent.futures import ThreadPoolExecutor

    def mk(i: int) -> None:
        ms.create_table_entry(spark, f"race{i}", src)

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(mk, range(8)))
    names = {r["name"] for r in ms.list_tables(spark)}
    assert names == {f"race{i}" for i in range(8)}
    # one version per successful publish: exactly 8 snapshots
    assert ms.load_catalog(cat)["version"] == 7


def test_show_views_and_tblproperties(spark, cat, src):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        set_table_properties,
    )

    graft_sql(spark, f"CREATE TABLE base LOCATION '{src}'")
    graft_sql(spark, "CREATE VIEW only_v AS SELECT k FROM graft.base")
    vs = graft_sql(spark, "SHOW VIEWS").collect()
    assert [r["name"] for r in vs] == ["only_v"]
    set_table_properties(src, {"enableDeletionVectors": "true",
                               "owner": "etl"})
    props = {r["key"]: r["value"]
             for r in graft_sql(spark,
                                "SHOW TBLPROPERTIES base").collect()}
    assert props == {"enableDeletionVectors": "true", "owner": "etl"}


def test_alias_named_delta_passes_through(spark, cat, src):
    """A query alias literally named ``delta``/``graft`` is NOT a
    catalog reference (ADVICE r10): only tokens in table position
    (after FROM/JOIN/USING/INTO) resolve through the metastore."""
    graft_sql(spark, f"CREATE TABLE base LOCATION '{src}'")
    rows = graft_sql(spark, """
        SELECT delta.change AS change
        FROM (SELECT k AS change FROM graft.base WHERE k = 3) delta
    """).collect()
    assert [r["change"] for r in rows] == [3]
    # alias-qualified columns in ON clauses pass through too
    rows = graft_sql(spark, """
        SELECT graft.k AS k FROM graft.base graft
        JOIN graft.base b ON graft.k = b.k AND graft.k = 5
    """).collect()
    assert [r["k"] for r in rows] == [5]
    # a genuinely unknown name IN table position still raises
    with pytest.raises(ValueError, match="unknown table name"):
        graft_sql(spark, "SELECT * FROM graft.nope")


def test_or_replace_repoint_removes_managed_dir(spark, cat, src):
    """CREATE OR REPLACE repointing a MANAGED table to an external
    location removes the old managed data directory (ADVICE r10) —
    the same contract DROP TABLE honors; an orphaned directory with
    no catalog reference would leak forever."""
    graft_sql(spark, "CREATE TABLE mgd AS SELECT 1 AS k")
    old_loc = ms.resolve_table(spark, "mgd")
    assert os.path.isdir(old_loc)
    graft_sql(spark, f"CREATE OR REPLACE TABLE mgd LOCATION '{src}'")
    assert not os.path.exists(old_loc)
    assert ms.resolve_table(spark, "mgd") == src
    # repointing an EXTERNAL entry never touches its data
    graft_sql(spark, "CREATE OR REPLACE TABLE mgd AS SELECT 2 AS k")
    assert os.path.isdir(src)
