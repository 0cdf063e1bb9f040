"""DDL-complete CREATE TABLE (round 11 — VERDICT r10 task 1) and
IDENTITY columns (task 4): declared column schema with NOT NULL /
DEFAULT / GENERATED / IDENTITY, PARTITIONED BY (columns and hidden
transforms), CLUSTER BY, TBLPROPERTIES, LOCATION — one empty v0
commit carrying the whole contract; INSERT/COPY INTO conform to it.
Identity allocation is CAS-guarded: racing writers can never issue
the same value.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark import graft_sql
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    create_declared_table,
    load_manifest,
    read_manifest,
    register,
    write_frame,
)


@pytest.fixture()
def path(spark, tmp_path):
    register(spark)
    return str(tmp_path / "t")


def test_create_declared_full_contract(spark, path):
    graft_sql(spark, f"""
        CREATE TABLE `{path}` (
          id BIGINT GENERATED ALWAYS AS IDENTITY
             (START WITH 10 INCREMENT BY 2),
          k BIGINT NOT NULL,
          region STRING,
          price DOUBLE DEFAULT 0.0,
          price2 DOUBLE GENERATED ALWAYS AS (price * 2.0),
          ts TIMESTAMP,
          CONSTRAINT pos CHECK (k >= 0)
        ) USING GRAFT
        PARTITIONED BY (region, year(ts))
        CLUSTER BY (k)
        TBLPROPERTIES ('targetFileRows' = '100000', 'owner' = 'etl')
    """)
    m = load_manifest(path)
    assert m["version"] == 0 and m["files"] == []
    assert read_manifest(spark, path).count() == 0
    assert [f.name for f in read_manifest(spark, path).schema.fields] \
        == ["id", "k", "region", "price", "price2", "ts"]
    assert m["partitionGen"] == [
        {"name": "ts_year", "src": "ts", "transform": "year"}]
    assert m["properties"]["partitionCols"] == "region"
    assert m["properties"]["owner"] == "etl"
    assert m["clusterBy"] == ["k"]
    assert {"col": "k", "notNull": True} in m["constraints"]
    assert any(c.get("name") == "pos" for c in m["constraints"])
    assert m["columnDefaults"] == {"price": "0.0"}
    assert m["generatedCols"] == {"price2": "price * 2.0"}
    assert m["identityCols"] == {
        "id": {"start": 10, "step": 2, "always": True, "high": None}}

    # inserts conform: identity + default + generated fill, hidden
    # partition + declared partition column split the files
    graft_sql(spark, f"INSERT INTO `{path}` (k, region, price, ts) "
                     f"VALUES (1, 'EU', 3.0, TIMESTAMP "
                     f"'1995-03-04 00:00:00'), (2, 'US', 5.0, "
                     f"TIMESTAMP '1997-07-01 00:00:00')")
    rows = {r["k"]: r for r in read_manifest(spark, path).collect()}
    assert rows[1]["price2"] == 6.0 and rows[2]["price2"] == 10.0
    assert sorted(r["id"] for r in rows.values()) == [10, 12]
    m2 = load_manifest(path)
    assert m2["identityCols"]["id"]["high"] == 12
    parts = {tuple(sorted((f.get("partition") or {}).items()))
             for f in m2["files"]}
    assert parts == {(("region", "EU"), ("ts_year", 1995)),
                     (("region", "US"), ("ts_year", 1997))}
    # declared contract enforces: NOT NULL, CHECK, ALWAYS identity
    with pytest.raises(Exception, match="NULL"):
        graft_sql(spark, f"INSERT INTO `{path}` (k, region) "
                         f"VALUES (NULL, 'EU')")
    with pytest.raises(Exception, match="pos|constraint"):
        graft_sql(spark, f"INSERT INTO `{path}` (k, region) "
                         f"VALUES (-5, 'EU')")
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS "
                                         "IDENTITY"):
        graft_sql(spark, f"INSERT INTO `{path}` (id, k) VALUES "
                         f"(1, 5)")


def test_create_declared_validation_matrix(spark, path, tmp_path):
    # refusal parity with the ALTER validation matrix
    with pytest.raises(ValueError, match="source column"):
        graft_sql(spark, f"CREATE TABLE `{path}` (k BIGINT) "
                         f"PARTITIONED BY (year(nope))")
    with pytest.raises(ValueError, match="collides"):
        graft_sql(spark, f"CREATE TABLE `{path}` "
                         f"(k BIGINT, ts_year INT, ts TIMESTAMP) "
                         f"PARTITIONED BY (year(ts))")
    with pytest.raises(ValueError, match="clusterBy"):
        graft_sql(spark, f"CREATE TABLE `{path}` (k BIGINT) "
                         f"CLUSTER BY (v)")
    with pytest.raises(ValueError, match="partition column"):
        graft_sql(spark, f"CREATE TABLE `{path}` (k BIGINT) "
                         f"PARTITIONED BY (v)")
    with pytest.raises(ValueError, match="BIGINT"):
        graft_sql(spark, f"CREATE TABLE `{path}` (id STRING "
                         f"GENERATED ALWAYS AS IDENTITY)")
    with pytest.raises(ValueError, match="nonzero"):
        from pyspark.sql.types import StructType

        create_declared_table(spark, path,
                              StructType.fromDDL("id BIGINT"),
                              identity_cols={"id": {"step": 0}})
    with pytest.raises(ValueError, match="does not take AS"):
        graft_sql(spark, f"CREATE TABLE `{path}` (k BIGINT) "
                         f"AS SELECT 1")
    with pytest.raises(ValueError, match="redundant"):
        graft_sql(spark, f"CREATE TABLE `{path}` (k BIGINT) "
                         f"LOCATION '/tmp/x'")
    # DEFAULT must be column-free (ANSI) — same as SET DEFAULT
    with pytest.raises(Exception):
        graft_sql(spark, f"CREATE TABLE `{path}` "
                         f"(k BIGINT, v DOUBLE DEFAULT k + 1)")
    # nothing of the refused creates landed
    assert not os.path.exists(os.path.join(path, "delta-v00000000.json"))

    # duplicate / IF NOT EXISTS / OR REPLACE lifecycle
    graft_sql(spark, f"CREATE TABLE `{path}` (k BIGINT)")
    with pytest.raises(ValueError, match="already exists"):
        graft_sql(spark, f"CREATE TABLE `{path}` (k BIGINT)")
    graft_sql(spark, f"CREATE TABLE IF NOT EXISTS `{path}` "
                     f"(other STRING)")
    assert read_manifest(spark, path).columns == ["k"]  # no-op kept it
    graft_sql(spark, f"CREATE OR REPLACE TABLE `{path}` "
                     f"(a BIGINT, b STRING)")
    m = load_manifest(path)
    assert read_manifest(spark, path).columns == ["a", "b"]
    assert m["version"] == 1  # history kept: replace is a new commit


def test_create_named_declared_managed(spark, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources import metastore as ms

    cdir = str(tmp_path / "cat")
    spark.conf.set("spark.graft.catalogDir", cdir)
    try:
        graft_sql(spark, """
            CREATE TABLE sensors (
              id BIGINT GENERATED BY DEFAULT AS IDENTITY,
              reading DOUBLE NOT NULL
            ) TBLPROPERTIES ('owner' = 'iot')
        """)
        loc = ms.resolve_table(spark, "sensors")
        assert loc == ms.managed_location(cdir, "sensors")
        graft_sql(spark, "INSERT INTO sensors (reading) VALUES "
                         "(1.5), (2.5)")
        got = graft_sql(spark, "SELECT id, reading FROM graft.sensors "
                               "ORDER BY id").collect()
        assert [r["id"] for r in got] == [1, 2]
        # BY DEFAULT accepts explicit values (no high-water move)
        graft_sql(spark, "INSERT INTO sensors (id, reading) VALUES "
                         "(-7, 9.9)")
        assert load_manifest(loc)["identityCols"]["id"]["high"] == 2
        graft_sql(spark, "DROP TABLE sensors")
        assert not os.path.exists(loc)
    finally:
        spark.conf.unset("spark.graft.catalogDir")


def test_identity_racing_writers_no_duplicates(spark, path):
    """Two concurrent allocating appends: the loser's commit fails
    its planned-high guard (never publishes colliding values) and a
    re-run allocates a fresh range — collision-free by construction."""
    from concurrent.futures import ThreadPoolExecutor

    graft_sql(spark, f"CREATE TABLE `{path}` ("
                     f"id BIGINT GENERATED ALWAYS AS IDENTITY, "
                     f"src INT)")

    def append(tag: int) -> None:
        df = (spark.range(50)
              .select(F.lit(tag).cast("int").alias("src"))
              .coalesce(1))
        for _ in range(6):  # bounded retry on the CAS guard
            try:
                write_frame(df, path, "append", statCols="src")
                return
            except ValueError as exc:
                if "identity" not in str(exc):
                    raise
        raise AssertionError("append never won the identity race")

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(append, [0, 1]))
    rows = read_manifest(spark, path).collect()
    ids = [r["id"] for r in rows]
    assert len(rows) == 100
    assert len(set(ids)) == 100, "duplicate identity values"
    assert load_manifest(path)["identityCols"]["id"]["high"] == max(ids)


def test_identity_survives_restore_and_clone(spark, path, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        clone_manifest,
        restore_manifest,
    )

    graft_sql(spark, f"CREATE TABLE `{path}` ("
                     f"id BIGINT GENERATED ALWAYS AS IDENTITY, "
                     f"v INT)")
    write_frame(spark.range(3).select(F.col("id").cast("int")
                                      .alias("v")).coalesce(1),
                path, "append", statCols="v")
    write_frame(spark.range(3).select(F.col("id").cast("int")
                                      .alias("v")).coalesce(1),
                path, "append", statCols="v")
    assert load_manifest(path)["identityCols"]["id"]["high"] == 6
    # RESTORE to v1: declaration rolls back but the high-water mark
    # carries FORWARD — since-restored values are never reissued
    restore_manifest(path, 1)
    m = load_manifest(path)
    assert m["identityCols"]["id"]["high"] == 6
    write_frame(spark.range(2).select(F.col("id").cast("int")
                                      .alias("v")).coalesce(1),
                path, "append", statCols="v")
    ids = [r["id"] for r in read_manifest(spark, path).collect()]
    assert sorted(ids) == [1, 2, 3, 7, 8]
    # clones carry the declaration + mark
    dst = str(tmp_path / "clone")
    clone_manifest(path, dst)
    assert load_manifest(dst)["identityCols"]["id"]["high"] == 8


def test_sync_identity_covers_explicit_values(spark, path):
    graft_sql(spark, f"""
        CREATE TABLE `{path}` (
          id BIGINT GENERATED BY DEFAULT AS IDENTITY
             (START WITH 1 INCREMENT BY 1),
          k BIGINT
        )
    """)
    # explicit BY DEFAULT values AUTO-ADVANCE the mark when the id
    # column carries entry stats (round 11, stricter than Delta)
    write_frame(spark.createDataFrame(
        [(50, 1), (51, 2)], "id BIGINT, k BIGINT").coalesce(1),
        path, "append")
    assert load_manifest(path)["identityCols"]["id"]["high"] == 51
    # simulate a LEGACY/EXTERNAL writer's stale mark (a raw metadata
    # commit that resets high — pre-round-11 tables and onboarded
    # logs look like this): SYNC IDENTITY is the repair
    import json as _json
    import time as _time

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _claim,
        _delta_file,
    )

    m = load_manifest(path)
    target = m["version"] + 1
    assert _claim(path, _delta_file(target), _json.dumps({
        "version": target, "schema": m["schema"], "txn": {},
        "droppedCols": {}, "add": [],
        "identityCols": {"id": {**m["identityCols"]["id"],
                                "high": None}},
        "committedAt": _time.time()}))
    assert load_manifest(path)["identityCols"]["id"]["high"] is None
    graft_sql(spark, f"ALTER TABLE `{path}` "
                     f"ALTER COLUMN id SYNC IDENTITY")
    assert load_manifest(path)["identityCols"]["id"]["high"] == 51
    # a subsequent automatic allocation starts PAST the synced mark
    write_frame(spark.range(3).selectExpr("id AS k").coalesce(1),
                path, "append")
    ids = sorted(r["id"] for r in
                 read_manifest(spark, path).collect())
    assert len(ids) == len(set(ids)) == 5
    assert all(i > 51 for i in ids if i not in (50, 51))


def test_sync_identity_idempotent_and_refusals(spark, path):
    graft_sql(spark, f"""
        CREATE TABLE `{path}` (
          id BIGINT GENERATED ALWAYS AS IDENTITY,
          k BIGINT
        )
    """)
    # empty table: nothing to cover, no commit
    v0 = load_manifest(path)["version"]
    graft_sql(spark, f"ALTER TABLE `{path}` "
                     f"ALTER COLUMN id SYNC IDENTITY")
    assert load_manifest(path)["version"] == v0
    with pytest.raises(ValueError, match="not identity"):
        graft_sql(spark, f"ALTER TABLE `{path}` "
                         f"ALTER COLUMN k SYNC IDENTITY")
    # allocate, then sync is a no-op (mark already covers the data)
    write_frame(spark.range(4).selectExpr("id AS k").coalesce(1),
                path, "append")
    v1 = load_manifest(path)["version"]
    graft_sql(spark, f"ALTER TABLE `{path}` "
                     f"ALTER COLUMN id SYNC IDENTITY")
    assert load_manifest(path)["version"] == v1
