"""COPY INTO — idempotent file ingestion
(sources/manifest_source.py:copy_into): each source file loads exactly
once across re-runs, the loaded-file registry commits atomically with
the data, survives checkpoints and fresh-process reloads, resets on
overwrite, and a racing copy of the same file conflicts at commit.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    CHECKPOINT_EVERY,
    _invalidate_caches,
    copy_into,
    load_manifest,
    read_manifest,
    register,
    write_frame,
)


def _land(spark, src: str, name: str, lo: int, hi: int) -> str:
    tmp = os.path.join(src, "_tmp")
    (spark.range(lo, hi)
     .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
     .coalesce(1).write.mode("overwrite").parquet(tmp))
    part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
    dest = os.path.join(src, name)
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    return dest


@pytest.fixture()
def landing(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "landing")
    os.makedirs(src)
    _land(spark, src, "a.parquet", 0, 10)
    _land(spark, src, "b.parquet", 10, 20)
    return src, str(tmp_path / "table")


def test_copy_into_is_idempotent(spark, landing):
    src, tbl = landing
    r1 = copy_into(spark, tbl, src, stat_cols=["k"])
    assert r1["loadedFiles"] == 2
    assert read_manifest(spark, tbl).count() == 20
    # re-run: all skipped, no new version, no duplicate rows
    r2 = copy_into(spark, tbl, src)
    assert r2["loadedFiles"] == 0 and r2["skippedFiles"] == 2
    assert r2["version"] == r1["version"]
    assert read_manifest(spark, tbl).count() == 20


def test_copy_into_loads_only_new_files(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    _land(spark, src, "c.parquet", 20, 25)
    r = copy_into(spark, tbl, src)
    assert r["loadedFiles"] == 1 and r["skippedFiles"] == 2
    assert read_manifest(spark, tbl).count() == 25


def test_registry_survives_fresh_process_and_checkpoint(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    # push the log across a checkpoint boundary with filler commits
    filler = spark.range(1).select(F.col("id").alias("k"),
                                   F.lit(0.0).alias("v"))
    for _ in range(CHECKPOINT_EVERY + 1):
        write_frame(filler, tbl, "append", statCols="k")
    _invalidate_caches()  # fresh-process read: checkpoint + delta tail
    assert len(load_manifest(tbl)["copyInto"]) == 2
    r = copy_into(spark, tbl, src)
    assert r["loadedFiles"] == 0 and r["skippedFiles"] == 2


def test_racing_copy_of_same_file_conflicts(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    # simulate the loser of a race: a commit claiming an identity the
    # registry already holds must fail (its rows would duplicate)
    dup = os.path.join(src, "a.parquet")
    df = spark.read.parquet(dup)
    import json as _json
    with pytest.raises(ValueError, match="COPY INTO conflict"):
        write_frame(df, tbl, "append", statCols="k",
                    copyFiles=_json.dumps([os.path.abspath(dup)]))
    # the failed commit must not leave orphan rows
    assert read_manifest(spark, tbl).count() == 20


def test_force_reloads_without_reregistering(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    r = copy_into(spark, tbl, os.path.join(src, "a.parquet"),
                  force=True)
    assert r["loadedFiles"] == 1
    assert read_manifest(spark, tbl).count() == 30  # duplicates: caller's call
    assert len(load_manifest(tbl)["copyInto"]) == 2


def test_overwrite_resets_registry(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    write_frame(spark.range(3).select(F.col("id").alias("k"),
                                      F.lit(0.0).alias("v")),
                tbl, "overwrite", statCols="k")
    assert load_manifest(tbl)["copyInto"] == []
    r = copy_into(spark, tbl, os.path.join(src, "a.parquet"))
    assert r["loadedFiles"] == 1


def test_csv_reads_under_table_schema(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    csvdir = os.path.join(os.path.dirname(src), "csv")
    os.makedirs(csvdir)
    with open(os.path.join(csvdir, "d.csv"), "w") as f:
        f.write("k,v\n100,200.0\n")
    r = copy_into(spark, tbl, csvdir, source_format="csv",
                  reader_options={"header": "true"})
    assert r["loadedFiles"] == 1
    row = (read_manifest(spark, tbl)
           .filter(F.col("k") == 100).collect())
    assert row[0]["v"] == 200.0  # typed under the table schema


def test_source_missing_columns_refused(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    baddir = os.path.join(os.path.dirname(src), "bad")
    os.makedirs(baddir)
    (spark.range(3).select(F.col("id").alias("k"))
     .coalesce(1).write.mode("overwrite").parquet(baddir))
    with pytest.raises(ValueError, match="lacks table column"):
        copy_into(spark, tbl, os.path.join(baddir, "*.parquet"))


def test_empty_source_refused(spark, landing):
    src, tbl = landing
    with pytest.raises(ValueError, match="matched no files"):
        copy_into(spark, tbl, os.path.join(src, "*.nope"))


def test_registry_expiry_window(spark, landing):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        expire_copy_registry,
    )
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])            # v0: a, b
    _land(spark, src, "c.parquet", 20, 25)
    copy_into(spark, tbl, src)                             # v1: c
    # entries are version-stamped
    m = load_manifest(tbl)
    ats = sorted(e["at"] for e in m["copyInto"])
    assert ats == [0, 0, 1]
    # push the version forward, then expire the old window
    filler = spark.createDataFrame([(0, 0.0)], "k long, v double")
    for _ in range(4):
        write_frame(filler, tbl, "append", statCols="k")   # v2..v5
    expire_copy_registry(tbl, keep_versions=4)             # cutoff v1
    m = load_manifest(tbl)
    assert [e["at"] for e in m["copyInto"]] == [1]  # v0 loads expired
    expire_copy_registry(tbl, keep_versions=3)             # cutoff v3
    assert load_manifest(tbl)["copyInto"] == []
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        manifest_operations,
    )
    assert "EXPIRE COPY REGISTRY" in [
        o["operation"] for o in manifest_operations(tbl)]
    # expired files re-ingest if re-presented — THE documented trade-off
    r = copy_into(spark, tbl, os.path.join(src, "a.parquet"))
    assert r["loadedFiles"] == 1
    # idempotent when nothing is old enough
    v = load_manifest(tbl)["version"]
    expire_copy_registry(tbl, keep_versions=100)
    assert load_manifest(tbl)["version"] == v


def test_headered_csv_maps_columns_by_name(spark, landing):
    src, tbl = landing
    copy_into(spark, tbl, src, stat_cols=["k"])
    csvdir = os.path.join(os.path.dirname(src), "csv_swapped")
    os.makedirs(csvdir)
    # column order DIFFERS from the table schema (v,k not k,v): a
    # positional schema pin would silently mis-assign; header names
    # must win
    with open(os.path.join(csvdir, "s.csv"), "w") as f:
        f.write("v,k\n200.5,100\n")
    copy_into(spark, tbl, csvdir, source_format="csv",
              reader_options={"header": "true"})
    row = read_manifest(spark, tbl).filter(
        F.col("k") == 100).collect()
    assert len(row) == 1 and row[0]["v"] == 200.5
    # Spark option keys are case-insensitive; the name-mapping path
    # must key off 'Header' too
    with open(os.path.join(csvdir, "s2.csv"), "w") as f:
        f.write("v,k\n300.5,101\n")
    copy_into(spark, tbl, os.path.join(csvdir, "s2.csv"),
              source_format="csv", reader_options={"Header": "true"})
    row = read_manifest(spark, tbl).filter(
        F.col("k") == 101).collect()
    assert len(row) == 1 and row[0]["v"] == 300.5


def test_copy_into_prunes_hidden_and_underscore_dirs(spark, landing):
    # a concurrent Spark job writing the landing zone stages files
    # under `_temporary/` task-attempt dirs; a `.staging/` dir is the
    # same story — descending into either would register phantom rows
    # forever (Spark's file listing skips `.`/`_` path SEGMENTS, not
    # just basenames)
    src, table = landing
    for d in (".staging", "_temporary"):
        os.makedirs(os.path.join(src, d))
    _land(spark, os.path.join(src, ".staging"), "x.parquet", 100, 110)
    _land(spark, os.path.join(src, "_temporary"), "y.parquet", 200, 210)
    res = copy_into(spark, table, src, stat_cols=["k"])
    assert res["loadedFiles"] == 2  # a.parquet + b.parquet only
    ks = {r["k"] for r in read_manifest(spark, table).collect()}
    assert ks == set(range(20))


def test_copy_registry_auto_expires_via_table_property(spark, landing):
    """Round 9: with `copyRegistryKeepVersions` set, every copy commit
    trims registry entries older than that many table versions — the
    checkpoint stops growing without a manual expire_copy_registry
    call (Delta's bounded load-history posture)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _copy_registry_ids,
        set_table_properties,
    )

    src, table = landing
    copy_into(spark, table, src, stat_cols=["k"])
    set_table_properties(table, {"copyRegistryKeepVersions": "2"})
    files = []
    for i in range(5):
        f = _land(spark, src, f"f{i}.parquet",
                  100 + i * 10, 110 + i * 10)
        files.append(os.path.abspath(f))
        copy_into(spark, table, [f])
    m = load_manifest(table)
    ids = _copy_registry_ids(m)
    # the newest load is always inside the window; the early ones
    # expired on later copy commits with no manual call
    assert files[-1] in ids
    assert files[0] not in ids and files[1] not in ids
    # each surviving entry is inside the window AS OF its trim commit
    # (the expire commit itself bumps the version by one more)
    assert all((e["at"] if isinstance(e, dict) else 0)
               >= m["version"] - 3 for e in (m.get("copyInto") or []))
    assert len(m.get("copyInto") or []) <= 3
    # every row still landed exactly once
    assert read_manifest(spark, table).count() == 70


def test_copy_into_fills_defaults_and_generated(spark, landing):
    """A source lacking a defaulted or generated column loads anyway —
    write_frame fills/computes it (Delta COPY INTO behavior); a column
    covered by NEITHER still refuses."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_generated_column,
        drop_column_from_manifest,
        set_column_default,
    )

    src, table = landing
    copy_into(spark, table, src, stat_cols=["k"])
    set_column_default(spark, table, "v", "-1.0")
    add_generated_column(spark, table, "k2", "k * 2", dtype="bigint",
                         backfill=True)
    # land a file with ONLY k: v defaults, k2 computes
    narrow = os.path.join(src, "narrow")
    os.makedirs(narrow)
    (spark.range(500, 505).select(F.col("id").alias("k"))
     .coalesce(1).write.mode("overwrite").parquet(narrow))
    res = copy_into(spark, table, os.path.join(narrow, "*.parquet"))
    assert res["loadedFiles"] == 1
    rows = {r["k"]: (r["v"], r["k2"])
            for r in read_manifest(spark, table)
            .filter("k >= 500").collect()}
    assert rows[501] == (-1.0, 1002)
    # dropping the default re-exposes the refusal for v
    set_column_default(spark, table, "v", None)
    narrow2 = os.path.join(src, "narrow2")
    os.makedirs(narrow2)
    (spark.range(600, 605).select(F.col("id").alias("k"))
     .coalesce(1).write.mode("overwrite").parquet(narrow2))
    with pytest.raises(ValueError, match="lacks table column"):
        copy_into(spark, table, os.path.join(narrow2, "*.parquet"))
