"""Metadata-only RENAME COLUMN via epoch column mapping
(sources/manifest_source.py:rename_column_in_manifest — the Delta
columnMapping / Iceberg field-id analog): files keep their
written-time physical names; every read path maps physical→logical
per file, keyed on the entry's addedAt epoch.  These tests pin the
zero-rewrite property, correctness through every consumer (batch
scan, pruning, rewrites, DV delete, CDC, streams, clone/restore), and
the refusal matrix.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    ManifestReader,
    clone_manifest,
    compact_manifest,
    delete_vectors_from_manifest,
    load_manifest,
    merge_into_manifest,
    register,
    rename_column_in_manifest,
    restore_manifest,
    write_manifest_table,
)


def _read(spark, path, **opts):
    r = spark.read.format("graft_manifest").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    """orders(o_orderkey, price, yr) ranged into 4 files, then
    price RENAMED to total_price."""
    register(spark)
    path = str(tmp_path / "ren_orders")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.year("o_orderdate").cast("int").alias("yr"))
    write_manifest_table(
        orders.repartitionByRange(4, "o_orderkey"), path,
        ["o_orderkey", "price", "yr"])
    rename_column_in_manifest(path, "price", "total_price")
    return path


def test_rename_is_metadata_only_and_reads_values(spark, sf_dir, table):
    files = glob.glob(os.path.join(table, "*.parquet"))
    import pyarrow.parquet as pq

    for f in files:
        assert "price" in pq.read_schema(f).names, \
            "rename must not rewrite data files"
    df = _read(spark, table)
    assert "total_price" in df.columns and "price" not in df.columns
    assert df.filter(F.col("total_price").isNull()).count() == 0
    raw = load_table(spark, sf_dir, "orders")
    assert df.count() == raw.count()
    got = df.agg(F.sum(F.col("total_price").cast("decimal(18,2)"))
                 ).collect()[0][0]
    exp = raw.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  ).collect()[0][0]
    assert got == exp
    # time travel to the pre-rename version reads the OLD name
    v0 = _read(spark, table, versionAsOf=0)
    assert "price" in v0.columns and "total_price" not in v0.columns


def test_pruning_survives_rename(spark, sf_dir, table):
    m = load_manifest(table)
    # stats surface under the LOGICAL name
    live = [f for f in m["files"] if not f.get("dead")]
    assert all("total_price" in f["stats"] and "price" not in f["stats"]
               for f in live)
    rd = ManifestReader({"path": table})
    total = len(rd.partitions())
    probe = live[0]["stats"]["o_orderkey"]["min"]
    list(rd.prune_for_scan([EqualTo(("o_orderkey",), probe)]))
    assert 0 < len(rd.partitions()) < total
    # filtering on the renamed column end-to-end equals the raw query
    cutoff = 50_000.0
    got = _read(spark, table).filter(
        F.col("total_price") < cutoff).count()
    exp = (load_table(spark, sf_dir, "orders")
           .filter(F.col("o_totalprice").cast("double") < cutoff)
           .count())
    assert got == exp


def test_append_after_rename_and_chain(spark, sf_dir, table):
    extra = load_table(spark, sf_dir, "orders").limit(10).select(
        (F.col("o_orderkey").cast("long") + 10_000_000)
        .alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.year("o_orderdate").cast("int").alias("yr"))
    (extra.write.format("graft_manifest").mode("append")
     .option("path", table)
     .option("statCols", "o_orderkey,total_price,yr").save())
    n = load_table(spark, sf_dir, "orders").count()
    df = _read(spark, table)
    assert df.count() == n + 10
    assert df.filter(F.col("total_price").isNull()).count() == 0
    # chain: total_price -> tp2; all three epochs of files align
    rename_column_in_manifest(table, "total_price", "tp2")
    df = _read(spark, table)
    assert df.filter(F.col("tp2").isNull()).count() == 0
    assert df.count() == n + 10


def test_readd_of_renamed_away_name_does_not_resurrect(spark, sf_dir,
                                                       table):
    # re-introduce "price" as a brand-new column: old files must show
    # NULL for it (their physical 'price' belongs to total_price now)
    n = _read(spark, table).count()
    extra = load_table(spark, sf_dir, "orders").limit(5).select(
        (F.col("o_orderkey").cast("long") + 20_000_000)
        .alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.lit(1.25).alias("price"))
    (extra.write.format("graft_manifest").mode("append")
     .option("path", table)
     .option("statCols", "o_orderkey").save())
    df = _read(spark, table)
    assert df.filter(F.col("price").isNotNull()).count() == 5
    assert (df.filter(F.col("o_orderkey") < 10_000_000)
            .filter(F.col("price").isNotNull()).count() == 0)
    assert df.filter(F.col("total_price").isNull()).count() == 0
    assert df.count() == n + 5


def test_dv_delete_and_merge_on_renamed_table(spark, sf_dir, table):
    n = _read(spark, table).count()
    doomed = _read(spark, table).select("o_orderkey").limit(9)
    delete_vectors_from_manifest(doomed, table, ["o_orderkey"],
                                 ["o_orderkey", "total_price", "yr"])
    assert _read(spark, table).count() == n - 9, \
        "DV discovery must find positions in pre-rename files"
    # copy-on-write MERGE repricing through the renamed column
    upd = (_read(spark, table).limit(7)
           .withColumn("total_price", F.lit(1.0)))
    merge_into_manifest(upd, table, ["o_orderkey"],
                        ["o_orderkey", "total_price", "yr"])
    got = _read(spark, table)
    assert got.count() == n - 9
    assert got.filter(F.col("total_price") == 1.0).count() == 7
    assert got.filter(F.col("total_price").isNull()).count() == 0


def test_compact_after_rename(spark, sf_dir, table):
    before = _read(spark, table)
    total = before.agg(F.sum(F.col("total_price")
                             .cast("decimal(18,2)"))).collect()[0][0]
    n = before.count()
    compact_manifest(spark, table,
                     ["o_orderkey", "total_price", "yr"], 10**9)
    after = _read(spark, table)
    assert after.count() == n
    assert after.agg(F.sum(F.col("total_price").cast("decimal(18,2)"))
                     ).collect()[0][0] == total
    assert after.filter(F.col("total_price").isNull()).count() == 0


def test_changefeed_across_rename_window(spark, sf_dir, table):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        manifest_changes_incremental,
    )

    # window: from BEFORE the rename (v0) to after a post-rename merge
    upd = (_read(spark, table).limit(3)
           .withColumn("total_price", F.lit(2.0)))
    merge_into_manifest(upd, table, ["o_orderkey"],
                        ["o_orderkey", "total_price", "yr"])
    ch = manifest_changes_incremental(spark, table, 0, None,
                                      ["o_orderkey"])
    assert "total_price" in ch.columns
    ups = ch.filter(F.col("change_type") == "update")
    assert ups.count() == 3
    assert ups.filter(F.col("total_price") == 2.0).count() == 3, \
        "pre-images from pre-rename files must map to the new name"


def test_stream_tail_across_mid_stream_rename(spark, sf_dir, table,
                                              tmp_path):
    # a LIVE query pins the pre-rename schema; rename + append while
    # it runs: the appended file (physical NEW name) must surface
    # under the PINNED name via the reverse mapping — not NULL-fill
    import time

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (spark.readStream.format("graft_manifest").option("path", table)
         .load().writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(processingTime="300 milliseconds").start())
    try:
        base_n = _read(spark, table).count()
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= base_n:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        rename_column_in_manifest(table, "total_price", "tp_live")
        extra = load_table(spark, sf_dir, "orders").limit(4).select(
            (F.col("o_orderkey").cast("long") + 30_000_000)
            .alias("o_orderkey"),
            F.col("o_totalprice").cast("double").alias("tp_live"),
            F.year("o_orderdate").cast("int").alias("yr"))
        (extra.write.format("graft_manifest").mode("append")
         .option("path", table).option("statCols", "o_orderkey").save())
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= base_n + 4:
                    break
            except Exception:
                pass
            time.sleep(0.3)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert "total_price" in got.columns
    late = got.filter(F.col("o_orderkey") >= 30_000_000)
    assert late.count() == 4
    assert late.filter(F.col("total_price").isNull()).count() == 0


def test_clone_and_restore_carry_renames(spark, sf_dir, table,
                                         tmp_path):
    dst = str(tmp_path / "ren_clone")
    clone_manifest(table, dst)
    df = _read(spark, dst)
    assert "total_price" in df.columns
    assert df.filter(F.col("total_price").isNull()).count() == 0
    # restore the SOURCE to the pre-rename version: old name returns
    restore_manifest(table, 0)
    back = _read(spark, table)
    assert "price" in back.columns and "total_price" not in back.columns
    assert back.filter(F.col("price").isNull()).count() == 0
    # the clone is unaffected
    assert "total_price" in _read(spark, dst).columns


def test_rename_refusal_matrix(spark, sf_dir, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        drop_column_from_manifest,
    )

    register(spark)
    path = str(tmp_path / "refuse")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    with pytest.raises(ValueError, match="not in table schema"):
        rename_column_in_manifest(path, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column_in_manifest(path, "n_name", "n_regionkey")
    with pytest.raises(ValueError, match="reserved prefix"):
        rename_column_in_manifest(path, "n_name",
                                  "__graft_masked:oops")
    # renaming ONTO a dropped name is LIFTED by epoch masking: the
    # pre-drop n_regionkey values never surface under the rename
    drop_column_from_manifest(path, "n_regionkey")
    rename_column_in_manifest(path, "n_nationkey", "n_regionkey")
    df = _read(spark, path)
    assert set(df.columns) == {"n_regionkey", "n_name"}
    # the renamed column carries the ORIGINAL n_nationkey values
    assert df.filter(F.col("n_regionkey") > 4).count() == 20, \
        "values must come from n_nationkey, not the dropped column"


def test_double_drop_readd_cycle(spark, sf_dir, tmp_path):
    """Drop → re-add → drop → re-add of the SAME name: each era's
    values stay isolated to its own epoch (two masked records)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        drop_column_from_manifest,
    )

    register(spark)
    path = str(tmp_path / "cycle")

    def add(key, score):
        (spark.createDataFrame([(key, float(score))],
                               "k long, score double")
         .coalesce(1).write.format("graft_manifest").mode("append")
         .option("path", path).option("statCols", "k").save())

    add(1, 10.0)                       # v0: era-1 score
    drop_column_from_manifest(path, "score")
    add(2, 20.0)                       # re-add: era-2 score
    drop_column_from_manifest(path, "score")
    add(3, 30.0)                       # re-add again: era-3 score
    df = _read(spark, path).orderBy("k")
    rows = {r["k"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: None, 3: 30.0}
    # every era still time travels intact
    v0 = _read(spark, path, versionAsOf=0)
    assert v0.collect()[0]["score"] == 10.0
    v2 = _read(spark, path, versionAsOf=2).orderBy("k")
    assert [r["score"] for r in v2.collect()] == [None, 20.0]


def test_append_racing_rename_fails_with_replan_hint(spark, sf_dir,
                                                     tmp_path):
    """An append PLANNED under the old name whose commit claims AFTER
    a rename landed must fail (re-plan), not silently re-introduce the
    old name as a separate new column.  Driven in-process: the writer
    is constructed (planning snapshot) before the rename and its
    commit runs after, exactly the interleaving the worker would see."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        ManifestArrowWriter,
        _FileCommit,
    )

    register(spark)
    path = str(tmp_path / "race")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name")
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])

    old_schema = StructType([StructField("n_nationkey", LongType()),
                             StructField("n_name", StringType())])
    w = ManifestArrowWriter({"path": path,
                             "statcols": "n_nationkey"},
                            old_schema, overwrite=False)  # plans at v0
    rename_column_in_manifest(path, "n_name", "nation_name")  # v1 lands

    # stage one data file the way write() would have
    staged = os.path.join(path, ".race.parquet.tmp")
    final = os.path.join(path, "race-data.parquet")
    pq.write_table(pa.table({"n_nationkey": [900], "n_name": ["Z"]}),
                   staged)
    msg = _FileCommit(tmp_path=staged, final_path=final, rows=1,
                      stats={"n_nationkey": {"min": 900, "max": 900}})
    with pytest.raises(ValueError, match="concurrent rename"):
        w.commit([msg])
    # the refused commit unpublished its data file — no orphans
    m = load_manifest(path)
    live = {os.path.basename(f["path"]) for f in m["files"]}
    on_disk = {os.path.basename(p)
               for p in glob.glob(os.path.join(path, "*.parquet"))}
    assert on_disk == live
    # re-planned append under the NEW name lands cleanly
    (nat.limit(2).coalesce(1)
     .withColumnRenamed("n_name", "nation_name")
     .write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    df = _read(spark, path)
    assert df.count() == 27
    assert df.filter(F.col("nation_name").isNull()).count() == 0


def test_rename_map_soundness_property():
    """Property: for ANY rename history and file epoch, the mapping
    (a) matches a straightforward per-column simulation of the name's
    evolution, and (b) never routes two distinct physical names the
    file can actually hold onto the same logical name."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _rename_map,
    )

    cols = list("abcde")

    @st.composite
    def histories(draw):
        """A VALID rename history: maintains a live schema name set,
        renames only live names onto free names (what the commit-time
        validation enforces)."""
        live = set(draw(st.sets(st.sampled_from(cols), min_size=1)))
        renames = []
        at = 0
        for _ in range(draw(st.integers(0, 8))):
            at += draw(st.integers(1, 3))
            frees = sorted(set(cols) - live)
            lives = sorted(live)
            if not frees or not lives:
                break
            src = draw(st.sampled_from(lives))
            dst = draw(st.sampled_from(frees))
            renames.append({"from": src, "to": dst, "at": at})
            live.discard(src)
            live.add(dst)
        return renames

    @settings(max_examples=300, deadline=None)
    @given(histories(), st.integers(-1, 30))
    def check(renames, epoch):
        m = _rename_map({"addedAt": epoch}, renames) or {}
        # (a) simulate each physical name the file could hold: a name
        # is physically plausible iff it was a live schema name at the
        # file's epoch; its logical name today = chase renames forward
        def live_names_at(e):
            # replay history to find the schema name set at epoch e
            names = None
            # reconstruct initial live set: names never a 'to' before
            # their first appearance... simpler: replay from the union
            # of all froms/tos minus those created later
            created = {r["to"]: r["at"] for r in renames}
            gone = {}
            for r in renames:
                gone.setdefault(r["from"], r["at"])
            out = set()
            for n in set(cols):
                born = created.get(n, -10**9)
                died = gone.get(n, 10**9)
                if died > born:  # existed in between
                    if born <= e < died:
                        out.add(n)
            return out

        for p in live_names_at(epoch):
            cur = p
            for r in renames:
                if r["at"] > epoch and cur == r["from"]:
                    cur = r["to"]
            assert m.get(p, p) == cur, (p, cur, m, renames, epoch)
        # (b) no two plausible physical names collide logically
        seen = {}
        for p in live_names_at(epoch):
            tgt = m.get(p, p)
            assert tgt not in seen, (p, seen[tgt], tgt, renames, epoch)
            seen[tgt] = p

    check()


def test_clone_of_clone_with_renames(spark, sf_dir, table, tmp_path):
    """Rename epochs survive two levels of clone rebase: carried
    entries keep mapping, files written in the first clone stay
    unmapped, and a rename INSIDE the first clone composes."""
    c1 = str(tmp_path / "c1")
    clone_manifest(table, c1)
    # write into clone-1 under the current name, then rename there
    extra = load_table(spark, sf_dir, "orders").limit(3).select(
        (F.col("o_orderkey").cast("long") + 40_000_000)
        .alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.year("o_orderdate").cast("int").alias("yr"))
    (extra.write.format("graft_manifest").mode("append")
     .option("path", c1).option("statCols", "o_orderkey").save())
    rename_column_in_manifest(c1, "total_price", "tp_c1")
    c2 = str(tmp_path / "c2")
    clone_manifest(c1, c2)
    df = _read(spark, c2)
    n = load_table(spark, sf_dir, "orders").count()
    assert df.count() == n + 3
    assert "tp_c1" in df.columns
    assert df.filter(F.col("tp_c1").isNull()).count() == 0, \
        "both rename epochs must survive the double rebase"
    got = df.agg(F.sum(F.col("tp_c1").cast("decimal(18,2)"))
                 ).collect()[0][0]
    exp = (_read(spark, c1)
           .agg(F.sum(F.col("tp_c1").cast("decimal(18,2)")))
           .collect()[0][0])
    assert got == exp


def test_merge_rewrite_does_not_resurrect_dropped_values(
        spark, tmp_path):
    """Copy-on-write rewrites go through the JVM masked read
    (_masked_spark_read); on a drop+re-add table the re-added logical
    column is a MASKED-rename source for pre-drop files — the rewrite
    must NULL-fill it, not read the file's old physical values back
    into the new column (resurrection through the maintenance path,
    even though plain scans masked correctly)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        drop_column_from_manifest,
    )

    path = str(tmp_path / "readd")
    register(spark)
    (spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)],
                           "k int, name string, score double")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "k").save())
    drop_column_from_manifest(path, "score")
    (spark.createDataFrame([(3, "c", 99.0)],
                           "k int, name string, score double")
     .coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "k").save())
    # the merge rewrites the pre-drop file (carrying row k=1 through
    # the masked read) — k=1's score must stay NULL
    upd = spark.createDataFrame([(2, "B2", None)],
                                "k int, name string, score double")
    merge_into_manifest(upd, path, ["k"], ["k"])
    got = sorted(tuple(r) for r in
                 (spark.read.format("graft_manifest")
                  .option("path", path).load().collect()))
    assert got == [(1, "a", None), (2, "B2", None), (3, "c", 99.0)]
