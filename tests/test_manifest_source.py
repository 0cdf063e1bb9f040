"""Manifest-table source (sources/manifest_source.py): footer-stats
manifest build, file pruning under pushed filters, correctness vs the
plain scan, and the never-prune-on-doubt contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
    StringStartsWith,
)

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    ManifestReader,
    _file_survives,
    register,
    write_manifest_table,
)
from data_engineering_pipeline_project_cloud_spark.testing import diff_results


@pytest.fixture(scope="module")
def manifest_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("manifest_orders"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.year("o_orderdate").cast("int").alias("order_year"))
    m = write_manifest_table(
        orders.repartitionByRange(5, "order_year"), path,
        ["order_year", "o_orderkey"])
    return path, m


def test_manifest_has_files_and_stats(manifest_dir):
    _, m = manifest_dir
    assert len(m["files"]) >= 2, "range partitioning should yield >1 file"
    for f in m["files"]:
        assert f["rows"] > 0
        assert "order_year" in f["stats"]
        s = f["stats"]["order_year"]
        assert s["min"] <= s["max"]


def test_pushed_filter_prunes_files(manifest_dir):
    path, m = manifest_dir
    rd = ManifestReader({"path": path})
    total = len(rd.partitions())
    assert total == len(m["files"])
    cutoff = max(f["stats"]["order_year"]["min"] for f in m["files"])
    unsupported = list(rd.pushFilters(
        [GreaterThanOrEqual(("order_year",), cutoff)]))
    # every filter is declared unsupported (Spark re-applies row-wise)
    assert len(unsupported) == 1
    surviving = len(rd.partitions())
    assert surviving < total
    # exactly the stat-overlapping files survive
    want = sum(1 for f in m["files"]
               if f["stats"]["order_year"]["max"] >= cutoff)
    assert surviving == want


def test_scan_matches_plain_read(spark, sf_dir, manifest_dir):
    path, _ = manifest_dir
    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    got = (spark.read.format("graft_manifest").option("path", path).load()
           .filter(F.col("order_year") >= 1997)
           .groupBy("order_year").agg(F.count(F.lit(1)).alias("n")))
    want = (load_table(spark, sf_dir, "orders")
            .withColumn("order_year", F.year("o_orderdate").cast("int"))
            .filter(F.col("order_year") >= 1997)
            .groupBy("order_year").agg(F.count(F.lit(1)).alias("n")))
    problems = diff_results(got.columns, [tuple(r) for r in got.collect()],
                            want.columns, [tuple(r) for r in want.collect()])
    assert not problems, "; ".join(problems)


def test_never_prunes_on_doubt():
    stats = {"y": {"min": 10, "max": 20}}
    # disjoint range: pruned
    assert not _file_survives(stats, [LessThan(("y",), 10)])
    assert not _file_survives(stats, [EqualTo(("y",), 99)])
    # inside range: kept
    assert _file_survives(stats, [EqualTo(("y",), 15)])
    # unknown column, unsupported filter kinds, incomparable literal:
    # all kept
    assert _file_survives(stats, [EqualTo(("other",), 1)])
    assert _file_survives(stats, [IsNotNull(("y",))])
    assert _file_survives(stats, [StringStartsWith(("y",), "1")])
    assert _file_survives(stats, [EqualTo(("y",), "not-an-int")])


def test_registry_face_oracle_shape(spark, sf_dir):
    from data_engineering_pipeline_project_cloud_spark.plans.relational import (
        manifest_pruned_scan,
    )
    out = manifest_pruned_scan(spark, sf_dir)
    rows = {r["order_year"]: r["n_orders"] for r in out.collect()}
    assert rows and min(rows) >= 1997


def test_writer_commit_protocol(spark, sf_dir, tmp_path):
    """Write path: empty partitions yield no file, no write-ahead tmp
    files survive commit, and a second overwrite drops the first
    version's files (no orphans outside the manifest)."""
    path = str(tmp_path / "m1")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    # 8 partitions over 25 rows: some may be empty -> None commits
    m1 = write_manifest_table(nat.repartition(8, "n_nationkey"), path,
                              ["n_nationkey"])
    names = set(os.listdir(path))
    assert not any(n.endswith(".tmp") for n in names)
    listed1 = {os.path.basename(f["path"]) for f in m1["files"]}
    assert listed1 == {n for n in names if n.endswith(".parquet")}
    assert sum(f["rows"] for f in m1["files"]) == 25
    # overwrite with a different layout: old files must not linger
    m2 = write_manifest_table(nat.repartition(2, "n_nationkey"), path,
                              ["n_nationkey"])
    names2 = {n for n in os.listdir(path) if n.endswith(".parquet")}
    assert names2 == {os.path.basename(f["path"]) for f in m2["files"]}
    register(spark)
    got = (spark.read.format("graft_manifest").option("path", path)
           .load().count())
    assert got == 25


def test_footer_backfill_matches_commit_stats(spark, sf_dir, tmp_path):
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        build_manifest_from_footers,
    )

    path = str(tmp_path / "m2")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("order_year"))
    m_commit = write_manifest_table(
        orders.repartitionByRange(3, "order_year"), path,
        ["order_year", "o_orderkey"])
    m_footer = build_manifest_from_footers(
        path, m_commit["schema"], ["order_year", "o_orderkey"])
    by_path_c = {f["path"]: f for f in m_commit["files"]}
    by_path_f = {f["path"]: f for f in m_footer["files"]}
    assert by_path_c.keys() == by_path_f.keys()
    for p in by_path_c:
        assert by_path_c[p]["rows"] == by_path_f[p]["rows"]
        assert by_path_c[p]["stats"] == by_path_f[p]["stats"]


def test_append_mode_extends_log(spark, sf_dir, tmp_path):
    """Append keeps prior manifest entries at their positions (the
    stream reader's offset contract) and bumps the version so file
    names never collide."""
    path = str(tmp_path / "m3")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    register(spark)
    m1 = write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    (nat.coalesce(1).write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    import json
    with open(os.path.join(path, "manifest.json")) as fh:
        m2 = json.load(fh)
    assert m2["version"] == m1.get("version", 0) + 1
    assert m2["files"][:len(m1["files"])] == m1["files"]
    assert len(m2["files"]) == 2 * len(m1["files"])
    got = (spark.read.format("graft_manifest").option("path", path)
           .load().count())
    assert got == 50


def test_stream_reads_only_appended_files(spark, sf_dir, tmp_path):
    """Manifest-tail streaming with checkpoint restart: run 1 drains
    the initial files; files appended afterwards are the ONLY rows
    run 2 (same checkpoint) emits — file-granular exactly-once."""
    path = str(tmp_path / "mstream")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])

    def drain():
        q = (spark.readStream.format("graft_manifest")
             .option("path", path).load()
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(sink)

    first = drain().count()
    assert first == 25
    appended = nat.filter(F.col("n_nationkey") < 10).coalesce(1)
    (appended.write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    total = drain().count()  # file sink accumulates across runs
    assert total == 35, "second run must emit exactly the 10 appended rows"


def test_overwrite_bumps_version_and_vacuums_after_publish(
        spark, sf_dir, tmp_path):
    """An overwrite of a live table must never reuse its file names
    (the previous version's files survive until the new manifest is
    published) and must leave no superseded files or staging tmps."""
    import json

    path = str(tmp_path / "m4")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m1 = write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])
    v1_names = {os.path.basename(f["path"]) for f in m1["files"]}
    m2 = write_manifest_table(nat.coalesce(2), path, ["n_nationkey"])
    with open(os.path.join(path, "manifest.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk["version"] == m1.get("version", 0) + 1
    v2_names = {os.path.basename(f["path"]) for f in m2["files"]}
    assert v1_names.isdisjoint(v2_names), "overwrite reused live names"
    names = set(os.listdir(path))
    assert not any(n.endswith(".tmp") for n in names)
    assert {n for n in names if n.endswith(".parquet")} == v2_names
    register(spark)
    assert (spark.read.format("graft_manifest").option("path", path)
            .load().count()) == 25


def test_fully_pruned_scan_returns_zero_rows(spark, manifest_dir):
    """When pushed filters prune EVERY file, partitions() is empty and
    the runtime substitutes a single None partition; read(None) must
    yield nothing, not crash (round-3 advisory)."""
    path, m = manifest_dir
    register(spark)
    beyond = max(f["stats"]["order_year"]["max"] for f in m["files"]) + 1
    got = (spark.read.format("graft_manifest").option("path", path).load()
           .filter(F.col("order_year") >= beyond))
    assert got.count() == 0


def test_missing_path_option_raises_value_error(spark):
    register(spark)
    with pytest.raises(Exception, match="requires option 'path'"):
        spark.read.format("graft_manifest").load().collect()


def test_concurrent_appends_no_lost_update(spark, sf_dir, tmp_path):
    """Optimistic concurrency: two writers initialized against the SAME
    latest version both commit appends; the CAS loop must land them as
    consecutive versions with BOTH file sets present (no lost update)."""
    import json
    import pyarrow as pa
    import pyarrow.parquet as pq
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        ManifestArrowWriter,
        _FileCommit,
        load_manifest,
    )

    path = str(tmp_path / "mcc")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m0 = write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])

    def staged_commit(tag: str):
        """A writer whose task output is staged by hand (driver-side
        stand-in for the executor write path), not yet committed."""
        w = ManifestArrowWriter(
            {"path": path, "statcols": "k"},
            spark.createDataFrame([(1,)], "k int").schema,
            overwrite=False)
        tmp = os.path.join(path, f".stage_{tag}.{w._commit_id}.tmp")
        final = os.path.join(path, f"part-x-{tag}-{w._commit_id}.parquet")
        pq.write_table(pa.table({"k": [1, 2, 3]}), tmp)
        return w, [_FileCommit(tmp_path=tmp, final_path=final, rows=3,
                               stats={"k": {"min": 1, "max": 3}})]

    # both writers plan against version 0, then commit one after the
    # other — writer B's planned version collides and must rebase
    wa, ma = staged_commit("a")
    wb, mb = staged_commit("b")
    wa.commit(ma)
    wb.commit(mb)
    latest = load_manifest(path)
    assert latest["version"] == m0["version"] + 2
    paths = [f["path"] for f in latest["files"]]
    assert ma[0].final_path in paths and mb[0].final_path in paths
    assert len(paths) == len(m0["files"]) + 2
    # prior entries keep their log positions (stream-offset contract)
    assert latest["files"][:len(m0["files"])] == m0["files"]
    # intermediate snapshot is readable (time travel across the race)
    mid = load_manifest(path, m0["version"] + 1)
    assert len(mid["files"]) == len(m0["files"]) + 1


def test_time_travel_reads_version_as_of(spark, sf_dir, tmp_path):
    """Every commit leaves an immutable snapshot; versionAsOf=N reads
    the table exactly as of version N after later appends."""
    path = str(tmp_path / "mtt")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.filter(F.col("n_nationkey") < 10).coalesce(1),
                         path, ["n_nationkey"])
    (nat.filter(F.col("n_nationkey") >= 10).coalesce(1)
     .write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    latest = spark.read.format("graft_manifest").option("path", path).load()
    v0 = (spark.read.format("graft_manifest").option("path", path)
          .option("versionAsOf", "0").load())
    assert latest.count() == 25
    assert v0.count() == 10
    assert v0.agg(F.max("n_nationkey")).collect()[0][0] == 9
    # a never-written version is a clear error, not garbage
    with pytest.raises(Exception, match="not available"):
        (spark.read.format("graft_manifest").option("path", path)
         .option("versionAsOf", "99").load().collect())


def test_schema_evolution_null_fills_old_files(spark, sf_dir, tmp_path):
    """Appending a widened schema evolves the manifest schema; files
    written before the new column read back NULL-filled (the
    add-column contract every table format honors)."""
    path = str(tmp_path / "mse")
    nat = load_table(spark, sf_dir, "nation")
    register(spark)
    write_manifest_table(
        nat.select("n_nationkey", "n_name").coalesce(1), path,
        ["n_nationkey"])
    (nat.select("n_nationkey", "n_name", "n_regionkey").coalesce(1)
     .write.format("graft_manifest").mode("append")
     .option("path", path).option("statCols", "n_nationkey").save())
    df = spark.read.format("graft_manifest").option("path", path).load()
    assert set(df.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    assert df.count() == 50
    assert df.filter(F.col("n_regionkey").isNull()).count() == 25
    # time travel before the evolution sees the NARROW schema
    v0 = (spark.read.format("graft_manifest").option("path", path)
          .option("versionAsOf", "0").load())
    assert v0.columns == ["n_nationkey", "n_name"]
    # a type CHANGE for an existing column is refused
    with pytest.raises(Exception, match="cannot change column"):
        (nat.select(F.col("n_nationkey").cast("string"), "n_name")
         .coalesce(1).write.format("graft_manifest").mode("append")
         .option("path", path).option("statCols", "").save())


def test_txn_append_is_idempotent(spark, sf_dir, tmp_path):
    """txnAppId/txnVersion watermarking: replaying a committed (app,
    version) append is a no-op — same rows, same manifest version, no
    orphan files (the exactly-once primitive the streaming sink uses)."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
    )

    path = str(tmp_path / "mtxn")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    register(spark)
    write_manifest_table(nat.coalesce(1), path, ["n_nationkey"])

    def txn_append(batch_id: int):
        (nat.filter(F.col("n_nationkey") < 5).coalesce(1)
         .write.format("graft_manifest").mode("append")
         .option("path", path).option("statCols", "n_nationkey")
         .option("txnAppId", "app1").option("txnVersion", str(batch_id))
         .save())

    txn_append(0)
    v_after = load_manifest(path)["version"]
    n_after = (spark.read.format("graft_manifest").option("path", path)
               .load().count())
    txn_append(0)  # replay: must no-op
    assert load_manifest(path)["version"] == v_after
    assert (spark.read.format("graft_manifest").option("path", path)
            .load().count()) == n_after
    data_files = {n for n in os.listdir(path) if n.endswith(".parquet")}
    assert data_files == {os.path.basename(f["path"])
                          for f in load_manifest(path)["files"]}
    txn_append(1)  # a NEW batch id commits normally
    assert load_manifest(path)["version"] == v_after + 1
    assert (spark.read.format("graft_manifest").option("path", path)
            .load().count()) == n_after + 5
