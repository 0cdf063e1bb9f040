"""foreachBatch upsert sink and corrupt-record CSV ingestion."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_pipeline_project_cloud_spark.sources import (
    load_table,
    read_csv_with_badrecords,
)
from data_engineering_pipeline_project_cloud_spark.streaming.events import (
    stream_user_lifetime_stats,
)
from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
    keyed_upsert_writer,
    run_foreach_batch,
)


def test_foreach_batch_upsert_latest_per_key(spark, sf_dir, tmp_path):
    """Stream the stateful lifetime aggregation through a foreachBatch
    keyed upsert over multiple micro-batches: the sink table must hold
    exactly one (latest) row per user, equal to the batch answer."""
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sink = str(tmp_path / "state_table")
    run_foreach_batch(
        stream_user_lifetime_stats(stream),
        keyed_upsert_writer(sink, ["user_id"], "n_events"),
        str(tmp_path / "ckpt"))

    table = spark.read.parquet(sink)
    batch = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                  F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                  .alias("total_value"),
                  F.max("ts").alias("last_seen")))
    assert table.count() == batch.count()  # one row per user
    joined = table.alias("t").join(batch.alias("b"), "user_id")
    mismatches = joined.filter(
        (F.col("t.n_events") != F.col("b.n_events"))
        | (F.col("t.total_value") != F.col("b.total_value"))
        | (F.col("t.last_seen") != F.col("b.last_seen"))).count()
    assert mismatches == 0


def test_read_csv_quarantines_bad_records(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,amount\n"
        "1,10.5\n"
        "not_an_int,3.25\n"     # id unparseable
        "3,oops\n"              # amount unparseable
        "4,7.0\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ])
    df = read_csv_with_badrecords(spark, str(p), schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    assert bad.count() == 2
    # quarantined rows keep their raw text for repair/audit
    raws = {r["_corrupt_record"] for r in bad.collect()}
    assert raws == {"not_an_int,3.25", "3,oops"}
    df.unpersist()


def test_jdbc_derby_roundtrip_partitioned_and_idempotent(spark, sf_dir,
                                                         tmp_path):
    """S2/S3 evidence on a real database: embedded Derby (ships with
    Spark).  The partitioned read opens 4 parallel range queries; a
    second overwrite write leaves the same rows (idempotent replace)."""
    from data_engineering_pipeline_project_cloud_spark.sources import load_table
    from data_engineering_pipeline_project_cloud_spark.sources.catalog import (
        read_jdbc,
        write_jdbc,
    )

    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    nation = load_table(spark, sf_dir, "nation")
    write_jdbc(nation, url, "nation_t", batch_size=1000, properties=props)
    write_jdbc(nation, url, "nation_t", batch_size=1000, properties=props)
    back = read_jdbc(spark, url, "nation_t",
                     partition_column="n_nationkey", lower_bound=0,
                     upper_bound=25, num_partitions=4, properties=props)
    assert back.rdd.getNumPartitions() == 4
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in nation.collect())
    assert got == want

def test_manifest_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    """Streaming into the manifest table through foreachBatch with txn
    watermarking: each micro-batch advances the manifest exactly one
    version; a checkpoint restart emits nothing already processed; a
    REPLAYED batch (Spark's at-least-once failure mode, simulated by
    invoking the callback again with a committed batch_id) no-ops."""
    import json

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
        register,
    )
    from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
        manifest_append_writer,
        run_foreach_batch,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type")
    src = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sink = str(tmp_path / "mtable")
    ckpt = str(tmp_path / "ckpt")
    writer = manifest_append_writer(sink, ["event_id"], app_id="evsink")

    run_foreach_batch(stream, writer, ckpt)
    register(spark)
    m = load_manifest(sink)
    n_batches = m["version"] + 1  # one manifest version per micro-batch
    assert n_batches >= 2
    assert int(m["txn"]["evsink"]) == n_batches - 1
    total = ev.count()
    table = spark.read.format("graft_manifest").option("path", sink).load()
    assert table.count() == total
    assert table.select("event_id").distinct().count() == total

    # restart from the same checkpoint with no new input: no new version
    stream2 = (spark.readStream.schema(spark.read.parquet(src).schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    run_foreach_batch(stream2, writer, ckpt)
    assert load_manifest(sink)["version"] == m["version"]

    # replay of an already-committed batch id must no-op inside the
    # commit protocol (version, rows, and files all unchanged)
    replay = ev.limit(7)
    writer(replay, 0)
    m2 = load_manifest(sink)
    assert m2["version"] == m["version"]
    assert (spark.read.format("graft_manifest").option("path", sink)
            .load().count()) == total
    import os
    data_files = {n for n in os.listdir(sink) if n.endswith(".parquet")}
    assert data_files == {os.path.basename(f["path"]) for f in m2["files"]}

    # genuinely new data lands exactly once
    new = ev.limit(5).withColumn("event_id", F.col("event_id") + 10_000_000)
    new.coalesce(1).write.mode("append").parquet(src)
    stream3 = (spark.readStream.schema(spark.read.parquet(src).schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    run_foreach_batch(stream3, writer, ckpt)
    m3 = load_manifest(sink)
    assert m3["version"] == m["version"] + 1
    assert (spark.read.format("graft_manifest").option("path", sink)
            .load().count()) == total + 5

def test_manifest_merge_writer_maintains_keyed_view(spark, sf_dir, tmp_path):
    """Streaming CDC-upsert view: update-mode lifetime stats merged
    into a manifest table per micro-batch must converge to the batch
    answer with ONE current row per user; a replayed batch no-ops."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
        register,
    )
    from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
        manifest_merge_writer,
        run_foreach_batch,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sink = str(tmp_path / "view")
    writer = manifest_merge_writer(sink, ["user_id"], ["user_id"], "ulview")
    run_foreach_batch(stream_user_lifetime_stats(stream), writer,
                      str(tmp_path / "ckpt"))

    register(spark)
    table = spark.read.format("graft_manifest").option("path", sink).load()
    batch = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                  F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                  .alias("total_value"),
                  F.max("ts").alias("last_seen")))
    assert table.count() == batch.count()  # one CURRENT row per user
    joined = table.alias("t").join(batch.alias("b"), "user_id")
    mismatches = joined.filter(
        (F.col("t.n_events") != F.col("b.n_events"))
        | (F.col("t.total_value") != F.col("b.total_value"))
        | (F.col("t.last_seen") != F.col("b.last_seen"))).count()
    assert mismatches == 0
    # replayed batch id: no version bump, no row change
    m = load_manifest(sink)
    writer(table.limit(3), 0)
    assert load_manifest(sink)["version"] == m["version"]
    assert (spark.read.format("graft_manifest").option("path", sink)
            .load().count()) == batch.count()


def test_cdc_apply_writer_mixed_ops_and_replay(spark, tmp_path):
    """Round 10: the CDC-apply foreachBatch sink routes each batch
    through merge_apply's clause matrix — mixed delete/update/insert
    in one commit — and a replayed batch_id no-ops (txn gate)."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
        read_manifest,
        register,
        write_manifest_table,
    )
    from data_engineering_pipeline_project_cloud_spark.streaming.sinks import (
        merge_apply_writer,
    )

    register(spark)
    path = str(tmp_path / "cdct")
    write_manifest_table(
        spark.range(0, 10).select(F.col("id").alias("k"),
                                  (F.col("id") * 1.0).alias("v")),
        path, ["k"])
    writer = merge_apply_writer(
        path, ["k"], ["k"], "cdctest",
        matched=[{"cond": "s.op = 'D'", "action": "delete"},
                 {"cond": "s.op = 'U'", "action": "update",
                  "set": {"v": "s.px"}}],
        not_matched=[{"cond": "s.op = 'I'",
                      "values": {"k": "s.k", "v": "s.px"}}])
    batch = spark.createDataFrame(
        [(1, "D", 0.0), (2, "U", 99.0), (50, "I", 5.0)],
        "k long, op string, px double")
    writer(batch, 0)
    out = {r["k"]: r["v"] for r in read_manifest(spark, path).collect()}
    assert 1 not in out and out[2] == 99.0 and out[50] == 5.0
    v_after = load_manifest(path)["version"]
    # replayed batch (same batch_id): no new version, no double apply
    writer(batch, 0)
    assert load_manifest(path)["version"] == v_after
    assert read_manifest(spark, path).filter("k = 50").count() == 1
