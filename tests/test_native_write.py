"""JVM-native manifest write path (round 8, `write_frame` /
`_native_write`): data staged with Spark's own parquet writer, per-file
stats harvested from footers, published through the SAME commit
protocol as the Python Arrow writer.  These tests pin the pieces the
rerouted merge/compact/zorder/sink suites don't isolate: stats parity
with the Python writer, partition-combo recovery from the staged Hive
layout (nulls, escaping, type coercion), generated-transform parity
with `_gen_array`, file rolling, constraint enforcement from footers
with the exact JVM fallback, staging hygiene, and vacuum of orphaned
stage directories.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    load_manifest,
    read_manifest,
    register,
    vacuum_manifest,
    write_frame,
    write_manifest_table,
)


def _files(m):
    return [f for f in m["files"] if not f.get("dead")]


def test_native_stats_parity_with_python_writer(spark, tmp_path):
    """Footer-harvested stats equal the Arrow writer's batch-pass
    stats for int and string columns — the pruning contract must not
    depend on which writer produced a file."""
    register(spark)
    df = spark.createDataFrame(
        [(i, f"name-{i:03d}", float(i) / 2) for i in range(100)],
        "k long, name string, v double").coalesce(1)
    p_native = str(tmp_path / "native")
    p_python = str(tmp_path / "python")
    write_frame(df, p_native, "overwrite", statCols="k,name,v")
    (df.write.format("graft_manifest").mode("overwrite")
     .option("path", p_python).option("statCols", "k,name,v").save())
    (fn,) = _files(load_manifest(p_native))
    (fp,) = _files(load_manifest(p_python))
    assert fn["rows"] == fp["rows"] == 100
    assert fn["stats"] == fp["stats"]
    assert fn["stats"]["k"] == {"min": 0, "max": 99}
    assert fn["stats"]["name"] == {"min": "name-000", "max": "name-099"}


def test_native_partition_combo_recovery(spark, tmp_path):
    """Partition values round-trip the staged Hive directory layout:
    int/string/bool types re-coerce, NULLs map through
    __HIVE_DEFAULT_PARTITION__, and characters Hive escapes in path
    names (':', '=', '%') unescape back to the original value."""
    register(spark)
    path = str(tmp_path / "combos")
    df = spark.createDataFrame(
        [(1, 7, "a:b=c%d", True), (2, 7, "plain", False),
         (3, None, None, True)],
        "id long, pk int, ps string, pb boolean")
    write_frame(df, path, "overwrite", statCols="id",
                partitionCols="pk,ps,pb")
    combos = {tuple(sorted(f["partition"].items()))
              for f in _files(load_manifest(path))}
    assert (("pb", True), ("pk", 7), ("ps", "a:b=c%d")) in combos
    assert (("pb", False), ("pk", 7), ("ps", "plain")) in combos
    assert (("pb", True), ("pk", None), ("ps", None)) in combos
    # the read side returns the ORIGINAL columns (the partitionBy
    # copies never surface), and partition pruning still applies
    out = read_manifest(spark, path)
    assert out.columns == ["id", "pk", "ps", "pb"]
    assert out.filter(F.col("ps") == "a:b=c%d").count() == 1


def test_native_gen_transforms_match_gen_array(spark, tmp_path):
    """Every partitionGen transform computed JVM-side (`_gen_expr`)
    produces the value `_gen_array` would have (the Arrow write path's
    convention, which the read side's `_gen_literal` mirrors)."""
    import pyarrow as pa

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        _gen_array,
    )

    register(spark)
    path = str(tmp_path / "gen")
    rows = [(1, "2024-03-15 07:45:10", "alphabet"),
            (2, "2023-11-02 23:05:00", "zed"),
            (3, None, None)]
    df = (spark.createDataFrame(rows, "id long, ts string, s string")
          .withColumn("ts", F.to_timestamp("ts")))
    write_frame(
        df, path, "overwrite", statCols="id",
        partitionGen=("pd=date(ts),py=year(ts),pm=month(ts),"
                      "ph=hour(ts),pb=bucket(4,id),pt=truncate(3,s)"))
    got = {f["partition"]["pb"]: f["partition"]
           for f in _files(load_manifest(path))}
    import datetime as dt

    ts = pa.array([dt.datetime(2024, 3, 15, 7, 45, 10),
                   dt.datetime(2023, 11, 2, 23, 5, 0), None],
                  pa.timestamp("us"))
    ids = pa.array([1, 2, 3], pa.int64())
    ss = pa.array(["alphabet", "zed", None])
    expect = {
        "pd": _gen_array({"transform": "date"}, ts).to_pylist(),
        "py": _gen_array({"transform": "year"}, ts).to_pylist(),
        "pm": _gen_array({"transform": "month"}, ts).to_pylist(),
        "ph": _gen_array({"transform": "hour"}, ts).to_pylist(),
        "pb": _gen_array({"transform": "bucket", "n": 4},
                         ids).to_pylist(),
        "pt": _gen_array({"transform": "truncate", "n": 3},
                         ss).to_pylist(),
    }
    for i in range(3):
        combo = got[expect["pb"][i]]
        for name in ("pd", "py", "pm", "ph", "pt"):
            assert combo[name] == expect[name][i], (name, i, combo)


def test_native_max_rows_per_file_rolls(spark, tmp_path):
    """maxRowsPerFile through the native path = Spark's
    maxRecordsPerFile: no published file exceeds the cap and every
    row lands exactly once."""
    register(spark)
    path = str(tmp_path / "roll")
    df = spark.range(1000).select(F.col("id").alias("k")).coalesce(1)
    write_frame(df, path, "overwrite", statCols="k",
                maxRowsPerFile="300")
    files = _files(load_manifest(path))
    assert len(files) >= 4
    assert all(f["rows"] <= 300 for f in files)
    assert sum(f["rows"] for f in files) == 1000
    assert read_manifest(spark, path).count() == 1000


def test_native_constraint_footer_and_exact_fallback(spark, tmp_path):
    """Write-time constraints enforce BEFORE anything publishes: the
    footer-stat check catches notNull and bound violations, and a
    violating write leaves no data files, no manifest version, and no
    stage directory behind."""
    register(spark)
    path = str(tmp_path / "cons")
    write_manifest_table(
        spark.createDataFrame([(1, 10.0)], "k long, v double"),
        path, ["k"])
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        add_table_constraint,
    )

    add_table_constraint(path, {"col": "v", "notNull": True,
                                "min": 0.0, "max": 100.0})
    v_before = load_manifest(path)["version"]
    with pytest.raises(Exception, match="constraint violated"):
        write_frame(
            spark.createDataFrame([(2, -5.0)], "k long, v double"),
            path, "append", statCols="k")
    with pytest.raises(Exception, match="NULL value"):
        write_frame(
            spark.createDataFrame([(3, None)], "k long, v double"),
            path, "append", statCols="k")
    m = load_manifest(path)
    assert m["version"] == v_before, "violating write must not commit"
    live = {os.path.basename(f["path"]) for f in _files(m)}
    on_disk = {os.path.basename(p)
               for p in glob.glob(os.path.join(path, "*.parquet"))}
    assert on_disk == live
    assert not [n for n in os.listdir(path) if n.startswith(".stage-")]
    # conforming append still lands (constraint learned from table
    # state, exactly like the Python writer)
    write_frame(spark.createDataFrame([(4, 55.0)], "k long, v double"),
                path, "append", statCols="k")
    assert read_manifest(spark, path).count() == 2


def test_native_nonportable_partition_type_refused(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "npt")
    df = spark.createDataFrame([(1, "2024-01-01")], "k long, d string") \
        .withColumn("d", F.to_date("d"))
    with pytest.raises(Exception, match="non-portable"):
        write_frame(df, path, "overwrite", statCols="k",
                    partitionCols="d")


def test_vacuum_sweeps_orphan_stage_dirs(spark, tmp_path):
    """A hard-killed native writer leaves `.stage-*`; vacuum removes
    it past the age guard and keeps a YOUNG one (possibly live)."""
    register(spark)
    path = str(tmp_path / "orph")
    write_manifest_table(
        spark.createDataFrame([(1,)], "k long"), path, ["k"])
    dead = os.path.join(path, ".stage-deadbeef")
    os.makedirs(dead)
    with open(os.path.join(dead, "part-x.parquet"), "w") as fh:
        fh.write("junk")
    rep = vacuum_manifest(path, min_age_seconds=3600.0)
    assert os.path.isdir(dead), "young stage dir must survive"
    assert dead not in rep["removed_files"]
    old = os.path.getmtime(dead) - 7200
    os.utime(dead, (old, old))
    rep = vacuum_manifest(path, min_age_seconds=3600.0)
    assert not os.path.isdir(dead)
    assert dead in rep["removed_files"]


def test_native_timestamps_written_as_micros(spark, tmp_path):
    """The staging write pins TIMESTAMP_MICROS (never INT96) so the
    pyarrow-side readers align files at µs resolution — and the
    session conf is restored afterwards."""
    import pyarrow.parquet as pq

    register(spark)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    path = str(tmp_path / "us")
    df = (spark.createDataFrame([(1, "2024-01-02 03:04:05.123456")],
                                "k long, ts string")
          .withColumn("ts", F.to_timestamp("ts")))
    write_frame(df, path, "overwrite", statCols="k")
    assert spark.conf.get(
        "spark.sql.parquet.outputTimestampType") == prev
    (entry,) = _files(load_manifest(path))
    sch = pq.read_schema(entry["path"])
    assert str(sch.field("ts").type).startswith("timestamp[us"), sch
    got = read_manifest(spark, path).collect()[0]["ts"]
    assert got.microsecond == 123456


def test_native_partition_values_round_trip_adversarial(spark, tmp_path):
    """Hive path escaping round-trip for the characters escapePathName
    actually escapes ('=', '/', ':', '%', '#', '*', '?', quotes,
    brackets) plus unicode and whitespace: every distinct string
    partition value written through the native path must come back
    byte-identical on the manifest entry AND filter correctly."""
    register(spark)
    path = str(tmp_path / "adv")
    values = ["plain", "a=b", "a/b", "a:b", "100%", "q?x", "s t",
              "dash-dot.", "héllo", "日本語", "x#y", "br[ack]et",
              "st*ar", 'qu"ote', "ap'os", "{curly}", "c^aret",
              "back\\slash"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, p string")
    write_frame(df, path, "overwrite", statCols="id",
                partitionCols="p")
    combos = {f["partition"]["p"]
              for f in load_manifest(path)["files"]
              if not f.get("dead")}
    assert combos == set(values)
    out = read_manifest(spark, path)
    got = {(r["id"], r["p"]) for r in out.collect()}
    assert got == {(i, v) for i, v in enumerate(values)}
    # partition-value pruning on an escaped value
    one = read_manifest(spark, path, filters=[("p", "=", "a=b")])
    assert len(one.inputFiles()) == 1
    assert one.filter(F.col("p") == "a=b").count() == 1
