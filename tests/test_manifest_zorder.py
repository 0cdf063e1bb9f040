"""Z-order clustering (round 6): the layout rewrite must (a) preserve
contents exactly, (b) give every file a bounded rectangle in z-space
so min/max stats prune on EITHER z column, and (c) go through the
atomic tombstone protocol (time travel to the pre-layout version).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from data_engineering_pipeline_project_cloud_spark.sources import load_table
from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
    ManifestReader,
    load_manifest,
    register,
    write_manifest_table,
    zorder_manifest,
)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    """The same orders projection in two layouts: range by customer
    only, and z-ordered by (customer, price)."""
    base = tmp_path_factory.mktemp("zorder")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("double").alias("total_price"))
    stat_cols = ["o_custkey", "total_price", "o_orderkey"]
    register(spark)
    linear = str(base / "linear")
    write_manifest_table(orders.repartitionByRange(8, "o_custkey"),
                         linear, stat_cols)
    z = str(base / "z")
    write_manifest_table(orders.repartitionByRange(8, "o_custkey"),
                         z, stat_cols)
    n = orders.count()
    # 16 output files = 4 curve-prefix bits = a 4x4 grid: each axis
    # gets two split levels, so a sub-quartile band must skip files
    zorder_manifest(spark, z, ["o_custkey", "total_price"], stat_cols,
                    target_rows=max(1, -(-n // 16)))
    return linear, z, orders


def _survivors(path: str, filters) -> tuple[int, int]:
    rd = ManifestReader({"path": path})
    total = len(rd.partitions())
    list(rd.prune_for_scan(filters))
    return len(rd.partitions()), total


def test_zorder_preserves_contents_and_history(spark, layouts):
    linear, z, orders = layouts
    got = (spark.read.format("graft_manifest").option("path", z).load())
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, orders.collect()))
    # the rewrite is one tombstone commit: v0 (pre-layout) still travels
    m = load_manifest(z)
    assert m["version"] == 1
    pre = (spark.read.format("graft_manifest").option("path", z)
           .option("versionAsOf", "0").load())
    assert pre.count() == got.count()


def test_zorder_prunes_on_both_axes(spark, layouts):
    """The point of the curve: a narrow band on EITHER z column skips
    most files of the z-layout, while the single-column layout only
    skips on its own partition column."""
    linear, z, orders = layouts
    lo, hi = 10000.0, 30000.0
    price_band = [GreaterThanOrEqual(("total_price",), lo),
                  LessThan(("total_price",), hi)]
    ck = orders.agg(F.max("o_custkey")).collect()[0][0]
    # a band inside the second quartile of the customer domain —
    # aligned to the curve's split levels, so it cannot straddle the
    # top-level split the way a band across 50% would
    cust_band = [GreaterThanOrEqual(("o_custkey",), int(ck * 0.30)),
                 LessThan(("o_custkey",), int(ck * 0.42))]

    z_price, z_total = _survivors(z, price_band)
    lin_price, lin_total = _survivors(linear, price_band)
    assert lin_price == lin_total, \
        "price predicate should prune nothing on the customer layout"
    assert z_price <= z_total // 2, (
        f"z-layout should skip most files on the price axis "
        f"({z_price}/{z_total} survived)")

    z_cust, _ = _survivors(z, cust_band)
    assert z_cust <= z_total // 2, (
        f"z-layout should skip most files on the customer axis "
        f"({z_cust}/{z_total} survived)")


def test_zorder_requires_stats_on_z_columns(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nostats")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    register(spark)
    write_manifest_table(orders.coalesce(2), path, ["o_orderkey"])
    with pytest.raises(ValueError, match="statCols"):
        zorder_manifest(spark, path, ["o_custkey"], ["o_orderkey"],
                        target_rows=1000)


def test_quantile_bucketing_skips_under_skew(spark, tmp_path):
    """Exponentially-spaced key: linear buckets collapse the dense
    low end into one bucket (files there span the whole dense region
    — a selective predicate prunes nothing), while quantile buckets
    give the dense region its own boundaries and the same predicate
    skips most files.  Content parity holds for both layouts."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        read_manifest,
        register,
        write_manifest_table,
        zorder_manifest,
    )

    register(spark)
    rows = [(i, 2 ** (i % 20), float(i % 7)) for i in range(4000)]
    want = sorted(rows)

    def build(mode: str, path: str) -> int:
        df = spark.createDataFrame(rows, "k int, a long, b double")
        write_manifest_table(df.repartition(4), path, ["k", "a", "b"])
        zorder_manifest(spark, path, ["a", "b"], ["k", "a", "b"],
                        target_rows=250, bucketing=mode)
        scan = read_manifest(spark, path,
                             filters=[("a", "<=", 32)])
        got = sorted(map(tuple, read_manifest(spark, path).collect()))
        assert got == want, f"{mode} layout changed the data"
        return len(scan.inputFiles())

    lin = build("linear", str(tmp_path / "lin"))
    qnt = build("quantile", str(tmp_path / "qnt"))
    # the dense-region predicate (a <= 32 covers 6 of 20 exponents)
    # must open strictly fewer files under quantile bucketing
    assert qnt < lin, (qnt, lin)
    # refusal on a bogus mode
    with pytest.raises(ValueError, match="unknown bucketing"):
        zorder_manifest(spark, str(tmp_path / "lin"), ["a"],
                        ["k", "a", "b"], target_rows=250,
                        bucketing="nope")


def test_cluster_by_drives_optimize(spark, tmp_path):
    """set_cluster_by persists clustering columns as table state;
    optimize_manifest reads the policy: clustered tables re-lay out
    along the z-curve (both-axis file skipping), plain tables
    bin-pack.  The spec survives restore and appends; an unknown
    column is refused; CLUSTER BY NONE clears it."""
    import pytest

    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        ManifestReader,
        load_manifest,
        optimize_manifest,
        read_manifest,
        register,
        restore_manifest,
        set_cluster_by,
    )

    register(spark)
    path = str(tmp_path / "cb")
    n = 32 * 32
    df = spark.createDataFrame(
        [(i % 32, i // 32, float(i)) for i in range(n)],
        "a int, b int, x double")
    (df.repartition(8).write.format("graft_manifest").mode("overwrite")
     .option("path", path).option("statCols", "a,b").save())
    with pytest.raises(Exception, match="not in table schema"):
        set_cluster_by(path, ["nope"])
    set_cluster_by(path, ["a", "b"])
    assert load_manifest(path)["clusterBy"] == ["a", "b"]
    m = optimize_manifest(spark, path, target_rows=128)
    live = [f for f in m["files"] if not f.get("dead")]
    assert len(live) >= 4
    # z-layout: a selective predicate on EITHER axis skips most files
    rd = ManifestReader({"path": path})
    total = len(rd.partitions())
    from pyspark.sql.datasource import EqualTo
    for col in ("a", "b"):
        rd2 = ManifestReader({"path": path})
        list(rd2.prune_for_scan([EqualTo((col,), 3)]))
        assert len(rd2.partitions()) < total
    # content parity
    got = read_manifest(spark, path)
    assert got.count() == n
    assert got.agg({"x": "sum"}).first()[0] == sum(
        float(i) for i in range(n))
    # the spec survives restore (metadata rolls back with the schema)
    v = load_manifest(path)["version"]
    restore_manifest(path, v - 1)
    assert load_manifest(path)["clusterBy"] == ["a", "b"]
    # CLUSTER BY NONE → optimize falls back to bin packing
    set_cluster_by(path, [])
    assert load_manifest(path)["clusterBy"] == []
    m2 = optimize_manifest(spark, path, target_rows=10**6)
    live2 = [f for f in m2["files"] if not f.get("dead")]
    assert len(live2) == 1  # all files packed into one
    assert read_manifest(spark, path).count() == n


def test_incremental_optimize_clusters_only_new_files(spark, tmp_path):
    """Incremental liquid clustering (round 8): z-order rewrites stamp
    their output with the layout signature; an incremental OPTIMIZE
    rewrites ONLY unstamped/differently-stamped files (new appends),
    already-clustered files keep their bytes, and the steady-state run
    is a version-preserving no-op."""
    from data_engineering_pipeline_project_cloud_spark.sources.manifest_source import (
        load_manifest,
        optimize_manifest,
        read_manifest,
        register,
        set_cluster_by,
        write_frame,
    )

    register(spark)
    path = str(tmp_path / "inc")
    df = spark.createDataFrame(
        [(i, i % 97, float(i)) for i in range(5000)],
        "k long, g long, v double")
    write_frame(df.filter("k < 3000").repartition(4), path,
                "overwrite", statCols="k,g")
    set_cluster_by(path, ["k", "g"])
    optimize_manifest(spark, path, target_rows=1500)
    era1 = {f["path"] for f in load_manifest(path)["files"]
            if not f.get("dead")}
    assert all(f.get("clusteredBy") == "z:k,g|linear8"
               for f in load_manifest(path)["files"]
               if not f.get("dead"))
    write_frame(df.filter("k >= 3000").repartition(3), path, "append",
                statCols="k,g")
    optimize_manifest(spark, path, target_rows=1500, incremental=True)
    m = load_manifest(path)
    live = [f for f in m["files"] if not f.get("dead")]
    # era-1 clustered files untouched; everything now stamped
    assert era1 <= {f["path"] for f in live}
    assert all(f.get("clusteredBy") for f in live)
    # steady state: no-op, no new version
    v = m["version"]
    optimize_manifest(spark, path, target_rows=1500, incremental=True)
    assert load_manifest(path)["version"] == v
    # contents unchanged throughout
    assert read_manifest(spark, path).count() == 5000
    got = read_manifest(spark, path).agg(
        {"v": "sum"}).collect()[0][0]
    assert got == sum(float(i) for i in range(5000))
    # a POLICY change (different bits) re-clusters everything
    optimize_manifest(spark, path, target_rows=1500, incremental=True,
                      bits=6)
    live2 = [f for f in load_manifest(path)["files"]
             if not f.get("dead")]
    assert all(f.get("clusteredBy") == "z:k,g|linear6" for f in live2)
