"""End-to-end pipeline test (O1-O3): all three stages run, outputs
land, the grain holds, and re-running is idempotent.  Also covers the
strict-schema CSV ingest path (S1).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_pipeline_project_cloud_spark.etl import run_pipeline
from data_engineering_pipeline_project_cloud_spark.sources import (
    assert_unique_key,
    read_csv_strict,
)


def test_pipeline_end_to_end_and_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "warehouse")
    report = run_pipeline(spark, sf_dir, out)
    stages = {s["stage"]: s["result"] for s in report["stages"]}
    assert set(stages) == {"raw_load", "dim_build", "quality_gate",
                           "master_build"}
    assert stages["raw_load"]["lineitem"] > 0
    assert stages["dim_build"] > 0
    assert stages["master_build"] > 0
    # the gate ran every contract and found the sources clean
    assert stages["quality_gate"] and all(
        v == 0 for v in stages["quality_gate"].values())

    master = spark.read.parquet(f"{out}/master_table")
    assert_unique_key(master, ["order_id", "order_item_id"])
    # month-partitioned serving layout survived the write
    assert "order_purchase_month" in master.columns

    # idempotency: overwrite contract — same counts on re-run
    report2 = run_pipeline(spark, sf_dir, out)
    stages2 = {s["stage"]: s["result"] for s in report2["stages"]}
    assert stages2 == stages


def test_read_csv_strict_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,amount\n1,ann,10.50\n2,bob,3.25\n,missing,\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.StringType()),  # load loose (§1.3)
    ])
    df = read_csv_strict(spark, str(p), schema)
    assert df.schema == schema  # pinned, no inference pass
    rows = df.orderBy(F.col("id").asc_nulls_last()).collect()
    assert [r["id"] for r in rows] == [1, 2, None]
    # cast strict happens downstream, exactly like the reference
    amounts = (df.select(F.col("amount").cast("decimal(12,2)").alias("a"))
               .orderBy(F.col("a").asc_nulls_last()).collect())
    assert str(amounts[0]["a"]) == "3.25"


def test_cli_serve_registers_views_and_answers_sql(
        spark, sf_dir, tmp_path, capsys):
    """The `serve` CLI (deploy/docker-compose.yml's serving service):
    materialize the mart, register the views, answer a SQL statement —
    the containerized BI entry driven end-to-end in-process."""
    from data_engineering_pipeline_project_cloud_spark.__main__ import main

    out = str(tmp_path / "mart")
    rc = main(["serve", "--sf-dir", sf_dir, "--out", out])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["views"] == ["mart_master", "mart_monthly_category_kpis",
                            "mart_seller_kpis"]
    rc = main(["serve", "--sf-dir", sf_dir, "--out", out, "--sql",
               "SELECT COUNT(*) AS n FROM mart_master"])
    assert rc == 0
    shown = capsys.readouterr().out
    n = spark.read.parquet(out).count()
    assert str(n) in shown
