"""Shared fixtures: one SparkSession and one DuckDB catalog per run.

Tests run at sf0.001 (~6k lineitem rows) — the correctness scale; the
driver re-checks at sf0.01 and benches at sf0.1.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Shorter manifest checkpoint cadence for the suite (set BEFORE the
# package imports below resolve manifest_source): the checkpoint-
# boundary tests cross the cadence with 8 commit jobs instead of 16+
# — identical logic, roughly half the commit-loop wall clock of the
# two slowest tests in the suite.  Env (not monkeypatch) so Python
# data-source worker processes see the same value.
os.environ.setdefault("SPARK_GRAFT_CHECKPOINT_EVERY", "8")

from data_engineering_pipeline_project_cloud_spark.session import get_spark  # noqa: E402
from data_engineering_pipeline_project_cloud_spark.sources import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Reserve a port and export the object-store env BEFORE any JVM
# launches: Spark's Python workers inherit the executor JVM's
# environment, which inherits THIS process's environment at session
# creation — so the in-process fake S3 (tests/fake_s3.py, bound to
# this port by tests/test_s3_table.py) is reachable from worker-side
# table_fs too.  Everything uses setdefault: a real endpoint set by
# the caller wins.
import socket  # noqa: E402

_sock = socket.socket()
_sock.bind(("127.0.0.1", 0))
FAKE_S3_PORT = _sock.getsockname()[1]
_sock.close()
os.environ.setdefault("SPARK_GRAFT_FAKE_S3_PORT", str(FAKE_S3_PORT))
os.environ.setdefault("SPARK_GRAFT_S3_ENDPOINT",
                      f"http://127.0.0.1:{os.environ['SPARK_GRAFT_FAKE_S3_PORT']}")
os.environ.setdefault("AWS_ACCESS_KEY_ID", "graft-test")
os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "graft-test")
os.environ.setdefault("AWS_REGION", "us-east-1")


@pytest.fixture(scope="session")
def spark():
    # 8 initial shuffle partitions for the sf0.001 suite: AQE already
    # coalesces batch shuffles, but STREAMING state stores are sized
    # by the initial number — at 32 every stateful drain creates 32
    # state-store instances per operator per run, pure fixed overhead
    # on 6k-row test data.  Results are partition-count-independent
    # (decimal/integer aggregation, watermark semantics unchanged);
    # the driver's own correctness/bench runs use their own sessions
    # and are unaffected.
    return get_spark("pytest", shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()
