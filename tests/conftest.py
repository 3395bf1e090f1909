from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from gads_etl_spark.session import get_session

    # Test-session shuffle partitions: 8, not the engine's 4x-cores
    # default (round-17). Fixtures here are KB-to-MB sized, but every
    # stateful-streaming micro-batch instantiates and commits one
    # RocksDB store PER state partition — at 32 partitions the two
    # heaviest stream-equals-batch tests spent 365s of the suite's
    # 31-minute wall on store lifecycle alone (95.5s -> 39s for the
    # idle-TTL test at 4 partitions, both heavy tests 365s -> 65s at
    # 8). Product defaults are untouched; tests that probe partitioning
    # behavior (test_partition_invariance) set their own values, and
    # the env override still wins for ad-hoc runs.
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    s = get_session("gads-etl-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    from gads_etl_spark.oracle import duckdb_connect

    con = duckdb_connect(SF_ORACLE)
    yield con
    con.close()
