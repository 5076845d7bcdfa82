from __future__ import annotations

import os

import pytest

TEST_SF_DIR = os.environ.get("NIBBLER_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from nibbler_spark.session import get_spark

    # Small local parallelism: testdata at sf0.001 is ~6k rows; more tasks
    # would only add scheduling overhead. Scale knobs live in session.py.
    spark = get_spark(
        app_name="nibbler-spark-tests",
        cpus=int(os.environ.get("NIBBLER_TEST_CPUS", "4")),
        shuffle_partitions=4,
        driver_memory="4g",
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from nibbler_spark.oracle import make_duckdb

    con = make_duckdb(sf_dir)
    yield con
    con.close()
