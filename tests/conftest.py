from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from file_scraper_spark.session import get_spark

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Nearly every suite reads the driver-generated parquet fixture
    (TESTDATA.md: deterministic, read-only, NOT regenerable from this
    repo). On hosts without it — e.g. a bare CI runner — skip rather
    than fail at the first load(): point SPARK_GRAFT_TEST_SF_DIR at a
    fixture to opt back in."""
    missing = [d for d in (SF_DIR_SMOKE, SF_DIR_ORACLE) if not os.path.isdir(d)]
    if missing:
        skip = pytest.mark.skip(
            reason=f"test fixture parquet absent: {', '.join(sorted(set(missing)))}"
        )
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "pytest",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            # full PushedFilters/ReadSchema in plan strings (test_plans)
            "spark.sql.maxMetadataStringLength": "10000",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR_ORACLE
