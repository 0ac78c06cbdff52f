from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "kafka: live-broker wire tests (opt-in: KAFKA_BOOTSTRAP + "
        "spark-sql-kafka jar; see tests/test_kafka_wire.py)",
    )


@pytest.fixture(scope="session")
def spark():
    from _big_data_analytics_and_visualization_tracking_student_progress__spark import (
        get_spark,
    )

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
