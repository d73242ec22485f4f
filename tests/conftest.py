from __future__ import annotations

import os

import pytest

from qcardia_data_spark import get_spark

SF_TEST_DIR = os.environ.get("QDS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="qds-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST_DIR


@pytest.fixture(scope="session")
def shared_spark(spark):
    """Session-scoped alias usable inside hypothesis @given tests."""
    return spark
