from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

from cernbox_migration_database_spark.session import get_spark  # noqa: E402

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cbx-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST_DIR
