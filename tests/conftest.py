"""Shared Spark fixtures: one local session per test run, tmp warehouse."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from open_source_search_engine_spark.catalog import Catalog
from open_source_search_engine_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # 12g driver heap: the full suite runs ~10k stages in ONE JVM and the
    # default 8g flaked once with an analysis-time OOM in the last module
    # (cumulative persisted frames + code-cache, not any single plan)
    import os

    os.environ.setdefault("OSSE_DRIVER_MEM", "12g")
    s = get_spark(app_name="osse-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def warehouse():
    d = tempfile.mkdtemp(prefix="osse-wh-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def catalog(spark, warehouse):
    return Catalog(spark, warehouse)
