from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawler-spark-tests", master="local[*]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_cfg():
    from crawler_spark.sources.webgraph import WebGraphConfig
    return WebGraphConfig(n_hosts=8, max_pages_per_host=12, out_degree=5)
