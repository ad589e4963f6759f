"""Root conftest: puts the repo on sys.path and provides the shared
SparkSession fixture (session-scoped — JVM startup is ~10 s)."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# sf0.001 keeps unit tests fast; the driver's correctness gate runs sf0.01.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "objectstore: runs against a real S3 API (local moto server) — "
        "the measured half of SCALE.md's object-store claims",
    )


@pytest.fixture(scope="session")
def spark():
    from connect_server_spark.session import get_spark

    s = get_spark(
        app_name="connect_server_spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR


def py_winnow(text: str, k: int = 4, window: int = 4) -> set[str]:
    """hashlib reference of ``operators.dedup.winnow_fingerprints`` —
    the ONE python mirror of the winnowing scheme (normalized positional
    token k-gram md5 hexes, min per sliding window, distinct), shared by
    every test that pins against it."""
    import hashlib
    import re

    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    n_grams = max(len(toks) - k, 0) + 1
    hashes = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(n_grams)
    ]
    n_win = max(len(hashes) - window, 0) + 1
    return {min(hashes[i : i + window]) for i in range(n_win)}
