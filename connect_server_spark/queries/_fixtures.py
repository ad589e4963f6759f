"""Shared guard for on-disk build caches behind bench/demo queries.

Several queries build a one-time fixture store (z-ordered table copy,
sketch ledger, WARC/JSONL shards) under a ``/tmp`` default keyed by
dataset content. Two rules keep those caches cluster-honest, in ONE
place so the legs can never drift apart (r9 advice #2):

* the root resolves from an env var, so pointing it at shared storage
  (``hdfs://``/``s3a://``) makes the same fixture work on a cluster;
  a driver-local default is REFUSED off local masters — executors'
  scans would silently miss driver-local files;
* completion probes go through the Hadoop FS (``fs_exists``), not
  ``os.path.exists``, which only ever sees the driver's local disk.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from connect_server_spark.fsutil import fs_exists


def guarded_fixture_root(
    spark: SparkSession, env_var: str, default_root: str
) -> str:
    """Resolve a fixture-cache root: ``env_var`` wins when set; the
    driver-local default is refused off local masters."""
    root = os.environ.get(env_var, default_root)
    master = spark.sparkContext.master
    if not master.startswith("local") and "://" not in root:
        raise ValueError(
            f"fixture root {root!r} is a driver-local path but"
            f" master={master!r} — executors' scans would miss it; set"
            f" {env_var} to shared storage"
        )
    return root


def cache_root(spark: SparkSession, family: str) -> str:
    """Root for a build-once fixture-cache FAMILY (e.g.
    ``connect_server_spark_minhash_index_v2``): all families share one
    env var, ``SPARK_GRAFT_FIXTURE_CACHE_DIR`` — point it at shared
    storage and every cached index/layout fixture becomes
    cluster-readable at once; the driver-local ``/tmp`` default is
    refused off local masters. Defaults reproduce the historical
    ``/tmp/<family>`` paths exactly, so warm caches stay warm."""
    return (
        guarded_fixture_root(spark, "SPARK_GRAFT_FIXTURE_CACHE_DIR", "/tmp")
        + f"/{family}"
    )


def fixture_ready(spark: SparkSession, marker_path: str) -> bool:
    """True when the build-complete marker exists ON THE FIXTURE'S
    FILESYSTEM (Hadoop FS probe — correct for any scheme the root
    resolves to, identical to ``os.path.exists`` on local paths)."""
    return fs_exists(spark, marker_path)
