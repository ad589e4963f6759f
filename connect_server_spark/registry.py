"""Driver-facing query registry.

Each module in ``connect_server_spark.queries`` registers
``(name, spark_fn, oracle_sql)`` triples at import time; the driver's
``__spark_entry__`` adapter reads them back. Keeping registration beside
the operator exercised makes SURVEY §2 coverage auditable per module.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_DEFERRED: dict[str, QueryFn] = {}
_ORACLE: dict[str, str | Callable[[], str]] = {}
_LOADED = False

# Query modules, one per build phase. Extend as phases land.
_QUERY_MODULES = [
    "connect_server_spark.queries.scan_queries",
    "connect_server_spark.queries.function_queries",
    "connect_server_spark.queries.version_queries",
    "connect_server_spark.queries.agg_queries",
    "connect_server_spark.queries.org_queries",
    "connect_server_spark.queries.dedup_queries",
    "connect_server_spark.queries.similarity_queries",
    "connect_server_spark.queries.text_queries",
    "connect_server_spark.queries.submit_queries",
    "connect_server_spark.queries.validator_queries",
    "connect_server_spark.queries.extractor_queries",
    "connect_server_spark.queries.flow_queries",
    "connect_server_spark.queries.streaming_queries",
    "connect_server_spark.queries.transfer_queries",
    "connect_server_spark.queries.temporal_queries",
    "connect_server_spark.queries.sampling_queries",
    "connect_server_spark.queries.quality_queries",
    "connect_server_spark.queries.events_analytics_queries",
    "connect_server_spark.queries.retrieval_queries",
    "connect_server_spark.queries.curation_queries",
    "connect_server_spark.queries.release_queries",
]


def register(
    name: str,
    fn: QueryFn,
    sql: str | Callable[[], str] | None = None,
    defer: bool = False,
) -> None:
    """Register a driver query. ``defer=True`` pushes the entry to the END
    of ``all_queries()`` iteration order — used for the rows-only queries
    (no SQL-expressible oracle) so every oracle-gated query falls inside
    the correctness driver's first-50 window.

    ``sql`` may be a zero-arg callable resolved lazily in
    ``all_oracle_sql()``: an oracle whose SQL fragments live in ANOTHER
    query module must not import that module at registration time (it
    would reorder query registration mid-load)."""
    if name in _QUERIES or name in _DEFERRED:
        raise ValueError(f"duplicate query name '{name}'")
    if defer and sql is not None:
        raise ValueError(f"'{name}': deferred queries must be rows-only")
    (_DEFERRED if defer else _QUERIES)[name] = fn
    if sql is not None:
        _ORACLE[name] = sql


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {**_QUERIES, **_DEFERRED}


def all_oracle_sql() -> dict[str, str]:
    _load()
    return {k: (v() if callable(v) else v) for k, v in _ORACLE.items()}


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The smoke-check query the driver runs via ``entry()``: the submit
    pipeline — the reference's main entry point (``POST /submit``,
    SURVEY §3.1), composing the org broadcast join, the latest-version
    aggregation join, every guard stage, and version assignment."""
    _load()
    return _QUERIES["submit_pipeline"](spark, sf_dir)
