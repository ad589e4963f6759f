"""Streaming continuous-aggregate maintenance: the hypertable rollup
(:mod:`connect_server_spark.operators.temporal`) kept fresh by a
Structured Streaming ``foreachBatch`` sink.

Design: an **append-only partial log + merge-on-read + compaction**, the
classic exactly-once split for mergeable aggregates (the same discipline
TimescaleDB's continuous-aggregate refresh and a Kafka-Streams
changelog+compaction pair use):

* Each micro-batch appends its ``rollup_cascade`` partials to
  ``<store>/partials`` stamped with the batch id — O(batch) work, no
  read-modify-write of history, so late data lands in old buckets for
  free (its partial rows simply carry old ``bucket_ts`` values).
* A replayed batch (checkpoint restart) is detected by its batch id
  against the log ∪ the ``<store>/seen`` ledger and appends nothing —
  the log is exactly-once per batch even though the write itself is
  at-least-once.
* ``read_rollup`` merges the log's partials per (keys, bucket, level):
  associative ``merge_partials``, so read-side cost is proportional to
  DISTINCT buckets (bounded by time-range × keys), not to how many
  batches contributed.
* ``compact_rollup`` bounds log growth: merge the log into one row per
  bucket and swap it in with the storage module's two-rename
  discipline. Absorbed batch ids move to ``seen`` FIRST, then the swap:
  a crash between the two leaves a still-raw log (reads stay correct)
  and an already-updated ledger (replays stay gated) — the safe
  ordering; swap-first would let a replayed absorbed batch double-count.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.fsutil import fs_delete, fs_exists, fs_rename
from connect_server_spark.operators.temporal import (
    merge_partials,
    rollup_cascade,
)

__all__ = ["rollup_refresh_sink", "read_rollup", "compact_rollup"]

_COMPACTED = -1  # batch_id sentinel on compacted rows


def _partials_path(store: str) -> str:
    return posixpath.join(store, "partials")


def _seen_path(store: str) -> str:
    return posixpath.join(store, "seen")


def _swap_paths(store: str) -> tuple[str, str, str]:
    ppath = _partials_path(store)
    parent, leaf = posixpath.split(ppath.rstrip("/"))
    return (
        ppath,
        posixpath.join(parent, f".{leaf}._rollup_tmp"),
        posixpath.join(parent, f".{leaf}._rollup_old"),
    )


def _check_not_stranded(spark: SparkSession, store: str) -> None:
    """Refuse to touch a store whose compaction crashed between the two
    renames: the log directory is gone but ``._rollup_old`` still holds
    ALL history. Silently proceeding would fork the store — the sink
    would open a fresh empty log and reads would drop every compacted
    bucket. Recovery is one rename, so fail with the exact command."""
    ppath, _tmp, old = _swap_paths(store)
    if not fs_exists(spark, ppath) and fs_exists(spark, old):
        raise RuntimeError(
            f"{store}: crashed compaction detected — the partial log is "
            f"missing but '{old}' holds the pre-swap history. Recover "
            f"with: fsutil.fs_rename(spark, {old!r}, {ppath!r}), then "
            "re-run compact_rollup."
        )


def _batch_already_ingested(
    spark: SparkSession, store: str, batch_id: int
) -> bool:
    """Point lookup: has this batch id landed in the log or been
    absorbed by a compaction? Both scans are filter-pushdown point
    probes over narrow columns."""
    _check_not_stranded(spark, store)
    for path, col in (
        (_partials_path(store), "batch_id"),
        (_seen_path(store), "batch_id"),
    ):
        try:
            hit = (
                spark.read.parquet(path)
                .filter(F.col(col) == batch_id)
                .limit(1)
                .count()
            )
        except Exception as exc:  # PATH_NOT_FOUND on first batch
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            continue
        if hit:
            return True
    return False


def rollup_refresh_sink(
    spark: SparkSession,
    store: str,
    ts_col: str,
    value_col: str,
    keys: list[str],
    widths_seconds: list[int],
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function maintaining a persisted
    multi-resolution rollup. Per batch: skip if the batch id is already
    ingested (replay), else append the batch's cascade partials. Late
    rows merge into their (old) buckets at read time — no history
    rewrite, no watermark data loss at the store level."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if _batch_already_ingested(spark, store, batch_id):
            return
        partials = rollup_cascade(
            batch_df, ts_col, value_col, keys, widths_seconds
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        partials.write.mode("append").parquet(_partials_path(store))

    return sink


def read_rollup(
    spark: SparkSession,
    store: str,
    keys: list[str],
    width_seconds: int | None = None,
) -> DataFrame:
    """The current rollup state: log partials merged per (keys, bucket,
    level). ``width_seconds`` prunes to one level scan-stage (the
    filter pushes down to the parquet scan)."""
    _check_not_stranded(spark, store)
    log = spark.read.parquet(_partials_path(store))
    if width_seconds is not None:
        log = log.filter(F.col("bucket_seconds") == width_seconds)
    return merge_partials(log.drop("batch_id"), keys)


def compact_rollup(
    spark: SparkSession, store: str, keys: list[str]
) -> int:
    """Fold the partial log to one row per (keys, bucket, level).

    Ledger-first ordering (see module docstring), then the two-step
    rename swap: merged log written to a dot-prefixed sibling, current
    log moved aside, merged moved in, old log removed. Crash analysis,
    window by window: before the first rename — raw log intact, ledger
    already safe (replays gated). Between the renames — the log is
    MISSING with all history in ``._rollup_old``; every entry point
    (sink, read, compact) detects that state via
    :func:`_check_not_stranded` and fails with the one-rename recovery
    command instead of silently forking the store. After the second
    rename but before the cleanup — a completed swap with a stale
    ``._rollup_old``; the next compaction removes it (the swap already
    committed, the copy is garbage) rather than failing the rename.
    Returns the compacted row count.
    """
    _check_not_stranded(spark, store)
    ppath, tmp, old = _swap_paths(store)
    # a PREVIOUS run's completed swap may have crashed before cleanup;
    # with ppath present the old copy is committed garbage — clear it so
    # this run's rename cannot fail on a non-empty target.
    for stale in (old, tmp):
        if fs_exists(spark, stale):
            fs_delete(spark, stale)
    log = spark.read.parquet(ppath)
    absorbed = log.select("batch_id").distinct().filter(
        F.col("batch_id") != _COMPACTED
    )
    # 1. ledger first: replayed absorbed batches must stay gated even if
    # the swap below never happens.
    absorbed.write.mode("append").parquet(_seen_path(store))
    merged = merge_partials(log.drop("batch_id"), keys).withColumn(
        "batch_id", F.lit(_COMPACTED).cast("long")
    )
    n = merged.count()
    # 2. write-aside + two renames (same discipline as storage.compact).
    merged.write.mode("overwrite").parquet(tmp)
    fs_rename(spark, ppath, old)
    fs_rename(spark, tmp, ppath)
    fs_delete(spark, old)
    return n
