"""Streaming corpus-quality drift monitor: every ingest micro-batch is
scored against a FROZEN reference profile (the accepted previous
release's metric distribution) and a one-row PSI verdict is appended to
a telemetry log — the "is today's crawl still the corpus I validated"
alarm, running inside the same ``foreachBatch`` cadence as the ingest
loops.

Design:

* ``write_reference_profile`` runs ONCE per accepted release: decile
  edges from a GK-sketch pass + per-bucket shares (the batch operator
  :func:`~connect_server_spark.operators.quality.metric_drift`'s
  old-release side, persisted). The profile is ``n_buckets`` rows — a
  bounded model artifact, like the IVF centroids or the BPE merges.
* ``quality_monitor_sink`` buckets each micro-batch with the STORED
  edges (collected once at sink build — bounded read; the bucket CASE
  is scan-stage), computes batch shares + PSI terms against the stored
  shares, and writes ONE summary row ``(batch_id, n_docs, psi,
  max_term_bucket)`` into the log's ``batch=<id>`` partition via
  overwrite — a replayed batch overwrites its own row byte-identically,
  so the log is exactly-once per batch while the write stays
  at-least-once (same discipline as the BM25 meta partials).
* The monitor never sees more than O(batch) rows and the profile never
  rescans the reference corpus: at 100 TB the alarm costs one narrow
  (bucket, count) aggregation per micro-batch.

Batch-equivalence and replay idempotence are pinned in
``tests/test_streaming.py`` (quality-monitor suite).
"""

from __future__ import annotations

import math
import posixpath
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_reference_profile", "quality_monitor_sink", "read_monitor_log"]

_EPS = 1e-6


def write_reference_profile(
    df: DataFrame,
    metric_col: str,
    path: str,
    n_buckets: int = 10,
    rel_err: float = 1e-4,
) -> None:
    """Persist the accepted release's distribution as ``(bucket, lo,
    hi, share_ref)`` — the frozen comparison model. Edges are the
    release's ``n_buckets``-quantiles (duplicate edges collapsed, same
    contract as ``metric_drift``)."""
    from connect_server_spark.operators.quality import metric_drift

    # metric_drift against itself yields exactly the reference buckets,
    # bounds, and shares (share_old == share_new == share_ref)
    prof = metric_drift(
        df, df, metric_col, n_buckets=n_buckets, rel_err=rel_err
    ).select(
        "bucket", "lo", "hi", F.col("share_old").alias("share_ref")
    )
    prof.coalesce(1).write.mode("overwrite").parquet(path)


def _bucket_expr(metric_col: str, rows) -> Column:
    from connect_server_spark.operators.quality import bucket_case

    # the stored profile's finite upper edges, ascending — handed to the
    # SAME case builder metric_drift used to bucket the reference
    # release, so streaming and batch can never bucket differently
    edges = [r.hi for r in rows if not math.isinf(r.hi)]
    return bucket_case(F.col(metric_col), edges)


def quality_monitor_sink(
    spark: SparkSession,
    profile_path: str,
    log_path: str,
    metric_col: str,
    psi_alert: float = 0.25,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` monitor. The profile is read once
    (bounded: ``n_buckets`` rows) and frozen into the sink closure —
    per batch only the batch itself is scanned."""
    rows = sorted(
        spark.read.parquet(profile_path).collect(), key=lambda r: r.bucket
    )
    ref = {r.bucket: r.share_ref for r in rows}
    bucket = None  # built lazily so the closure pickles cheaply

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal bucket
        if bucket is None:
            bucket = _bucket_expr(metric_col, rows)
        counts = {
            r.bucket: r.n
            for r in batch_df.filter(F.col(metric_col).isNotNull())
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_docs = sum(counts.values())
        if n_docs == 0:
            # an empty (or all-null) batch has NO distribution to
            # compare — recording psi from all-zero shares would report
            # maximum drift and fire a guaranteed false alarm on every
            # idle trigger. Record the heartbeat row, never alert.
            row = [(int(batch_id), 0, None, -1, False)]
        else:
            psi = 0.0
            worst_bucket, worst_term = -1, -1.0
            for b, share_ref in ref.items():
                share_new = counts.get(b, 0) / n_docs
                p = max(share_new, _EPS)
                q = max(share_ref, _EPS)
                term = (p - q) * math.log(p / q)
                psi += term
                if term > worst_term:
                    worst_bucket, worst_term = b, term
            row = [(
                int(batch_id),
                int(n_docs),
                round(psi, 6),
                int(worst_bucket),
                bool(psi > psi_alert),
            )]
        (
            spark.createDataFrame(
                row,
                "batch_id long, n_docs long, psi double, "
                "worst_bucket int, alert boolean",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(posixpath.join(log_path, f"batch={batch_id}"))
        )

    return sink


def read_monitor_log(spark: SparkSession, log_path: str) -> DataFrame:
    """The telemetry log, one row per observed batch (the ``batch=<id>``
    partition value is redundant with the stored batch_id column and is
    dropped on read)."""
    return (
        spark.read.parquet(log_path)
        .select("batch_id", "n_docs", "psi", "worst_bucket", "alert")
        .orderBy("batch_id")
    )
