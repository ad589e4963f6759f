"""Mergeable distinct-count sketches (Apache DataSketches HLL, via
Spark's built-in ``hll_sketch_agg``/``hll_union_agg``) and the batch
ledger that makes corpus cardinality telemetry O(recent batches).

Why sketches at 100 TB: "distinct users / domains / doc ids so far"
via ``count_distinct`` re-shuffles the whole history every time it is
asked. An HLL sketch is a few KB, mergeable, and answers within ~1–2%
(lg_k=12 → ~1.6% RSE) — so each ingest batch persists one PARTIAL
sketch row per group, and any later question is a union over the
ledger's tiny rows, never a re-scan of the corpus. This is the same
partial-plus-merge discipline as the BM25 ``termstats`` ledger
(`operators/retrieval.py`), applied to cardinalities:

* **Partials are replay-idempotent**: batch ``i`` overwrites its own
  ``batch=<i>/`` directory, so an at-least-once replay converges
  instead of double-counting (sketch union is NOT idempotent across
  duplicated partials of different construction, but overwriting the
  same directory makes the ledger's contents identical either way).
* **Compaction keeps the ledger bounded**: all-but-the-newest partials
  merge into ONE row per group under the highest absorbed batch id —
  the newest stays unmerged because only the LATEST batch can replay;
  absorbed ids are committed and never reissued. Published through the
  generation pointer, object-store-safe.
* **Estimates are union-order-independent** (HLL merge is commutative
  and associative), so compacted and uncompacted ledgers answer
  identically — pinned in ``tests/test_sketches.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch",
    "sketch_estimates",
    "write_sketch_partial",
    "read_sketch_ledger",
    "distinct_estimates",
    "compact_sketch_ledger",
]

_LG_K = 12  # ~1.6% relative standard error, ~2.5 KB per sketch


def distinct_sketch(
    df: DataFrame, key: str, by: list[str] | None = None, lg_k: int = _LG_K
) -> DataFrame:
    """One HLL sketch row per ``by`` group (or one global row):
    ``(*by, sketch: binary, n_rows: long)``. A narrow (group, sketch)
    aggregation — map-side partial sketches combine, data rows never
    shuffle; only KB-sized sketch buffers enter the Exchange."""
    gb = df.groupBy(*by) if by else df.groupBy()
    return gb.agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def sketch_estimates(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Union the sketch rows per group and estimate: ``(*by,
    distinct_est: long, n_rows: long)``. Accepts any mix of partials —
    union is commutative/associative, so ledger layout never changes
    the answer."""
    gb = sketches.groupBy(*by) if by else sketches.groupBy()
    return gb.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "distinct_est"
        ),
        F.sum("n_rows").alias("n_rows"),
    )


def write_sketch_partial(
    batch_df: DataFrame,
    root: str,
    batch_id: int,
    key: str,
    by: list[str] | None = None,
    lg_k: int = _LG_K,
) -> None:
    """Persist one batch's partial sketches under ``root/batch=<id>/``.
    Overwrite-by-batch-id is the replay contract: a redelivered batch
    rewrites the SAME directory, so the ledger converges under
    at-least-once delivery (same as the BM25 termstats partials)."""
    from connect_server_spark.fsutil import resolve_store

    spark = batch_df.sparkSession
    live = resolve_store(spark, root)
    (
        distinct_sketch(batch_df, key, by=by, lg_k=lg_k)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{live}/batch={int(batch_id)}")
    )


def read_sketch_ledger(spark: SparkSession, root: str) -> DataFrame:
    """Every partial row in the ledger; the ``batch`` id arrives as the
    hive partition column from the ``batch=<id>/`` directory names
    (same layout as the BM25 termstats ledger)."""
    from connect_server_spark.fsutil import resolve_store

    return spark.read.parquet(resolve_store(spark, root))


def distinct_estimates(
    spark: SparkSession, root: str, by: list[str] | None = None
) -> DataFrame:
    """The ledger's answer: union all partials per group and estimate.
    Cost is O(ledger rows) = O(batches × groups) — KB-scale —
    regardless of how many corpus rows the sketches have absorbed."""
    return sketch_estimates(read_sketch_ledger(spark, root), by=by)


def compact_sketch_ledger(
    spark: SparkSession,
    root: str,
    by: list[str] | None = None,
    keep_latest: int = 1,
    keep: int = 1,
) -> int:
    """Merge all but the ``keep_latest`` newest batches' partials into
    ONE row per group under the highest absorbed batch id, published as
    a new ledger generation (pointer flip — object-store-safe). The
    newest partials stay unmerged because only the latest batch can
    replay under the monotone-id contract; merging it would strand the
    replay's overwrite target. Returns the number of batches absorbed.

    Estimates before and after are identical by HLL merge associativity
    (pinned); what changes is the ledger's row count, which is what
    keeps a year of hourly batches from growing the telemetry read."""
    from connect_server_spark.fsutil import resolve_store
    from connect_server_spark.storage import (
        ledger_batch_ids,
        merge_batch_ledger,
    )

    if keep_latest < 1:
        raise ValueError(
            "compact_sketch_ledger: keep_latest must be >= 1 — the "
            "newest batch can replay (overwriting its batch=<id> dir), "
            "so merging it under its own id would let one redelivery "
            "destroy the absorbed history"
        )
    ids = ledger_batch_ids(spark, resolve_store(spark, root))
    if len(ids) <= keep_latest:
        return 0
    absorb, keep_ids = ids[:-keep_latest], ids[-keep_latest:]
    cols = by or []

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(*cols).agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )

    merge_batch_ledger(spark, root, merge, absorb, keep_ids, keep=keep)
    return len(absorb)
