"""Streaming daily-ingest for the persisted BM25 search index: the
``foreachBatch`` loop that keeps the corpus searchable as new documents
arrive, without ever re-tokenizing what is already indexed.

Each micro-batch:

1. gates (optional ingest-time curation, same hook as the dedup sinks);
2. keeps only rows not already in the survivors table (the S8
   idempotent insert guard — ``sinks.fresh_rows``);
3. appends the fresh rows' term/length statistics to the BM25 index via
   :func:`~connect_server_spark.operators.retrieval.write_bm25_index`
   (``mode="append"``, O(batch) — the corpus is never rescanned), with
   the meta partial written under this batch's ledger id;
4. appends the fresh rows to the survivors table.

Ordering is load-bearing and identical to the dedup ingest sinks: the
INDEX append runs before the survivors append, so a crash between the
two replays into a state where the rows still count as fresh and both
writes retry. The replay is safe end to end: term/doclens re-appends
are identical rows that serving drops (``dropDuplicates`` in
``bm25_topk_indexed``), and the meta partial overwrites its own
``batch=<id>`` directory instead of double-counting. A re-delivered
batch AFTER full success finds nothing fresh and writes nothing — in
particular it never zeroes its meta partial.

Ledger namespace: stream epochs are offset by ``meta_namespace`` so
epoch 0 can never collide with the base build's ``batch=0`` partial.

Reference parity: the reference ingests every accepted submission into
Globus Search (``automate/minimus_mdf_flow.py:359-375``, S9); this is
that search-ingest leg re-expressed as an incremental index append.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from connect_server_spark.execution import stage_boundary

from connect_server_spark.operators.retrieval import write_bm25_index
from connect_server_spark.sinks import fresh_rows

__all__ = ["search_ingest_sink"]


def search_ingest_sink(
    spark: SparkSession,
    index_path: str,
    survivors_path: str,
    id_col: str,
    text_col: str,
    gate: Callable[[DataFrame], DataFrame] | None = None,
    meta_namespace: int = 1_000_000,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function for the streaming BM25
    ingest loop. Usage::

        stream.writeStream.foreachBatch(
            search_ingest_sink(spark, ix, surv, "doc_id", "text")
        ).option("checkpointLocation", ckpt).start()
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, text_col)
        if gate is not None:
            batch = gate(batch)
        # one materialization: feeds the guard anti-join, the index
        # append, and the survivor write; severs streaming lineage.
        batch = batch.transform(stage_boundary, eager=True, pin=True)
        fresh = fresh_rows(spark, batch, survivors_path, [id_col])
        if fresh.count():  # fresh_rows already checkpoints
            write_bm25_index(
                fresh,
                id_col,
                text_col,
                index_path,
                mode="append",
                batch_id=meta_namespace + int(batch_id),
            )
            from connect_server_spark.fsutil import append_resolved

            append_resolved(fresh, survivors_path)

    return sink
