"""Streaming daily-ingest dedup: the end-to-end shape a training-data
pipeline runs every day, as a Structured Streaming ``foreachBatch`` sink.

New-document micro-batches dedup against the PERSISTED MinHash-LSH index
(:func:`~connect_server_spark.operators.dedup.write_minhash_index`), so
per batch the cluster does O(batch) work plus an equi-join against the
band index — corpus text is never rescanned. Each micro-batch:

1. computes shingles/signatures for the batch only and probes the
   persisted ``(id, band, band_hash)`` index
   (:func:`minhash_neardup_against_index`);
2. verifies candidates exactly against the persisted shingle store,
   drops self-pairs (a replayed batch colliding with its own prior index
   entries), and logs confirmed near-dup pairs to ``pairs_path``;
3. grows the index by exactly the fresh survivors via
   ``write_minhash_index(mode="append")`` — O(batch) — so LATER batches
   dedup against earlier survivors too;
4. appends those survivors to ``survivors_path`` through the S8
   idempotent insert guard (``sinks.fresh_rows`` — a replayed
   micro-batch after a checkpoint restart re-appends nothing).

Step order is load-bearing: the index append runs BEFORE the survivors
append, so a crash between them replays into a state where the
survivors table still selects the rows as fresh and both writes retry —
index growth is genuinely at-least-once. (Survivors-first would let the
S8 guard suppress the retry and lose the index growth permanently.)

Delivery semantics, stated honestly: the survivors table is
exactly-once (keyed anti-join guard); the pairs log and the index are
at-least-once under replay. Duplicate index rows are harmless — band
candidates are ``distinct``-ed before the verify and self-collisions are
filtered — and the pairs log is an audit artifact whose consumers must
key by (new_id, corpus_id), the classic split for idempotent-table +
append-only-log sinks.

Intra-batch duplicates are NOT collapsed here (both copies survive a
single micro-batch): run ``exact_dedup``/``minhash_neardup_pairs`` as a
pre-pass if batches can self-collide. At daily-ingest granularity the
batch is the day's crawl, which upstream exact-dedups first.

Reference parity: the reference gates every submission through a
DynamoDB conditional insert (``aws/dynamo_manager.py:339-377``); this is
that gate generalized to content-identity (near-dup) at corpus scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.execution import stage_boundary

from connect_server_spark.operators.dedup import (
    minhash_neardup_against_index,
    write_minhash_index,
)
from connect_server_spark.sinks import fresh_rows

__all__ = ["dedup_ingest_sink", "embedding_ingest_sink"]


def dedup_ingest_sink(
    spark: SparkSession,
    index_path: str,
    shingle_path: str,
    survivors_path: str,
    pairs_path: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    gate: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function for the streaming ingest-dedup
    loop. Usage::

        stream.writeStream.foreachBatch(
            dedup_ingest_sink(spark, ix, sh, surv, pairs, "doc_id", "text")
        ).option("checkpointLocation", ckpt).start()

    ``availableNow``/default triggers process micro-batches sequentially,
    so batch N+1 sees the index grown by batch N's survivors — the
    streaming run is equivalent to folding the batches through
    ``minhash_neardup_against`` one at a time (pinned in
    ``tests/test_streaming.py``).

    ``gate`` (optional) filters each micro-batch BEFORE the dedup probe
    — ingest-time curation
    (:func:`~connect_server_spark.operators.curation.make_curation_gate`:
    quality floor, token bounds, bloom decontamination). Gated-out rows
    never touch the pairs log, the survivor table, or the index, and
    the gate is deterministic, so replays gate identically."""

    def probe(batch: DataFrame) -> DataFrame:
        return minhash_neardup_against_index(
            batch,
            spark,
            index_path,
            shingle_path,
            id_col,
            text_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
        )

    def append_index(fresh: DataFrame) -> None:
        write_minhash_index(
            fresh,
            id_col,
            text_col,
            index_path,
            shingle_path,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            mode="append",
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select(id_col, text_col)
        if gate is not None:
            batch = gate(batch)
        _run_ingest_batch(
            spark,
            batch,
            probe,
            append_index,
            survivors_path,
            pairs_path,
            id_col,
        )

    return sink


def _run_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    probe: Callable[[DataFrame], DataFrame],
    append_index: Callable[[DataFrame], None],
    survivors_path: str,
    pairs_path: str,
    id_col: str,
) -> None:
    """The shared ingest-dedup write discipline, ONE place for the
    load-bearing ordering invariants both modality sinks rely on.
    ``probe(batch)`` returns (new_id, corpus_id, score) candidate pairs;
    ``append_index(fresh)`` grows the modality's persisted index by the
    fresh survivors."""
    # one materialization per batch: the batch feeds the probe, the
    # anti-join, and the survivor write — and a checkpoint severs
    # lineage from the streaming source for the writes below
    batch = batch_df.transform(stage_boundary, eager=True, pin=True)
    pairs = (
        probe(batch)
        # In the ingest loop survivors join the corpus id-space, so a
        # replayed batch probing an index that already holds its own
        # survivors would self-pair (new_id == corpus_id) — and,
        # unfiltered, those self-pairs would anti-join the replayed
        # batch's NOVEL rows out of the survivor set. Identity here
        # always means "my own prior index entry".
        .filter(F.col("new_id") != F.col("corpus_id"))
        .transform(stage_boundary, eager=True, pin=True)
    )
    from connect_server_spark.fsutil import append_resolved

    append_resolved(pairs, pairs_path)
    dup_ids = pairs.select(F.col("new_id").alias(id_col)).distinct()
    survivors = batch.join(dup_ids, id_col, "left_anti")
    fresh = fresh_rows(spark, survivors, survivors_path, [id_col])
    if fresh.count():
        # Index growth FIRST, survivors table second: a crash between
        # the two replays the batch, and because the survivors table
        # does not yet hold these rows, fresh_rows re-selects them and
        # BOTH appends retry — the index is at-least-once (duplicate
        # rows neutralized by the candidate distinct + the self-pair
        # filter above). The reverse order would let the S8 guard
        # suppress the retry and lose the index growth forever.
        append_index(fresh)
        append_resolved(fresh, survivors_path)


def embedding_ingest_sink(
    spark: SparkSession,
    index_path: str,
    survivors_path: str,
    pairs_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nprobe: int = 4,
) -> Callable[[DataFrame, int], None]:
    """The embedding twin of :func:`dedup_ingest_sink`: new-vector
    micro-batches dedup against the persisted IVF index
    (:func:`~connect_server_spark.operators.similarity.write_ivf_index`)
    and grow it by their survivors, closing the daily-ingest loop for the
    third dedup modality as a stream. Same write discipline, proven on
    the minhash sink: self-pairs filtered (a replayed batch collides
    with its own prior index entries), index append BEFORE the survivor
    append so index growth is at-least-once, survivors exactly-once
    through the S8 guard, pairs log at-least-once keyed by
    (new_id, corpus_id)."""
    from connect_server_spark.operators.dedup import (
        embedding_neardup_against_index,
    )
    from connect_server_spark.operators.similarity import write_ivf_index

    def probe(batch: DataFrame) -> DataFrame:
        return embedding_neardup_against_index(
            batch,
            spark,
            index_path,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            nprobe=nprobe,
        )

    def append_index(fresh: DataFrame) -> None:
        # forward the caller's column names — the index append reads
        # them off `fresh` directly
        write_ivf_index(
            fresh,
            index_path,
            corpus_id=id_col,
            corpus_vec=vec_col,
            mode="append",
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _run_ingest_batch(
            spark,
            batch_df.select(id_col, vec_col),
            probe,
            append_index,
            survivors_path,
            pairs_path,
            id_col,
        )

    return sink
