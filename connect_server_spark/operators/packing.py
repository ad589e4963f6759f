"""Sequence packing for training-data pipelines: group documents into
"packs" whose total token count fits a fixed context-window budget.

The training analog of bin packing — LLM pretraining concatenates
documents into fixed-length sequences, and a packer that wastes context
wastes compute. Global bin packing is inherently sequential, so the
Spark-natural decomposition is PARTITION-LOCAL greedy NEXT-FIT packing
(only the currently-open pack is considered; first-fit's
keep-earlier-packs-open variant would need per-task open-pack state
with no better bound than next-fit's 50% worst case, and in practice
token counts ≪ budget keep next-fit's fill near-optimal — see the
fill-ratio test):

* each partition packs its own documents in deterministic id order
  (hash-repartition + sortWithinPartitions pins both membership and
  order, so output is stable across runs and retries);
* the only waste vs a global greedy is the final partial pack per
  partition — bounded by ``n_partitions / n_packs``, negligible when
  partitions hold millions of tokens;
* no shuffle beyond the one repartition; state never leaves a task.

``mapInPandas`` iterates every Arrow batch of one partition inside a
single task, so the greedy accumulator carries across batches without
``collect`` or ``applyInPandasWithState``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "chunk_documents", "pack_chunks", "chunk_and_pack"]

# pack_id = partition_id * _PART_STRIDE + local pack index: globally
# unique without coordination, and 2^40 packs per partition is
# unreachable (a pack is >= 1 document).
_PART_STRIDE = 1 << 40

PACK_SCHEMA = (
    "id long, n_tokens long, pack_id long, pack_slot int, token_offset long"
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a pack so that every pack's token total is
    ``<= budget`` — except a single document longer than the budget,
    which gets a pack of its own (the caller chunks or drops those;
    packing must not silently truncate).

    Greedy next-fit in ascending id order per partition: accumulate
    documents until the next one would overflow, then open a new pack.
    Returns ``(id, n_tokens, pack_id, pack_slot, token_offset)`` —
    ``pack_slot`` is the document's position within its pack and
    ``token_offset`` its first token's position in the concatenated
    pack (the cumulative width of earlier slots), so a training loader
    can place every document without re-walking the pack.

    Input hygiene: a null/negative token count packs as 0 tokens (the
    document still gets a slot — a packer must never silently drop
    training data; raw NaN reaching the accumulator would otherwise
    abort the task). A null id raises a clear ValueError (``id`` is the
    pack ordering key — a missing key is an upstream contract bug, not
    something to guess around). Duplicate ids are tolerated — the sort
    adds ``n_tokens`` as a tie-break so retries stay deterministic even
    then.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    narrow = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.greatest(
            F.coalesce(F.col(token_col).cast("long"), F.lit(0)), F.lit(0)
        ).alias("n_tokens"),
    )
    if num_partitions is not None:
        narrow = narrow.repartition(num_partitions, "id")
    # (id, n_tokens) sort: with unique ids the tie-break is inert; with
    # duplicates it pins an order that bare sortWithinPartitions("id")
    # would leave to nondeterministic shuffle-arrival order
    narrow = narrow.sortWithinPartitions("id", "n_tokens").select(
        F.spark_partition_id().alias("_pid"), "id", "n_tokens"
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pack_idx, used, slot = -1, 0, 0
        base = None
        for pdf in batches:
            rows = []
            for pid, doc_id, n in zip(pdf["_pid"], pdf["id"], pdf["n_tokens"]):
                if pd.isna(doc_id):
                    raise ValueError(
                        "pack_sequences: null id — the id column is the "
                        "pack ordering key and must be non-null"
                    )
                if base is None:
                    base = int(pid) * _PART_STRIDE
                n = int(n)
                if pack_idx < 0 or used + n > budget:
                    pack_idx += 1
                    used, slot = 0, 0
                rows.append((int(doc_id), n, base + pack_idx, slot, used))
                used += n
                slot += 1
            yield pd.DataFrame(
                rows,
                columns=["id", "n_tokens", "pack_id", "pack_slot", "token_offset"],
            )

    return narrow.mapInPandas(pack, PACK_SCHEMA)


CHUNK_SCHEMA = "id long, chunk_idx bigint, token_start long, chunk_tokens long"

# Token counts clamp to this ceiling (2^40 ≈ a trillion tokens per
# document — far past any real payload): below it the ceil-division
# double arithmetic is exact (< 2^53) and the chunk count can neither
# overflow nor produce a negative sequence bound, so output is provably
# lossless within the clamp and degenerate inputs clamp rather than
# silently corrupt.
_MAX_DOC_TOKENS = 1 << 40


def chunk_documents(
    df: DataFrame, id_col: str, token_col: str, budget: int
) -> DataFrame:
    """Split documents into ``ceil(n/budget)`` contiguous token RANGES of
    at most ``budget`` tokens — the standard long-document pre-pass
    before :func:`pack_sequences`, whose contract gives oversized
    documents a lone overflowing pack rather than truncating them.

    The engine owns the plan shape only: output is (id, chunk_idx,
    token_start, chunk_tokens) ranges; materializing the text slices is
    tokenizer-side work downstream. Pure Catalyst (sequence + explode),
    scan-stage, zero shuffle; a document at or under budget passes
    through as its single chunk 0, null/negative counts clamp to one
    empty chunk (nothing is ever dropped), and a null id raises — the
    same contract error :func:`pack_sequences` gives it (an
    unattributable range is useless to the tokenizer downstream)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    raw_id = F.col(id_col).cast("long")
    ident = F.when(
        raw_id.isNull(),
        F.raise_error(
            F.lit(
                "chunk_documents: null id — ranges must be attributable"
            )
        ).cast("long"),
    ).otherwise(raw_id)
    n = F.least(
        F.greatest(
            F.coalesce(F.col(token_col).cast("long"), F.lit(0)), F.lit(0)
        ),
        F.lit(_MAX_DOC_TOKENS),
    )
    n_chunks = F.greatest(F.ceil(n / F.lit(budget)), F.lit(1)).cast("long")
    return df.select(
        ident.alias("id"),
        n.alias("_n"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        ).alias("chunk_idx"),
    ).select(
        "id",
        "chunk_idx",
        (F.col("chunk_idx") * budget).alias("token_start"),
        F.least(
            F.lit(budget).cast("long"),
            F.col("_n") - F.col("chunk_idx") * budget,
        ).alias("chunk_tokens"),
    )


CHUNK_PACK_SCHEMA = (
    "id long, chunk_idx bigint, n_tokens long, pack_id long, pack_slot int, "
    "token_offset long"
)


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """:func:`pack_sequences` over (id, chunk_idx, chunk_tokens) CHUNK
    rows: greedy next-fit in (id, chunk_idx) order per partition, so a
    document's chunks stay adjacent and pack in document order. Because
    :func:`chunk_documents` caps every chunk at ``budget``, **every pack
    is ≤ budget** — the lone-oversized-pack escape hatch of
    :func:`pack_sequences` is structurally unreachable here (pinned in
    ``tests/test_packing.py``). Same hygiene contract: null id raises;
    null/negative chunk_tokens pack as 0; retries are deterministic
    (the sort key (id, chunk_idx, n_tokens) is total for the well-formed
    case of unique (id, chunk_idx))."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    narrow = chunks.select(
        F.col("id").cast("long").alias("id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.greatest(
            F.coalesce(F.col("chunk_tokens").cast("long"), F.lit(0)), F.lit(0)
        ).alias("n_tokens"),
    )
    if num_partitions is not None:
        narrow = narrow.repartition(num_partitions, "id")
    narrow = narrow.sortWithinPartitions("id", "chunk_idx", "n_tokens").select(
        F.spark_partition_id().alias("_pid"), "id", "chunk_idx", "n_tokens"
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pack_idx, used, slot = -1, 0, 0
        base = None
        for pdf in batches:
            rows = []
            for pid, doc_id, cidx, n in zip(
                pdf["_pid"], pdf["id"], pdf["chunk_idx"], pdf["n_tokens"]
            ):
                if pd.isna(doc_id):
                    raise ValueError(
                        "pack_chunks: null id — the id column is the "
                        "pack ordering key and must be non-null"
                    )
                if base is None:
                    base = int(pid) * _PART_STRIDE
                n = int(n)
                if pack_idx < 0 or used + n > budget:
                    pack_idx += 1
                    used, slot = 0, 0
                rows.append(
                    (int(doc_id), int(cidx), n, base + pack_idx, slot, used)
                )
                used += n
                slot += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "chunk_idx", "n_tokens", "pack_id", "pack_slot",
                    "token_offset",
                ],
            )

    return narrow.mapInPandas(pack, CHUNK_PACK_SCHEMA)


def chunk_and_pack(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """The end-to-end pretraining shape: split over-budget documents
    into ≤-budget token ranges (:func:`chunk_documents`), then pack the
    chunks greedily (:func:`pack_chunks`) — EVERY pack fits the context
    window, and token coverage is lossless (sum of a document's
    chunk_tokens = its clamped token count; both pinned in
    ``tests/test_packing.py``). Output: (id, chunk_idx, token_start,
    chunk_tokens, pack_id, pack_slot) — the tokenizer-side concatenator
    downstream consumes pack order and slices text by token range.

    Plan shape: chunking is scan-stage Catalyst (sequence + explode,
    zero shuffle); packing is one ``mapInPandas`` pass per partition —
    the whole composition adds NO shuffle beyond the optional
    repartition."""
    chunks = chunk_documents(df, id_col, token_col, budget)
    packed = pack_chunks(chunks, budget, num_partitions)
    # re-attach token_start (a pure function of chunk_idx × budget — no
    # join back to the chunk set needed)
    return packed.select(
        "id",
        "chunk_idx",
        (F.col("chunk_idx") * budget).alias("token_start"),
        F.col("n_tokens").alias("chunk_tokens"),
        "pack_id",
        "pack_slot",
        "token_offset",
    )
