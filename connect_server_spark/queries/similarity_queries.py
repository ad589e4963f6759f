"""Driver queries for embedding similarity search over the ``embeddings``
fixture (64-dim float vectors).

``similarity_topk_exact`` is the oracle-gated correctness baseline: every
50th vector probes the corpus, cosine computed as an explicit double fold
and rounded before ranking (cross-engine stable). ``similarity_topk_ann``
is the scale path (SRP-LSH buckets); its recall is probabilistic so it is
registered rows-only and pinned by pytest instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.operators.similarity import ann_lsh_topk, cosine_topk
from connect_server_spark.queries._fixtures import (
    cache_root,
    fixture_ready,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table, spread_scan

_K = 5


def _probes(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )


def similarity_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return cosine_topk(_probes(emb), emb, _K).select(
        "probe_id", "vec_id", "cosine", "rank"
    )


register(
    "similarity_topk_exact",
    similarity_topk_exact,
    sql=f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding AS pv
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    scored AS (
      SELECT
        p.probe_id,
        e.vec_id,
        round(
          list_sum(list_transform(range(1, len(p.pv) + 1),
            i -> CAST(p.pv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(p.pv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
          6) AS cosine
      FROM embeddings e CROSS JOIN probes p
    )
    SELECT probe_id, vec_id, cosine, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY probe_id ORDER BY cosine DESC, vec_id ASC
      ) AS rank
      FROM scored
    ) WHERE rank <= {_K}
    """,
)


def similarity_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH bucketed ANN (rows-only: recall is probabilistic; the exact
    twin above is the gated baseline)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return ann_lsh_topk(_probes(emb), emb, _K, tables=8, bits=10).select(
        "probe_id", "vec_id", "cosine", "rank"
    )


register("similarity_topk_ann", similarity_topk_ann, defer=True)


def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat bucketed ANN (rows-only: recall is probabilistic; the
    exact twin above is the gated baseline)."""
    from connect_server_spark.operators.similarity import ivf_topk

    emb = load_table(spark, "embeddings", sf_dir)
    return ivf_topk(_probes(emb), emb, _K, nlist=16, nprobe=4).select(
        "probe_id", "vec_id", "cosine", "rank"
    )


register("similarity_topk_ivf", similarity_topk_ivf, defer=True)

def _ivf_index_for(
    spark: SparkSession, sf_dir: str, quantize=False
) -> str:
    """Build-once path of the persisted IVF index for this dataset
    (content-keyed cache: path+mtime+size — see the dedup_queries twin).
    Shared by the serving query and the indexed mining query so bench's
    warm-up pays the corpus assignment pass exactly once.

    ``nlist`` is sized for a FIXED TARGET CELL SIZE (~256 vectors, floor
    16 cells), the standard IVF sizing rule: with fixed nprobe a probe
    reads O(nprobe · cell_size) candidates regardless of corpus size, so
    batch mining whose probe count grows with the corpus stays LINEAR in
    total work — a fixed nlist would let cells grow with N and send
    probes × cell_size quadratic (measured: the fixed-nlist form was
    3.3× wall at 10× data; resized, the SCALE.md sweep is flat)."""
    import os

    from connect_server_spark.operators.similarity import write_ivf_index
    from connect_server_spark.tables import dataset_cache_key

    key = dataset_cache_key(sf_dir, "embeddings")
    variant = (
        ""
        if not quantize
        else ("sq8_" if quantize is True else f"{quantize}_")
    )
    family = f"connect_server_spark_ivf_index_{variant}v2"
    index_path = f"{cache_root(spark, family)}/{key}"
    if not fixture_ready(spark, f"{index_path}/cells/_SUCCESS"):
        emb = load_table(spark, "embeddings", sf_dir)
        nlist = max(16, emb.count() // 256)
        write_ivf_index(emb, index_path, nlist=nlist, quantize=quantize)
    return index_path


def similarity_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN SERVING fast path: same probes as ``similarity_topk_ivf``
    but against a pre-built persisted IVF index (trained + assigned once,
    cached per scale factor under /tmp; bench's warm-up pass pays the
    build). Per query only the probes are assigned; the cell-partitioned
    store prunes to the probed cells. Rows-only; identity to the
    in-memory path with the same centroids is pinned in
    ``tests/test_similarity.py``."""
    from connect_server_spark.operators.similarity import ivf_topk_indexed

    index_path = _ivf_index_for(spark, sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    return ivf_topk_indexed(
        _probes(emb), spark, index_path, _K, nprobe=4
    ).select("probe_id", "vec_id", "cosine", "rank")


register("similarity_topk_ivf_indexed", similarity_topk_ivf_indexed, defer=True)


def similarity_topk_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUANTIZED serving path: same probes against an SQ8 cell store
    (``write_ivf_index(quantize=True)`` — per-vector int8, ~4× less
    index storage and scan I/O; the dominant cost at 100 TB is reading
    the probed cells, so SQ8 cuts serving I/O 4× for ~1e-3 cosine
    error). Dequantization is scan-stage Catalyst; the plan is otherwise
    identical to ``similarity_topk_ivf_indexed``. Rows-only; recall and
    cosine-error bounds vs the float index are pinned in
    ``tests/test_similarity.py``."""
    from connect_server_spark.operators.similarity import ivf_topk_indexed

    index_path = _ivf_index_for(spark, sf_dir, quantize=True)
    emb = load_table(spark, "embeddings", sf_dir)
    return ivf_topk_indexed(
        _probes(emb), spark, index_path, _K, nprobe=4
    ).select("probe_id", "vec_id", "cosine", "rank")


register("similarity_topk_ivf_sq8", similarity_topk_ivf_sq8, defer=True)


def similarity_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCT-QUANTIZED serving path: same probes against a PQ
    cell store (``write_ivf_index(quantize="pq")`` — m=8 one-byte codes
    per 64-dim vector, ~32× less index storage and probed-cell scan I/O
    than float32, the FAISS-IVFPQ trade one step below SQ8's 4×).
    Reconstruction is an Arrow-batched codebook gather; scoring and
    ranking are plan-identical to ``similarity_topk_ivf_indexed``.
    Rows-only; recall and reconstruction-error bounds vs the float
    index, the storage cut, and the rebalance codebook carry are pinned
    in ``tests/test_similarity.py``."""
    from connect_server_spark.operators.similarity import ivf_topk_indexed

    index_path = _ivf_index_for(spark, sf_dir, quantize="pq")
    emb = load_table(spark, "embeddings", sf_dir)
    return ivf_topk_indexed(
        _probes(emb), spark, index_path, _K, nprobe=4
    ).select("probe_id", "vec_id", "cosine", "rank")


register("similarity_topk_ivf_pq", similarity_topk_ivf_pq, defer=True)


def similarity_topk_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed IVFPQ+refine SERVING deployment (r10 verdict ask
    #4): PQ codes generate ``refine_mult × k`` candidates per probe
    (32× less candidate-scan I/O), the SQ8 store re-ranks exactly those
    candidates, top-k by refined cosine. This is the operational answer
    to the measured PQ recall plateau — bare PQ ranking is
    reconstruction-bound (~0.31–0.38 recall@5 at any nprobe) while this
    composition recovers SQ8-grade recall at PQ-grade candidate cost.
    Both fixture stores train the same deterministic coarse quantizer
    (seed-fixed k-means over the same corpus), which the operator
    verifies by exact centroid comparison. Rows-only; recall@5 ≥ the
    SQ8 path at equal nprobe is pinned in ``tests/test_similarity.py``."""
    from connect_server_spark.operators.similarity import pq_refine_topk

    pq_path = _ivf_index_for(spark, sf_dir, quantize="pq")
    sq8_path = _ivf_index_for(spark, sf_dir, quantize=True)
    emb = load_table(spark, "embeddings", sf_dir)
    return pq_refine_topk(
        _probes(emb), spark, pq_path, sq8_path, _K, nprobe=4, refine_mult=8
    ).select("probe_id", "vec_id", "cosine", "rank")


register("similarity_topk_pq_refine", similarity_topk_pq_refine, defer=True)


def embeddings_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization fidelity report over the embedding table:
    per-vector scale, the quantized payload, and the cosine between the
    original and its dequantized reconstruction — the 4x-storage serving
    trade, measured in-plan (scan-stage, zero shuffle)."""
    from connect_server_spark.operators.embeddings import (
        cosine,
        dequantize_int8,
        quantize_int8,
    )

    # quantize/dequantize/cosine are CPU-dense array expressions: spread
    # the one-split local scan (r12, guide §2.5; measured 1.7× at sf0.1)
    emb = spread_scan(load_table(spark, "embeddings", sf_dir))
    packed = quantize_int8(F.col("embedding"))
    staged = emb.select("vec_id", "embedding", packed.alias("_p"))
    return staged.select(
        "vec_id",
        F.round(F.col("_p.scale"), 6).alias("scale"),
        F.col("_p.q").cast("array<int>").alias("q"),
        F.round(
            cosine(F.col("embedding"), dequantize_int8(F.col("_p"))), 4
        ).alias("cosine_fidelity"),
    )


register("embeddings_quantize", embeddings_quantize, defer=True)


def _mining_probes(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("label").alias("probe_label"),
    )


def mining_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining, EXACT-searcher baseline: for each probe
    vector, the 8 most-similar corpus vectors with a DIFFERENT label
    (near-duplicates above cosine 0.95 excluded as false-negative
    risks). The exact searcher is quadratic (probes × corpus) — this
    query exists as the correctness oracle for the indexed form below
    (same pattern as ``similarity_topk_exact``); a 100 TB run uses
    ``mining_hard_negatives_indexed``."""
    from connect_server_spark.operators.similarity import hard_negatives

    emb = load_table(spark, "embeddings", sf_dir)
    return hard_negatives(
        _mining_probes(emb), emb, k=8, candidate_k=40, max_sim=0.95
    )


register("mining_hard_negatives", mining_hard_negatives, defer=True)


def mining_hard_negatives_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining, the REGISTERED scale form: candidates come
    from the persisted IVF index (:func:`ivf_topk_indexed` — probe-side
    assignment only, cell-pruned store scan), so mining cost tracks
    probes × nprobe/nlist instead of probes × corpus. Everything after
    candidate generation is candidate-sized, identical to the exact
    twin. Rows-only (ANN recall is probabilistic); pinned in
    ``tests/test_similarity.py``: output ≡ the exact searcher at
    ``nprobe = nlist`` on the fixture, and SCALE.md carries the
    flat 3-decade sweep."""
    from connect_server_spark.operators.similarity import (
        hard_negatives,
        ivf_topk_indexed,
    )

    index_path = _ivf_index_for(spark, sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    def searcher(p: DataFrame, _corpus: DataFrame, kk: int) -> DataFrame:
        return ivf_topk_indexed(p, spark, index_path, kk, nprobe=4)

    return hard_negatives(
        _mining_probes(emb), emb, k=8, candidate_k=40, max_sim=0.95,
        searcher=searcher,
    )


register("mining_hard_negatives_indexed", mining_hard_negatives_indexed, defer=True)


def similarity_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance telemetry for the persisted IVF index: per-cell
    counts + skew vs the mean cell size — the signal that schedules a
    quantizer re-train when appended data drifts into hot cells (probe
    latency is O(nprobe · cell_size)). One narrow (cell, count) agg;
    vectors never leave the scan. Rows-only; count/skew semantics and
    the empty-cell report are pinned in ``tests/test_similarity.py``."""
    from connect_server_spark.operators.similarity import ivf_cell_stats

    return ivf_cell_stats(spark, _ivf_index_for(spark, sf_dir))


register("similarity_index_stats", similarity_index_stats, defer=True)
