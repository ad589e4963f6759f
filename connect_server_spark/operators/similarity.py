"""Embedding similarity-search operators: exact cosine top-k and
LSH-bucketed approximate nearest neighbors.

Scale design:

* **Exact top-k** broadcasts the (small) probe set against the corpus —
  the corpus side never shuffles to score; only (probe_id, vec_id, sim)
  triples enter the rank shuffle, never vectors. Exact search is the
  correctness baseline; at 100 TB you run the ANN path.
* **ANN** uses sign-random-projection LSH: ``tables × bits`` hyperplanes
  with deterministic ±1 entries derived from ``xxhash64(table, bit,
  dim)``, so signatures are reproducible with no stored model. Probes
  equi-join the corpus on (table, signature) — hash join, candidates
  only, never corpus × probes.
* Similarities are computed as an explicit left-fold in double precision
  and **rounded before ranking** so the top-k set is stable across
  engines (1-ulp float drift otherwise flips boundary ranks); ties break
  on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from connect_server_spark.functions.expr import let_col

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "cosine_topk",
    "srp_signatures",
    "ann_lsh_topk",
]

_ROUND = 6


def dot_product(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (the fold
    order is part of the cross-engine contract)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return F.round(dot_product(a, b) / (l2_norm(a) * l2_norm(b)), _ROUND)


def cosine_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: every probe scored against every corpus vector
    (broadcast probes — the corpus partition never moves), then ranked.

    Returns (probe_id, vec_id, cosine, rank) with rank 1..k, ties broken
    by vec_id ascending.
    """
    scored = corpus.crossJoin(broadcast(probes)).select(
        F.col(probe_id),
        F.col(corpus_id),
        cosine_similarity(F.col(probe_vec), F.col(corpus_vec)).alias("cosine"),
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _rademacher(table: int, bit: int, dim: Column) -> Column:
    """Deterministic ±1 hyperplane entry for (table, bit, dim)."""
    return F.when(
        F.xxhash64(F.lit(table), F.lit(bit), dim) % 2 == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def srp_signatures(vec: Column, tables: int = 4, bits: int = 12) -> Column:
    """Sign-random-projection signatures: array of ``tables`` integer
    bucket keys, each from ``bits`` hyperplane sign bits. Pure per-row
    expression (no model, no shuffle).

    The vector is let-bound; each of tables×bits projections references it
    once as a cheap lambda variable."""

    def weighted(t: int, b: int):
        # two-arg lambda factory (defaults would change the lambda's arity
        # and misbind PySpark's higher-order-function arguments)
        return lambda x, i: x.cast("double") * _rademacher(t, b, i)

    def build(v: Column) -> Column:
        def signature(t: int) -> Column:
            out = F.lit(0).cast("long")
            for b in range(bits):
                proj = F.aggregate(
                    F.zip_with(v, F.sequence(F.lit(0), F.size(v) - 1), weighted(t, b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                out = out + (proj > 0).cast("long") * F.lit(2 ** b).cast("long")
            return out

        return F.array(*[signature(t) for t in range(tables)])

    return let_col(vec, build)


def ann_lsh_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    tables: int = 4,
    bits: int = 12,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probes and corpus bucketed by SRP signature,
    candidates = bucket collisions in any table (equi-join), exact cosine
    over candidates only, then rank. Recall < 1 by construction; raise
    ``tables``/lower ``bits`` to trade cost for recall."""
    c_buckets = corpus.select(
        F.col(corpus_id),
        F.col(corpus_vec),
        F.posexplode(srp_signatures(F.col(corpus_vec), tables, bits)).alias(
            "_table", "_sig"
        ),
    )
    p_buckets = probes.select(
        F.col(probe_id),
        F.col(probe_vec),
        F.posexplode(srp_signatures(F.col(probe_vec), tables, bits)).alias(
            "_table", "_sig"
        ),
    )
    cands = (
        c_buckets.join(broadcast(p_buckets), ["_table", "_sig"])
        .select(probe_id, corpus_id, probe_vec, corpus_vec)
        .dropDuplicates([probe_id, corpus_id])
    )
    scored = cands.select(
        F.col(probe_id),
        F.col(corpus_id),
        cosine_similarity(F.col(probe_vec), F.col(corpus_vec)).alias("cosine"),
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
