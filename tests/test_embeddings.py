"""Int8 embedding quantization: error bounds, fidelity, ranking
preservation, and the DuckDB mirror for the rows-only driver query."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_server_spark.operators.embeddings import (
    cosine,
    dequantize_int8,
    quantize_int8,
)
from connect_server_spark.queries.similarity_queries import (
    embeddings_quantize,
)
from connect_server_spark.tables import load_table


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    """Per-component reconstruction error ≤ scale/2 + float slack, and
    every quantized value sits in [-127, 127]."""
    emb = load_table(spark, "embeddings", sf_dir)
    packed = quantize_int8(F.col("embedding"))
    rows = (
        emb.select(
            "embedding",
            packed.alias("p"),
            dequantize_int8(packed).alias("deq"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        scale = r.p.scale
        assert all(-127 <= q <= 127 for q in r.p.q)
        for orig, back in zip(r.embedding, r.deq):
            assert abs(orig - back) <= scale / 2 + 1e-6


def test_quantize_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [Row(v=[0.0, 0.0, 0.0])], "v array<float>"
    )
    [r] = df.select(
        quantize_int8(F.col("v")).alias("p"),
        dequantize_int8(quantize_int8(F.col("v"))).alias("deq"),
    ).collect()
    assert r.p.scale == 0.0
    assert list(r.p.q) == [0, 0, 0]
    assert list(r.deq) == [0.0, 0.0, 0.0]


def test_quantize_cosine_fidelity(spark, sf_dir):
    out = embeddings_quantize(spark, sf_dir)
    lo = out.agg(F.min("cosine_fidelity")).first()[0]
    assert lo >= 0.999


def test_quantized_topk_preserves_ranking(spark, sf_dir):
    """Brute-force top-10 by cosine against one probe, float vs
    dequantized-int8: recall ≥ 0.9 (the SQ8 serving trade)."""
    emb = load_table(spark, "embeddings", sf_dir).limit(400)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    V = np.array([r.embedding for r in rows], dtype=np.float64)

    deq = {
        r.vec_id: np.array(r.deq, dtype=np.float64)
        for r in emb.select(
            "vec_id", dequantize_int8(quantize_int8(F.col("embedding"))).alias("deq")
        ).collect()
    }
    Q = np.array([deq[i] for i in ids])

    probe = V[0]

    def topk(M):
        sims = (M @ probe) / (
            np.linalg.norm(M, axis=1) * np.linalg.norm(probe) + 1e-12
        )
        return [ids[i] for i in np.argsort(-sims)[:10]]

    exact, quant = set(topk(V)), set(topk(Q))
    assert len(exact & quant) >= 9


def test_quantize_plan_scan_stage(spark, sf_dir):
    """Quantize/dequantize/cosine stay scan-stage: the only Exchange
    allowed is the conditional round-robin spread of the one-split
    local scan (spread_scan, r12) — never a hash/range shuffle, never
    a Python node."""
    plan = (
        embeddings_quantize(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "ReusedExchange" not in ln
    ]
    assert len(exchanges) <= 1
    assert all("RoundRobinPartitioning" in ln for ln in exchanges)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_embeddings_quantize_matches_duckdb_mirror(spark, sf_dir):
    """Scale and quantized payload recomputed in DuckDB (divisions
    forced to DOUBLE on both engines; fidelity column checked for
    hash-stability separately since list_reduce float sums differ in
    the last ulp)."""
    got = sorted(
        (r.vec_id, r.scale, tuple(r.q))
        for r in embeddings_quantize(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(
        (vid, s, tuple(q))
        for (vid, s, q) in con.execute("""
        WITH m AS (
          SELECT vec_id, embedding,
                 CAST(list_max(list_transform(embedding, x -> abs(x)))
                      / 127.0 AS FLOAT) AS scale
          FROM embeddings
        )
        SELECT vec_id,
               round(scale, 6) AS scale,
               CASE WHEN scale = 0
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE)
                                      / CAST(scale AS DOUBLE), 0) AS INT))
               END AS q
        FROM m
        """).fetchall()
    )
    assert len(got) > 0
    assert got == want
