"""Embedding-representation operators: int8 quantization.

At 100 TB the embedding column IS the storage bill (a 768-dim float32
vector is 3 KB/row); symmetric int8 quantization cuts it 4× with ~1e-3
cosine error — the standard serving trade (FAISS ``SQ8``). Implemented
as pure Catalyst array expressions (``transform``/``aggregate``), so
quantization happens scan-stage at write or read with no Python
boundary; the quantized form is a ``(scale, array<tinyint>)`` struct
and dequantization is one multiply.

Contract: symmetric per-vector scaling ``scale = amax / 127`` (zero
vectors quantize to scale 0 and dequantize to exact zeros), values
round half-up and land in [-127, 127] by construction. Rounding error
per component is ≤ scale/2; pytest pins the bound, the cosine fidelity
on real embeddings, and top-k ranking preservation against the exact
float path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["quantize_int8", "dequantize_int8", "cosine"]


def quantize_int8(vec: Column) -> Column:
    """Float vector → ``struct(scale: float, q: array<tinyint>)``."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).cast("float")
    q = F.transform(
        vec,
        lambda x: F.when(scale == 0, F.lit(0))
        .otherwise(F.round(x / scale, 0).cast("int"))
        .cast("tinyint"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(packed: Column) -> Column:
    """``struct(scale, q)`` → ``array<float>`` (exact zeros for scale 0)."""
    return F.transform(
        packed["q"],
        lambda x: (x.cast("float") * packed["scale"]).cast("float"),
    )


def cosine(a: Column, b: Column) -> Column:
    """Scan-stage cosine over two float arrays — delegates to the
    similarity module's canonical fold (its order is part of the
    cross-engine contract; a second copy risks last-ulp divergence from
    the DuckDB mirrors), with a zero-vector-safe denominator clamp."""
    from connect_server_spark.operators.similarity import dot_product, l2_norm

    return dot_product(a, b) / F.greatest(
        l2_norm(a) * l2_norm(b), F.lit(1e-12)
    )
