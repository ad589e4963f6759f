"""Multimodal-column plumbing: opaque binary payloads with typed metadata,
decoded / feature-extracted through Arrow-batched ``mapInPandas``.

Images/audio/video are carried as ``binary`` columns plus a metadata
struct (mime, byte length, digest). The *decode* step is a clearly-marked
stub (``NotImplementedError`` when a real codec is demanded — the image/
audio libraries are not in this environment); everything around it — the
schema contract, partition-preserving mapInPandas, Arrow batch shape,
deterministic fallback features — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary",
    "binary_metadata",
    "extract_binary_features",
    "decode_image",
]

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, byte_entropy_milli int, head_hex string"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Carrier for the binary contract: payload column + metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        binary_metadata(payload, mime).alias("meta"),
    )


def binary_metadata(payload: Column, mime: str) -> Column:
    return F.struct(
        F.lit(mime).alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: decode an image payload to pixels. The container has no image
    codec; a deployment wires Pillow/libvips here. The Spark-side contract
    (binary in, array out via mapInPandas) is what the engine owns."""
    raise NotImplementedError(
        "image decode requires an image codec; not available in this environment"
    )


def extract_binary_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Computes deterministic per-payload features (byte count, Shannon byte
    entropy in milli-nats, first-4-bytes hex) in pandas — the stand-in for
    a decode→featurize stage. Partition-preserving: ``mapInPandas`` keeps
    data local, no shuffle."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n:
                    counts: dict[int, int] = {}
                    for byte in b:
                        counts[byte] = counts.get(byte, 0) + 1
                    ent = -sum(
                        (c / n) * math.log(c / n) for c in counts.values()
                    )
                else:
                    ent = 0.0
                rows.append(
                    (doc_id, n, int(round(ent * 1000)), b[:4].hex())
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_bytes", "byte_entropy_milli", "head_hex"]
            )

    return df.select(id_col, "payload").mapInPandas(features, FEATURE_SCHEMA)
