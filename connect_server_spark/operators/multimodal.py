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
    "resize_binary",
    "sample_frames",
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


RESIZE_SCHEMA = (
    "doc_id long, src_bytes int, thumb_bytes int, stride int, thumb_digest string"
)


def resize_binary(df: DataFrame, id_col: str = "doc_id", stride: int = 4) -> DataFrame:
    """Image-resize plumbing: Arrow-batched ``mapInPandas`` that maps each
    payload to a strided downsample (every ``stride``-th byte) — the
    deterministic stand-in for decode→resize→re-encode. A deployment
    replaces the body's downsample with :func:`decode_image` + a real
    resampler; the engine-owned part (binary in → smaller binary out,
    partition-preserving, no shuffle) is what this exercises."""
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                thumb = b[::stride]
                rows.append(
                    (doc_id, len(b), len(thumb), stride,
                     hashlib.md5(thumb).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "src_bytes", "thumb_bytes", "stride",
                         "thumb_digest"],
            )

    return df.select(id_col, "payload").mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_digest string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    n_frames: int = 8,
    every: int = 2,
) -> DataFrame:
    """Video frame-sampling plumbing: the payload is treated as
    ``n_frames`` equal-length frames; every ``every``-th frame is emitted
    as its own row (1 input row → N output rows — the UDTF shape).
    Deterministic: the frame digest is md5 of the byte slice, so the
    whole pipeline is oracle-checkable; a deployment swaps the slicing
    for a real demuxer behind the same (id, frame_idx, bytes) contract."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                flen = len(b) // n_frames
                if flen == 0:
                    continue
                for i in range(0, n_frames, every):
                    chunk = b[i * flen:(i + 1) * flen]
                    rows.append(
                        (doc_id, i, len(chunk), hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_idx", "frame_bytes", "frame_digest"],
            )

    return df.select(id_col, "payload").mapInPandas(frames, FRAME_SCHEMA)
