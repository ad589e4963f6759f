"""Compressed-text ingestion: the crawl-dump path (WET/WARC-style
corpora ship as gzip members; mirrors and archives use bzip2/xz).

The three codecs whose algorithms the Python stdlib carries — gzip/zlib
(DEFLATE), bzip2, and xz/LZMA — are decoded for REAL; codecs needing a
library this environment lacks (zstd, lz4, brotli) raise a
clearly-marked ``NotImplementedError``, the same honest boundary as the
multimodal JPEG contract (``operators/multimodal.py``).

Scale shape: codec detection is pure scan-stage Catalyst (a magic-byte
prefix compare — no Python touches payloads that only need routing);
the decode itself is one partition-preserving Arrow-batched
``mapInPandas`` — payloads never shuffle, decompression parallelizes
per input split exactly like the scan, and downstream text operators
(quality gates, dedup, tokenization) compose onto the decoded column in
the same plan. Corrupt members follow the readers' reject-path
convention (``sources/readers.py``): an error row, never a task
failure — one truncated member in a 100 TB crawl must not kill the
job. Decoded size per member is bounded by ``max_bytes`` (decompression
bombs are a data hazard, not an operator bug).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sniff_codec",
    "compress_text",
    "decompress_text",
]

# magic prefixes, longest-match-first where prefixes overlap
_MAGICS = (
    ("xz", b"\xfd7zXZ\x00"),
    ("gzip", b"\x1f\x8b"),
    ("bzip2", b"BZh"),
    ("zstd", b"\x28\xb5\x2f\xfd"),
    ("lz4", b"\x04\x22\x4d\x18"),
)

_STDLIB_CODECS = ("gzip", "bzip2", "xz")


def sniff_codec(payload: Column) -> Column:
    """Codec detection as a scan-stage expression: compare the payload's
    magic-byte prefix, JVM-side — routing/partitioning by codec never
    pays a Python boundary. Unknown magics map to 'raw' (the member is
    treated as uncompressed text)."""
    out = F.lit("raw")
    for name, magic in reversed(_MAGICS):
        hexed = magic.hex()
        out = F.when(
            F.hex(F.substring(payload, 1, len(magic))) == hexed.upper(),
            F.lit(name),
        ).otherwise(out)
    return out


def _bounded_decompress(new_decompressor, data: bytes, max_bytes: int, zlib_tail: bool) -> bytes:
    """Streamed decode with the output bound enforced DURING
    decompression: a bomb must abort at ``max_bytes``, never after the
    one-shot helper has already materialized the full expansion in the
    Python worker. Handles concatenated members like the stdlib
    one-shots do. ``zlib_tail`` selects zlib's re-feed-the-tail protocol
    (bz2/lzma buffer unconsumed input internally and take ``b""``)."""
    out = bytearray()
    while True:
        d = new_decompressor()
        tail = data
        while not d.eof:
            budget = max_bytes + 1 - len(out)
            if budget <= 0:
                raise ValueError(
                    f"decoded member exceeds max_bytes={max_bytes}"
                )
            chunk = d.decompress(tail, budget)
            out += chunk
            if zlib_tail:
                tail = d.unconsumed_tail
                pending = bool(tail)
            else:
                tail = b""
                pending = not d.needs_input
            if not chunk and not pending and not d.eof:
                raise ValueError("stream truncated before end-of-stream marker")
        data = d.unused_data
        if not data:
            break
    if len(out) > max_bytes:
        raise ValueError(
            f"decoded member is {len(out)} bytes > max_bytes={max_bytes}"
        )
    return bytes(out)


def _decompress_one(b: bytes, codec: str, max_bytes: int) -> str:
    import bz2
    import lzma
    import zlib

    if codec == "gzip":
        # wbits=31: zlib with gzip header/trailer — same format
        # gzip.decompress reads, but incrementally boundable
        raw = _bounded_decompress(
            lambda: zlib.decompressobj(31), b, max_bytes, zlib_tail=True
        )
    elif codec == "bzip2":
        raw = _bounded_decompress(bz2.BZ2Decompressor, b, max_bytes, zlib_tail=False)
    elif codec == "xz":
        raw = _bounded_decompress(lzma.LZMADecompressor, b, max_bytes, zlib_tail=False)
    elif codec == "raw":
        raw = b
        if len(raw) > max_bytes:
            raise ValueError(
                f"decoded member is {len(raw)} bytes > max_bytes={max_bytes}"
            )
    else:
        raise NotImplementedError(
            f"codec {codec!r} needs a library this environment lacks "
            "(zstd/lz4/brotli); a deployment wires it behind the same "
            "bytes-in / text-out contract"
        )
    return raw.decode("utf-8", errors="replace")


def compress_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    codec_of_id=None,
) -> DataFrame:
    """Encode text as REAL compressed payloads — the fixture twin of
    :func:`decompress_text` (round-trip tests and the registered drill
    synthesize their crawl shards with it). ``codec_of_id`` maps an id
    to 'gzip' | 'bzip2' | 'xz' (default: cycle all three by ``id % 3``).
    Output: (id, payload binary)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bz2
        import gzip
        import lzma

        encoders = {
            "gzip": lambda raw: gzip.compress(raw, mtime=0),
            "bzip2": bz2.compress,
            "xz": lzma.compress,
        }
        pick = codec_of_id or (lambda i: _STDLIB_CODECS[int(i) % 3])
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                codec = pick(doc_id)
                rows.append(
                    (doc_id, encoders[codec](str(text).encode("utf-8")))
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return df.select(id_col, text_col).mapInPandas(
        encode, f"{id_col} long, payload binary"
    )


def decompress_text(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Decode compressed text members to rows of
    ``(id, codec, text, error)``.

    REAL for gzip/bzip2/xz (stdlib algorithms); 'raw' passes through;
    zstd/lz4 surface as error rows carrying the NotImplementedError
    message (the reject-path convention — a mixed-codec crawl decodes
    what it can and reports the rest as data). Corrupt/truncated
    members likewise become error rows, never task failures. One
    partition-preserving ``mapInPandas``; payloads never shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((doc_id, None, None, "null payload"))
                    continue
                b = bytes(payload)
                codec = "raw"
                for name, magic in _MAGICS:
                    if b[: len(magic)] == magic:
                        codec = name
                        break
                try:
                    rows.append(
                        (doc_id, codec, _decompress_one(b, codec, max_bytes), None)
                    )
                except NotImplementedError as exc:
                    rows.append((doc_id, codec, None, str(exc)))
                except Exception as exc:
                    rows.append(
                        (doc_id, codec, None, f"corrupt {codec} member: {exc}")
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "codec", "text", "error"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode, f"{id_col} long, codec string, text string, error string"
    )
