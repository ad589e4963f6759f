"""WARC ingestion: the Common Crawl container format, parsed for REAL.

A 100 TB pretraining corpus starts life as ``.warc.gz`` — WARC/1.0
records (ISO 28500), each its own gzip member, members concatenated
into shard files. This module carries the full front end of that
pipeline with stdlib only:

* :func:`synthesize_warc` — the fixture twin (like
  ``compressed.compress_text`` / ``multimodal.synthesize_gif_payloads``):
  real multi-record WARC shards built from a text corpus, each record a
  proper ``WARC-Type: response`` with HTTP headers and an HTML-wrapped
  body, one gzip member per record (the Common Crawl layout) or plain
  concatenated records.
* :func:`parse_warc_records` — the REAL parser: walks gzip members /
  raw streams record by record (``Content-Length`` framing), splits the
  HTTP envelope, and emits one row per record. A malformed record
  becomes an error ROW and parsing resyncs on the next ``WARC/1.0``
  magic — one broken record in a crawl shard must not kill the task or
  drop the rest of the shard (the readers' reject-path convention).
* :func:`html_to_text` — stdlib ``html.parser`` extraction: drops
  ``script``/``style``, decodes entities, collapses whitespace — the
  first transform every crawl pipeline applies before quality gates.

Scale shape: shard payloads are opaque binary columns; parsing and
extraction are partition-preserving Arrow stages (``mapInPandas`` /
pandas UDF) — payloads never shuffle, shards parallelize per input
split, and the emitted text column composes with the text operators
(gates, dedup, tokenize) in the same plan. Record payloads are bounded
by ``max_bytes`` per record like the compressed reader's members.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "synthesize_warc",
    "parse_warc_records",
    "html_to_text",
]

_CRLF = b"\r\n"
_MAGIC = b"WARC/1.0\r\n"


def _build_record(uri: str, date: str, rec_id: str, body: bytes) -> bytes:
    """One WARC/1.0 response record (headers + HTTP envelope + body)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + _CRLF
        + body
    )
    headers = (
        _MAGIC
        + b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + b"Content-Type: application/http;msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def synthesize_warc(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str = "shard",
    gzip_members: bool = True,
    domain_col: str | None = None,
) -> DataFrame:
    """Build real multi-record WARC shard payloads from a text corpus —
    the drill/fixture twin of :func:`parse_warc_records`.

    Documents grouped by ``shard_col`` become one shard payload each:
    records ordered by id (deterministic bytes), body =
    ``<html>…<p>text</p>…</html>`` with a planted ``<script>`` block the
    extractor must drop, one gzip member per record when
    ``gzip_members`` (the Common Crawl ``.warc.gz`` layout — members
    independently decodable, so a reader can split a shard WITHOUT
    decompressing it). Returns ``(shard, payload binary, n_records)``.
    Pass ``domain_col`` to vary the record URIs per document
    (``https://<domain>/doc/<id>``) so downstream URL curation has real
    domain structure; default is the single ``corpus.example`` host.

    Drill-only scale note: the groupBy is the synthesis fixture's cost,
    not the ingest path's — production shards arrive as files.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import gzip
        import html as _html

        pdf = pdf.sort_values(id_col)
        parts = []
        domains = (
            pdf[domain_col] if domain_col else ["corpus.example"] * len(pdf)
        )
        for doc_id, text, dom in zip(pdf[id_col], pdf[text_col], domains):
            # escape: text containing & < > must round-trip through the
            # extractor's entity decode; NULL text embeds as empty
            body = (
                "<html><head><title>doc {i}</title>"
                "<script>var tracking = 'drop me';</script>"
                "<style>p {{ color: black }}</style></head>"
                "<body><p>{t}</p></body></html>"
            ).format(
                i=doc_id,
                t=_html.escape("" if text is None else str(text)),
            ).encode("utf-8")
            rec = _build_record(
                uri=f"https://{dom}/doc/{doc_id}",
                date="2024-01-01T00:00:00Z",
                rec_id=f"00000000-0000-0000-0000-{int(doc_id):012d}",
                body=body,
            )
            parts.append(
                gzip.compress(rec, mtime=0) if gzip_members else rec
            )
        shard = pdf[shard_col].iloc[0]
        return pd.DataFrame(
            [(shard, b"".join(parts), len(parts))],
            columns=[shard_col, "payload", "n_records"],
        )

    cols = [shard_col, id_col, text_col] + ([domain_col] if domain_col else [])
    return (
        df.select(*cols)
        .groupBy(shard_col)
        .applyInPandas(build, f"{shard_col} long, payload binary, n_records long")
    )


def _split_members(data: bytes, max_bytes: int) -> Iterator[bytes]:
    """Yield the decompressed stream: per gzip member when the shard is
    member-compressed, else the raw bytes once. Bounded per member."""
    import zlib

    if data[:2] != b"\x1f\x8b":
        yield data
        return
    while data:
        d = zlib.decompressobj(31)
        out = bytearray()
        tail = data
        while not d.eof:
            chunk = d.decompress(tail, max_bytes + 1 - len(out))
            out += chunk
            if len(out) > max_bytes:
                raise ValueError(f"member exceeds max_bytes={max_bytes}")
            tail = d.unconsumed_tail
            if not chunk and not tail and not d.eof:
                raise ValueError("gzip member truncated")
        yield bytes(out)
        data = d.unused_data


def _parse_stream(stream: bytes) -> Iterator[tuple]:
    """(uri, date, http_status, content_type, body, error) per record;
    resyncs on the next WARC magic after a malformed record."""
    pos = 0
    n = len(stream)
    while pos < n:
        start = stream.find(_MAGIC, pos)
        if start < 0:
            if stream[pos:].strip():
                yield (None, None, None, None, None,
                       "trailing bytes with no WARC/1.0 magic")
            return
        hdr_end = stream.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            yield (None, None, None, None, None,
                   "record header never terminates")
            return
        headers: dict[str, str] = {}
        ok = True
        for line in stream[start + len(_MAGIC): hdr_end].split(_CRLF):
            if b":" not in line:
                ok = False
                break
            k, v = line.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
        length = headers.get("content-length", "")
        if not ok or not length.isdigit():
            yield (headers.get("warc-target-uri"), headers.get("warc-date"),
                   None, None, None, "malformed record headers")
            pos = start + len(_MAGIC)  # resync past this magic
            continue
        block_start = hdr_end + 4
        block_end = block_start + int(length)
        if block_end > n:
            yield (headers.get("warc-target-uri"), headers.get("warc-date"),
                   None, None, None,
                   f"record truncated: Content-Length {length} past shard end")
            return
        block = stream[block_start:block_end]
        status = content_type = None
        body = block
        if headers.get("content-type", "").startswith("application/http"):
            split = block.find(_CRLF + _CRLF)
            if split < 0:
                yield (headers.get("warc-target-uri"), headers.get("warc-date"),
                       None, None, None, "HTTP envelope never terminates")
                pos = block_end
                continue
            http_lines = block[:split].split(_CRLF)
            parts = http_lines[0].split(b" ")
            status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
            for line in http_lines[1:]:
                if line.lower().startswith(b"content-type:"):
                    content_type = (
                        line.split(b":", 1)[1].decode("utf-8", "replace").strip()
                    )
            body = block[split + 4:]
        yield (headers.get("warc-target-uri"), headers.get("warc-date"),
               status, content_type, bytes(body), None)
        pos = block_end


def parse_warc_records(
    df: DataFrame,
    shard_col: str = "shard",
    payload_col: str = "payload",
    max_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Parse WARC shard payloads to one row per record:
    ``(shard, record_idx, target_uri, warc_date, http_status,
    content_type, body binary, error)``.

    REAL parsing — gzip members (Common Crawl layout) or plain streams,
    ``Content-Length`` framing, HTTP envelope split. Malformed records
    become error ROWS and the parser resyncs at the next ``WARC/1.0``
    magic; an unreadable shard becomes one error row. Partition-
    preserving ``mapInPandas``; payloads never shuffle."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard, payload in zip(pdf[shard_col], pdf[payload_col]):
                if payload is None or len(bytes(payload)) == 0:
                    # empty shards are failed-upload artifacts — they
                    # must SURFACE in telemetry, not vanish
                    rows.append((shard, 0, None, None, None, None, None,
                                 "null payload" if payload is None
                                 else "empty payload"))
                    continue
                idx = 0
                # broad except: a corrupt member raises zlib.error (NOT
                # a ValueError subclass) — any decode failure is data,
                # never task death
                try:
                    for stream in _split_members(bytes(payload), max_bytes):
                        for rec in _parse_stream(stream):
                            rows.append((shard, idx) + rec)
                            idx += 1
                except Exception as exc:  # noqa: BLE001 — reject path
                    rows.append((shard, idx, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows,
                columns=[shard_col, "record_idx", "target_uri", "warc_date",
                         "http_status", "content_type", "body", "error"],
            )

    return df.select(shard_col, payload_col).mapInPandas(
        parse,
        f"{shard_col} long, record_idx long, target_uri string, "
        "warc_date string, http_status int, content_type string, "
        "body binary, error string",
    )


def html_to_text(df: DataFrame, body_col: str, out_col: str = "text") -> DataFrame:
    """Extract visible text from HTML bodies with the stdlib parser:
    ``script``/``style``/``template`` subtrees dropped, entities
    decoded (``convert_charrefs``), whitespace collapsed. NULL or
    undecodable bodies yield NULL. Arrow-batched pandas UDF — one
    scan-stage Python pass, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def extract(bodies: pd.Series) -> pd.Series:
        import re
        from html.parser import HTMLParser

        class TextGrab(HTMLParser):
            _SKIP = {"script", "style", "template"}

            def __init__(self) -> None:
                super().__init__(convert_charrefs=True)
                self.parts: list[str] = []
                self._skip_depth = 0

            def handle_starttag(self, tag, attrs):
                if tag in self._SKIP:
                    self._skip_depth += 1

            def handle_endtag(self, tag):
                if tag in self._SKIP and self._skip_depth:
                    self._skip_depth -= 1

            def handle_data(self, data):
                if not self._skip_depth:
                    self.parts.append(data)

        out = []
        for b in bodies:
            if b is None:
                out.append(None)
                continue
            try:
                p = TextGrab()
                p.feed(bytes(b).decode("utf-8", "replace"))
                p.close()
                out.append(re.sub(r"\s+", " ", " ".join(p.parts)).strip())
            except Exception:  # noqa: BLE001 — reject-path, never task death
                out.append(None)
        return pd.Series(out)

    return df.withColumn(out_col, extract(F.col(body_col)))
