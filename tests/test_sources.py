"""Unit tests for the format readers (S1/S14 reader surface)."""

import hashlib

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from connect_server_spark.sources import (
    read_binary_dir,
    read_csv_table,
    read_json_submissions,
)

SUB_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("n", LongType()),
    ]
)


def test_read_json_submissions_corrupt_channel(spark, tmp_path):
    p = tmp_path / "subs.jsonl"
    p.write_text('{"title": "ok", "n": 1}\n{not valid json\n')
    out = sorted(
        read_json_submissions(spark, str(p), SUB_SCHEMA).collect(),
        key=lambda r: (r.success is False, r.title or ""),
    )
    good, bad = out[0], out[1]
    assert (good.title, good.n, good.success, good.error) == ("ok", 1, True, None)
    assert bad.success is False and bad.error == "submission is not valid JSON"


def test_read_csv_table_explicit_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("title,n\nalpha,10\nbeta,20\n")
    rows = {r.title: r.n for r in read_csv_table(spark, str(p), SUB_SCHEMA).collect()}
    assert rows == {"alpha": 10, "beta": 20}


def test_read_binary_dir_contract(spark, tmp_path):
    d = tmp_path / "grp"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x01\x02\x03")
    [r] = read_binary_dir(spark, str(tmp_path), glob="*.bin").collect()
    assert r.group_dir.endswith("/grp")
    assert bytes(r.payload) == b"\x01\x02\x03"
    assert r.meta.n_bytes == 3
    assert r.meta.digest == hashlib.md5(b"\x01\x02\x03").hexdigest()


def test_compressed_roundtrip_all_codecs_and_sniff_agreement(spark):
    """compress_text → decompress_text is the identity for gzip/bzip2/xz
    (REAL stdlib decode, unicode included), and the JVM-side sniff_codec
    expression agrees with the Python-side dispatch for every payload —
    routing never needs the Arrow boundary."""
    from pyspark.sql import functions as F

    from connect_server_spark.sources.compressed import (
        compress_text,
        decompress_text,
        sniff_codec,
    )

    rows = [(i, f"doc {i} — ünïcødé ✓ " + "repetitive text " * (i + 1)) for i in range(9)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    payloads = compress_text(docs, "doc_id", "text").cache()

    decoded = decompress_text(payloads, "doc_id")
    got = {r.doc_id: r for r in decoded.collect()}
    want = dict(rows)
    assert {r.codec for r in got.values()} == {"gzip", "bzip2", "xz"}
    for i, text in rows:
        assert got[i].error is None
        assert got[i].text == text
        assert got[i].codec == ("gzip", "bzip2", "xz")[i % 3]

    sniffed = payloads.select(
        "doc_id", sniff_codec(F.col("payload")).alias("codec")
    )
    assert {r.doc_id: r.codec for r in sniffed.collect()} == {
        i: got[i].codec for i, _ in rows
    }
    payloads.unpersist()


def test_compressed_reject_path_and_contracts(spark):
    """Corrupt members and library-lacking codecs (zstd) become error
    ROWS — the reject-path convention; one bad member must never fail
    the task. 'raw' (unknown magic) passes through as UTF-8, and the
    max_bytes decompression-bomb bound trips as a corrupt-member error."""
    import gzip

    from connect_server_spark.sources.compressed import decompress_text

    good = gzip.compress(b"fine", mtime=0)
    truncated = good[: len(good) // 2]
    zstd_magic = b"\x28\xb5\x2f\xfd" + b"\x00" * 8
    raw = "plain text".encode()
    bomb = gzip.compress(b"x" * 4096, mtime=0)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(truncated)),
         (3, bytearray(zstd_magic)), (4, bytearray(raw)),
         (5, bytearray(bomb))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in decompress_text(df, "doc_id", max_bytes=1024).collect()}
    assert (out[1].codec, out[1].text, out[1].error) == ("gzip", "fine", None)
    assert out[2].codec == "gzip" and out[2].text is None
    assert "corrupt gzip member" in out[2].error
    assert out[3].codec == "zstd" and out[3].text is None
    assert "needs a library" in out[3].error
    assert (out[4].codec, out[4].text, out[4].error) == ("raw", "plain text", None)
    assert out[5].codec == "gzip" and "max_bytes" in out[5].error


def test_compressed_null_payload_and_streamed_bomb_bound():
    """Regression pins for the two reject-path hazards: a NULL payload
    (failed fetch in a crawl shard) becomes an error row, not a
    TypeError task failure; and the max_bytes bound is enforced DURING
    decompression — a member expanding to 100 MB with a 1 KB bound must
    abort at the bound, never materialize the expansion first (the
    one-shot helpers OOM the worker before an after-the-fact check)."""
    import gzip
    import tracemalloc

    from connect_server_spark.sources.compressed import _decompress_one

    bomb = gzip.compress(b"\x00" * (100 * 1024 * 1024))
    tracemalloc.start()
    try:
        try:
            _decompress_one(bomb, "gzip", 1024)
            raise AssertionError("bomb not caught")
        except ValueError as exc:
            assert "max_bytes" in str(exc)
        peak = tracemalloc.get_traced_memory()[1]
    finally:
        tracemalloc.stop()
    assert peak < 8 * 1024 * 1024, f"guard materialized the bomb: peak={peak}"


def test_compressed_null_payload_error_row(spark):
    import gzip

    from connect_server_spark.sources.compressed import decompress_text

    df = spark.createDataFrame(
        [(1, bytearray(gzip.compress(b"ok", mtime=0))), (2, None)],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in decompress_text(df, "doc_id").collect()}
    assert (out[1].text, out[1].error) == ("ok", None)
    assert out[2].text is None and out[2].error == "null payload"


def test_corpus_ingest_compressed_query_runs(spark, sf_dir):
    """The registered drill: per-codec telemetry over the round-tripped
    documents table — every codec decodes every member (n_errors 0) and
    the decoded char mass equals the source table's."""
    from pyspark.sql import functions as F

    from connect_server_spark.queries.extractor_queries import (
        corpus_ingest_compressed,
    )
    from connect_server_spark.tables import load_table

    out = corpus_ingest_compressed(spark, sf_dir).collect()
    assert [r.codec for r in out] == ["bzip2", "gzip", "xz"]
    assert all(r.n_errors == 0 for r in out)
    total = sum(r.n_chars for r in out)
    [want] = (
        load_table(spark, "documents", sf_dir)
        .agg(F.sum(F.length("text")))
        .collect()
    )
    assert total == want[0]
