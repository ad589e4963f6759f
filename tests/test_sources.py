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


# ------------------------------------------------------------- WARC (r7)


def _warc_bytes(body: bytes, uri="http://x.example/doc/1",
                date="2024-01-01T00:00:00Z", http=True) -> bytes:
    """Hand-built WARC/1.0 response record — the golden the parser is
    checked against (independent of synthesize_warc)."""
    if http:
        block = (b"HTTP/1.1 200 OK\r\n"
                 b"Content-Type: text/html; charset=utf-8\r\n"
                 + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        ctype = b"application/http;msgtype=response"
    else:
        block, ctype = body, b"text/plain"
    return (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + b"Content-Type: " + ctype + b"\r\n"
            + f"Content-Length: {len(block)}\r\n\r\n".encode()
            + block + b"\r\n\r\n")


def test_warc_parse_golden_record_fields(spark):
    from connect_server_spark.sources.warc import parse_warc_records

    body = b"<html><body><p>hello &amp; goodbye</p></body></html>"
    df = spark.createDataFrame(
        [(1, _warc_bytes(body))], "shard long, payload binary"
    )
    [r] = parse_warc_records(df).collect()
    assert r.error is None
    assert r.target_uri == "http://x.example/doc/1"
    assert r.warc_date == "2024-01-01T00:00:00Z"
    assert r.http_status == 200
    assert r.content_type == "text/html; charset=utf-8"
    assert bytes(r.body) == body

    # non-HTTP record: block IS the body, no status
    [r2] = parse_warc_records(
        spark.createDataFrame(
            [(1, _warc_bytes(b"plain payload", http=False))],
            "shard long, payload binary",
        )
    ).collect()
    assert r2.error is None and r2.http_status is None
    assert bytes(r2.body) == b"plain payload"


def test_warc_gzip_members_are_independently_decodable(spark):
    """The Common Crawl layout contract: each record its own gzip
    member, so the FIRST member alone decompresses to exactly the first
    record — a reader can split shards without full decompression."""
    import gzip
    import zlib

    from pyspark.sql import functions as F

    from connect_server_spark.sources.warc import (
        parse_warc_records,
        synthesize_warc,
    )

    docs = spark.createDataFrame(
        [(1, "first doc text", 0), (2, "second doc text", 0)],
        ["doc_id", "text", "shard"],
    )
    [shard] = synthesize_warc(docs, "doc_id", "text").collect()
    payload = bytes(shard.payload)
    assert shard.n_records == 2 and payload[:2] == b"\x1f\x8b"
    d = zlib.decompressobj(31)
    first = d.decompress(payload)
    assert first.startswith(b"WARC/1.0\r\n") and b"/doc/1" in first
    assert b"/doc/2" not in first          # member boundary respected
    assert d.unused_data[:2] == b"\x1f\x8b"  # next member starts clean
    second = gzip.decompress(d.unused_data)
    assert b"/doc/2" in second

    # and the parser sees both records with intact uris
    recs = parse_warc_records(
        spark.createDataFrame([(0, payload)], "shard long, payload binary")
    ).collect()
    assert [r.target_uri for r in recs] == [
        "https://corpus.example/doc/1", "https://corpus.example/doc/2"
    ]
    assert all(r.error is None for r in recs)


def test_warc_malformed_record_resyncs_and_truncation_errors(spark):
    from connect_server_spark.sources.warc import parse_warc_records

    good1 = _warc_bytes(b"<p>one</p>", uri="http://x/doc/1")
    garbage = b"WARC/1.0\r\nthis header line has no colon\r\n\r\n"
    good2 = _warc_bytes(b"<p>two</p>", uri="http://x/doc/2")
    stream = good1 + garbage + good2
    rows = parse_warc_records(
        spark.createDataFrame([(0, stream)], "shard long, payload binary")
    ).collect()
    uris = [r.target_uri for r in rows if r.error is None]
    errs = [r.error for r in rows if r.error is not None]
    assert uris == ["http://x/doc/1", "http://x/doc/2"]  # resync worked
    assert len(errs) == 1 and "malformed" in errs[0]

    # Content-Length past shard end -> truncation error row
    truncated = _warc_bytes(b"<p>cut</p>")[:-12]
    [t] = parse_warc_records(
        spark.createDataFrame([(0, truncated)], "shard long, payload binary")
    ).collect()
    assert t.error is not None and "truncated" in t.error

    # null payload -> error row, never a task failure
    [nr] = parse_warc_records(
        spark.createDataFrame([(0, None)], "shard long, payload binary")
    ).collect()
    assert nr.error == "null payload"


def test_html_to_text_drops_script_style_decodes_entities(spark):
    from connect_server_spark.sources.warc import html_to_text

    html = (b"<html><head><title>T</title>"
            b"<script>var x = 'DROP';</script>"
            b"<style>p { color: red }</style></head>"
            b"<body><p>alpha &amp; beta</p>\n\n  <div>gamma</div>"
            b"<script>also <b>DROP</b></script>d</body></html>")
    df = spark.createDataFrame([(1, html), (2, None)], "i long, body binary")
    out = {r.i: r.text for r in html_to_text(df, "body").collect()}
    assert out[1] == "T alpha & beta gamma d"
    assert out[2] is None


def test_warc_parse_and_extract_are_shuffle_free(spark):
    """Parsing + extraction ride the scan: zero Exchange over a payload
    table (the drill's synthesis groupBy is fixture cost, not ingest)."""
    from connect_server_spark.sources.warc import (
        html_to_text,
        parse_warc_records,
    )

    df = spark.createDataFrame(
        [(1, _warc_bytes(b"<p>x</p>"))], "shard long, payload binary"
    )
    plan = (
        html_to_text(parse_warc_records(df), "body")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # Arrow only


def test_corpus_ingest_warc_query_self_verifies(spark, sf_dir):
    from connect_server_spark.queries.extractor_queries import (
        corpus_ingest_warc,
    )

    rows = corpus_ingest_warc(spark, sf_dir).collect()
    assert len(rows) == 8
    assert all(r.n_errors == 0 for r in rows)
    assert all(r.n_text_match == r.n_records for r in rows)
    assert all(r.n_http_200 == r.n_records for r in rows)
    assert sum(r.n_records for r in rows) >= 400


def test_warc_corrupt_gzip_and_empty_payload_become_error_rows(spark):
    """zlib.error is NOT a ValueError — a bit-flipped member must still
    become an error row, never a task death; a zero-byte shard (failed
    upload) must surface in telemetry instead of vanishing."""
    import gzip

    from connect_server_spark.sources.warc import parse_warc_records

    good = gzip.compress(_warc_bytes(b"<p>ok</p>"), mtime=0)
    corrupt = bytearray(gzip.compress(_warc_bytes(b"<p>bad</p>"), mtime=0))
    corrupt[len(corrupt) // 2] ^= 0xFF  # flip a byte mid-deflate-stream
    rows = parse_warc_records(
        spark.createDataFrame(
            [(0, good + bytes(corrupt)), (1, b"")],
            "shard long, payload binary",
        )
    ).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    ok = [r for r in by_shard[0] if r.error is None]
    errs = [r for r in by_shard[0] if r.error is not None]
    assert len(ok) == 1 and len(errs) == 1  # good member parsed first
    assert "Error" in errs[0].error or "error" in errs[0].error
    assert by_shard[1][0].error == "empty payload"


def test_warc_roundtrip_survives_entities_and_whitespace(spark, sf_dir):
    """Self-verify robustness: text with & < > and ragged whitespace
    (and a NULL) still matches after escape → extract → collapse."""
    from pyspark.sql import functions as F

    from connect_server_spark.sources.warc import (
        html_to_text,
        parse_warc_records,
        synthesize_warc,
    )

    docs = spark.createDataFrame(
        [(1, "a & b < c > d", 0), (2, "  ragged   spacing\ttabs ", 0),
         (3, None, 0), (4, "", 0)],
        "doc_id long, text string, shard long",
    )
    recs = html_to_text(parse_warc_records(synthesize_warc(docs, "doc_id", "text")), "body")
    got = {
        int(r.target_uri.rsplit("/", 1)[1]): r.text
        for r in recs.collect()
    }
    assert got[1] == "doc 1 a & b < c > d"
    assert got[2] == "doc 2 ragged spacing tabs"
    assert got[3] == "doc 3" and got[4] == "doc 4"


def test_corpus_ingest_files_matches_in_plan_leg(spark, sf_dir):
    """The on-disk leg (r7 verdict missing #2): a binaryFile scan over
    real written .warc.gz shards must produce row-identical telemetry
    to the in-plan synthesized leg — same corpus, same parser, same
    aggregation — and its executed plan must actually READ files."""
    from connect_server_spark.queries.extractor_queries import (
        corpus_ingest_files,
        corpus_ingest_warc,
    )

    from connect_server_spark.queries.extractor_queries import (
        _ingest_shard_count,
    )
    from connect_server_spark.tables import load_table

    on_disk = corpus_ingest_files(spark, sf_dir)
    got = sorted(map(tuple, on_disk.collect()))
    want = sorted(map(tuple, corpus_ingest_warc(spark, sf_dir).collect()))
    # both legs shard by the SAME count rule, so the pin binds at any sf
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert got == want and len(got) == _ingest_shard_count(n_docs)
    plan = on_disk._jdf.queryExecution().executedPlan().toString()
    assert "binaryFile" in plan, "the on-disk leg must scan real files"


def test_warc_shard_files_idempotent_and_real_gzip(spark, sf_dir):
    """The shard store builds once (marker-gated) and its files are
    real member-gzip WARC shards a foreign reader could decompress."""
    import glob
    import gzip
    import os

    from connect_server_spark.queries.extractor_queries import warc_shard_files

    d1 = warc_shard_files(spark, sf_dir)
    stamp = {f: os.stat(f).st_mtime_ns for f in glob.glob(f"{d1}/*.warc.gz")}
    assert len(stamp) == 8
    d2 = warc_shard_files(spark, sf_dir)
    assert d2 == d1
    assert {f: os.stat(f).st_mtime_ns for f in glob.glob(f"{d1}/*.warc.gz")} == stamp
    first = sorted(stamp)[0]
    with open(first, "rb") as f:
        head = gzip.GzipFile(fileobj=f).read(64)
    assert head.startswith(b"WARC/1.0")


def test_jsonl_ingest_round_trips_content_and_counts_corrupt(
    spark, sf_dir, tmp_path
):
    """The JSONL dump path: (a) every valid line round-trips
    row-identically to the parquet documents table (ids, full text,
    lang, source — arbitrary unicode/newlines survive to_json); (b) the
    planted malformed lines surface as exactly one counted corrupt row
    per shard, with every schema column NULL — PERMISSIVE semantics,
    never a crash, never a silent drop; (c) the files are real gzip."""
    import glob
    import gzip

    from pyspark.sql import functions as F

    from connect_server_spark.queries.extractor_queries import (
        corpus_ingest_jsonl,
        jsonl_shard_files,
    )
    from connect_server_spark.sources.jsonl import (
        CORRUPT_COL,
        read_jsonl_corpus,
    )
    from connect_server_spark.tables import load_table

    shard_dir = jsonl_shard_files(spark, sf_dir)
    files = sorted(glob.glob(f"{shard_dir}/shard-*.jsonl.gz"))
    assert files
    with open(files[0], "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # real gzip magic

    raw = read_jsonl_corpus(
        spark,
        shard_dir,
        "doc_id long, text string, lang string, source string",
    ).cache()
    try:
        got = sorted(
            (r.doc_id, r.text, r.lang, r.source)
            for r in raw.filter(raw[CORRUPT_COL].isNull()).collect()
        )
        want = sorted(
            tuple(r)
            for r in load_table(spark, "documents", sf_dir)
            .select("doc_id", "text", "lang", "source")
            .collect()
        )
        assert got == want  # byte-identical corpus through the dump

        corrupt = raw.filter(raw[CORRUPT_COL].isNotNull()).collect()
        assert len(corrupt) == len(files)  # one planted line per shard
        assert all(
            r.doc_id is None and r.text is None for r in corrupt
        )
    finally:
        raw.unpersist()

    tele = {r.lang: (r.n_docs, r.n_chars) for r in
            corpus_ingest_jsonl(spark, sf_dir).collect()}
    assert tele["__corrupt__"] == (len(files), 0)
    by_lang = {
        r.lang: (r.n, r.c)
        for r in load_table(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("c"),
        )
        .collect()
    }
    assert {k: v for k, v in tele.items() if k != "__corrupt__"} == by_lang


def test_read_jsonl_corpus_requires_explicit_schema(spark):
    """The no-inference contract is structural: read_jsonl_corpus has no
    schema-optional path (inference would be a full extra pass over
    every byte at corpus scale)."""
    import inspect

    from connect_server_spark.sources.jsonl import read_jsonl_corpus

    sig = inspect.signature(read_jsonl_corpus)
    assert sig.parameters["schema"].default is inspect.Parameter.empty
