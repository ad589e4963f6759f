"""The arrow-native parquet datasource (`sources/arrow_parquet.py`):
correctness vs Spark's own parquet scan, real filter pushdown (consumed
by the source, gone from the optimized plan), driver-side row-group
stats pruning, SQL null semantics, and the manifest-commit write
protocol. The object-store twin of these scans — the same datasource
over ``s3://`` against a live S3 API — lives in
``tests/test_objectstore.py``.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from connect_server_spark.sources.arrow_parquet import (
    MANIFEST_NAME,
    ArrowParquetReader,
    _translate_filter,
    read_arrow_parquet,
    register_arrow_parquet,
)


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# ---------------------------------------------------------------------------
# scan correctness vs the native reader


def test_scan_matches_native_parquet_reader(spark, sf_dir):
    docs = f"{sf_dir}/documents.parquet"
    got = sorted(map(tuple, read_arrow_parquet(spark, docs).collect()))
    want = sorted(map(tuple, spark.read.parquet(docs).collect()))
    assert got == want and len(got) > 0


def test_scan_timestamps_match_native(spark, sf_dir):
    """events.ts exercises the arrow timestamp → Spark TimestampType
    mapping end to end (tz-aware micros since the INT96 fix)."""
    events = f"{sf_dir}/events.parquet"
    got = read_arrow_parquet(spark, events, columns=["event_id", "ts"])
    want = spark.read.parquet(events).select("event_id", "ts")
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_filtered_scan_matches_and_consumes_filters(spark, sf_dir):
    """Pushed predicates return identical rows AND vanish from the
    optimized plan — the source evaluates them exactly, so Spark plans
    no post-scan Filter at all."""
    docs = f"{sf_dir}/documents.parquet"
    pred = (F.col("n_chars") > 200) & F.col("lang").isin("en", "de")
    got = read_arrow_parquet(
        spark, docs, columns=["doc_id", "lang", "n_chars"]
    ).filter(pred)
    want = (
        spark.read.parquet(docs)
        .select("doc_id", "lang", "n_chars")
        .filter(pred)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert "Filter" not in _optimized_plan(got)
    # an un-pushable predicate (column arithmetic) stays with Spark
    residual = read_arrow_parquet(spark, docs, columns=["doc_id"]).filter(
        (F.col("doc_id") % 2) == 1
    )
    assert "Filter" in _optimized_plan(residual)
    assert residual.count() == spark.read.parquet(docs).filter(
        (F.col("doc_id") % 2) == 1
    ).count()


def test_null_semantics_match_spark(spark, tmp_path):
    """Comparisons drop null rows (SQL three-valued logic), IsNull /
    IsNotNull push and keep them — identical to the native scan."""
    path = str(tmp_path / "nulls.parquet")
    src = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id long, tag string"
    )
    src.coalesce(1).write.parquet(path)
    for pred in (
        F.col("tag") == "a",
        F.col("tag") != "a",
        F.col("tag").isNull(),
        F.col("tag").isNotNull(),
        F.col("tag").startswith("a"),
    ):
        got = read_arrow_parquet(spark, path).filter(pred)
        want = spark.read.parquet(path).filter(pred)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), str(pred)


# ---------------------------------------------------------------------------
# pushdown mechanics (driver-side, no Spark job)


def test_translate_keeps_unsupported_filters_for_spark():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNull,
        Not,
        StringStartsWith,
    )

    assert _translate_filter(EqualTo(("a",), 1)) == ("eq", "a", 1)
    assert _translate_filter(Not(EqualTo(("a",), 1))) == ("ne", "a", 1)
    assert _translate_filter(GreaterThan(("a",), 5)) == ("gt", "a", 5)
    assert _translate_filter(In(("a",), (1, 2))) == ("in", "a", (1, 2))
    assert _translate_filter(IsNull(("a",))) == ("isnull", "a", None)
    assert _translate_filter(StringStartsWith(("s",), "x")) == (
        "startswith",
        "s",
        "x",
    )
    # nested column references and odd shapes stay with Spark
    assert _translate_filter(EqualTo(("a", "b"), 1)) is None
    assert _translate_filter(Not(GreaterThan(("a",), 1))) is None


@pytest.fixture()
def two_range_files(tmp_path):
    """Two single-row-group files with disjoint id ranges — the
    fixture for footer-stats pruning."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "ranged"
    root.mkdir()
    pq.write_table(
        pa.table({"id": list(range(0, 100)), "v": list(range(0, 100))}),
        root / "lo.parquet",
    )
    pq.write_table(
        pa.table({"id": list(range(1000, 1100)), "v": list(range(100, 200))}),
        root / "hi.parquet",
    )
    return str(root)


def test_row_group_stats_prune_files_driver_side(two_range_files):
    """With a pushed range predicate, partitions() drops the file whose
    footer stats exclude it — BEFORE any task launches. The 100 TB
    contract: a selective scan reads the predicate's files, not the
    table."""
    from pyspark.sql.datasource import GreaterThan, LessThan

    reader = ArrowParquetReader(None, {"path": two_range_files})
    leftover = list(reader.pushFilters([GreaterThan(("id",), 500)]))
    assert leftover == []
    parts = [p for p in reader.partitions() if p.path]
    assert len(parts) == 1 and parts[0].path.endswith("hi.parquet")

    reader = ArrowParquetReader(None, {"path": two_range_files})
    list(reader.pushFilters([LessThan(("id",), 50)]))
    parts = [p for p in reader.partitions() if p.path]
    assert len(parts) == 1 and parts[0].path.endswith("lo.parquet")


def test_fully_pruned_scan_returns_zero_rows(spark, two_range_files):
    """Stats exclude every row group → one empty placeholder partition,
    zero rows, no crash (Spark requires ≥1 partition)."""
    df = read_arrow_parquet(spark, two_range_files).filter(
        F.col("id") == 500
    )
    assert df.count() == 0


def test_string_and_in_filters_scan_exactly(spark, sf_dir):
    docs = f"{sf_dir}/documents.parquet"
    pred = F.col("lang").isin("en") & F.col("text").startswith("the")
    got = read_arrow_parquet(spark, docs).filter(pred)
    want = spark.read.parquet(docs).filter(pred)
    assert "Filter" not in _optimized_plan(got)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


# ---------------------------------------------------------------------------
# manifest-commit writes


def test_write_commits_manifest_and_orphans_are_invisible(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "store")
    src = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "id long, s string"
    )
    register_arrow_parquet(spark)
    src.repartition(3).write.format("arrow_parquet").mode("overwrite").save(
        out
    )
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["rows"] == 100
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert sorted(parts) == manifest["parts"]
    # an uncommitted orphan (crashed writer, aborted job) never scans
    pq.write_table(
        pa.table({"id": [999], "s": ["orphan"]}),
        os.path.join(out, "part-orphan.parquet"),
    )
    back = read_arrow_parquet(spark, out)
    assert back.count() == 100
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_overwrite_replaces_manifest_and_gcs_old_parts(spark, tmp_path):
    out = str(tmp_path / "store")
    register_arrow_parquet(spark)
    big = spark.createDataFrame(
        [(i, "x") for i in range(50)], "id long, s string"
    )
    big.repartition(4).write.format("arrow_parquet").mode("overwrite").save(
        out
    )
    small = spark.createDataFrame([(1, "y")], "id long, s string")
    small.write.format("arrow_parquet").mode("overwrite").save(out)
    assert read_arrow_parquet(spark, out).count() == 1
    # old generation's parts are GC'd after the manifest swap
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    on_disk = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert sorted(on_disk) == manifest["parts"]


def test_abort_deletes_written_parts(tmp_path):
    """Task-failure path, driver-side: abort() removes every part its
    commit messages name, so a failed job leaves only (invisible)
    orphans from tasks that never reported."""
    import pyarrow as pa

    from connect_server_spark.sources.arrow_parquet import (
        ArrowParquetWriter,
    )

    out = str(tmp_path / "aborted")
    os.makedirs(out)
    writer = ArrowParquetWriter({"path": out}, overwrite=False)
    batch = pa.record_batch({"id": [1, 2]})
    msg = writer.write(iter([batch]))
    assert len(msg.parts) == 1
    assert os.path.exists(os.path.join(out, msg.parts[0]))
    writer.abort([msg, None])
    assert not os.path.exists(os.path.join(out, msg.parts[0]))
    assert not os.path.exists(os.path.join(out, MANIFEST_NAME))


def test_writer_splits_parts_by_max_rows(spark, tmp_path):
    out = str(tmp_path / "split")
    register_arrow_parquet(spark)
    src = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    (
        src.coalesce(1)
        .write.format("arrow_parquet")
        .option("max_rows_per_part", "300")
        .mode("overwrite")
        .save(out)
    )
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert len(manifest["parts"]) == 4  # 300+300+300+100
    assert read_arrow_parquet(spark, out).count() == 1000


# ---------------------------------------------------------------------------
# the registry query and its promotion-ready oracle


def test_corpus_arrow_scan_matches_oracle(spark, sf_dir):
    from connect_server_spark.queries.extractor_queries import (
        CORPUS_ARROW_SCAN_ORACLE_SQL,
        corpus_arrow_scan,
    )
    from tests.oracle import assert_matches_oracle

    df = corpus_arrow_scan(spark, sf_dir)
    assert_matches_oracle(df, CORPUS_ARROW_SCAN_ORACLE_SQL, sf_dir)
    assert df.count() > 0


def test_append_mode_merges_manifest(spark, tmp_path):
    """mode("append") unions the previous manifest's parts into the new
    one (still a single atomic swap) — the old generation's data stays
    committed; a naive parts-of-this-job manifest would silently orphan
    it."""
    out = str(tmp_path / "store")
    register_arrow_parquet(spark)
    a = spark.createDataFrame([(1, "a")], "id long, s string")
    b = spark.createDataFrame([(2, "b")], "id long, s string")
    a.write.format("arrow_parquet").mode("append").save(out)
    b.write.format("arrow_parquet").mode("append").save(out)
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["rows"] == 2 and len(manifest["parts"]) == 2
    got = sorted(map(tuple, read_arrow_parquet(spark, out).collect()))
    assert got == [(1, "a"), (2, "b")]


# ---------------------------------------------------------------------------
# streaming: incremental ingest of a manifest-committed store


def _drain(spark, store, ckpt, out, timeout=300) -> None:
    q = (
        spark.readStream.format("arrow_parquet")
        .load(store)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)


def test_stream_tails_appends_and_restarts_incrementally(spark, tmp_path):
    """Offset = the manifest's integer seq: the first drain reads both
    committed appends, a commit landing while the query is down is
    drained exactly once by the restart — no dupes, no misses."""
    register_arrow_parquet(spark)
    store, ckpt, out = (
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    b = spark.createDataFrame([(3, "c")], "id long, s string")
    a.write.format("arrow_parquet").mode("append").save(store)
    b.write.format("arrow_parquet").mode("append").save(store)
    _drain(spark, store, ckpt, out)
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    spark.createDataFrame([(4, "d")], "id long, s string").write.format(
        "arrow_parquet"
    ).mode("append").save(store)
    _drain(spark, store, ckpt, out)
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (4, "d"),
    ]


def test_stream_starting_latest_skips_existing(spark, tmp_path):
    register_arrow_parquet(spark)
    store, ckpt, out = (
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    spark.createDataFrame([(1, "old")], "id long, s string").write.format(
        "arrow_parquet"
    ).mode("append").save(store)
    q = (
        spark.readStream.format("arrow_parquet")
        .option("starting", "latest")
        .load(store)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # availableNow at starting=latest drains the empty window
    assert spark.read.parquet(out).count() == 0


def test_stream_refuses_overwritten_upstream(spark, tmp_path):
    """An upstream overwrite while the stream is down replaces commits
    the checkpointed offset had not read — the restart fails with the
    named error instead of silently skipping the gap."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    register_arrow_parquet(spark)
    store, ckpt, out = (
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    spark.createDataFrame([(1, "a")], "id long, s string").write.format(
        "arrow_parquet"
    ).mode("append").save(store)
    _drain(spark, store, ckpt, out)  # checkpointed offset: seq 1
    # an UNREAD append (seq 2) is then swallowed by an overwrite
    # (seq 3, base_seq 3) — its data is unrecoverable, so the restart
    # must refuse, not deliver a gap
    spark.createDataFrame([(2, "b")], "id long, s string").write.format(
        "arrow_parquet"
    ).mode("append").save(store)
    spark.createDataFrame([(3, "c")], "id long, s string").write.format(
        "arrow_parquet"
    ).mode("overwrite").save(store)
    with pytest.raises(StreamingQueryException) as e:
        _drain(spark, store, ckpt, out)
    assert "UpstreamOverwrittenError" in str(e.value) or (
        "overwrite replaced commits" in str(e.value)
    )
    # an overwrite the stream HAD fully read through is benign: the
    # lineage restarted at base_seq but no unread commit was replaced —
    # a fresh stream from earliest reads the new lineage cleanly
    ckpt2, out2 = str(tmp_path / "ckpt2"), str(tmp_path / "out2")
    _drain(spark, store, ckpt2, out2)
    assert sorted(map(tuple, spark.read.parquet(out2).collect())) == [
        (3, "c")
    ]


def test_stream_offset_window_unit(tmp_path, spark):
    """Driver-side mechanics, no streaming query: earliest/latest
    initial offsets, the (start, end] part window, and the loud
    refusals (bare directory, pre-seq manifest)."""
    from connect_server_spark.sources.arrow_parquet import (
        ArrowParquetStreamReader,
        UpstreamOverwrittenError,
    )

    store = str(tmp_path / "store")
    register_arrow_parquet(spark)
    a = spark.createDataFrame([(1, "a")], "id long, s string")
    b = spark.createDataFrame([(2, "b")], "id long, s string")
    a.write.format("arrow_parquet").mode("append").save(store)
    first_parts = {
        f for f in os.listdir(store) if f.endswith(".parquet")
    }
    b.write.format("arrow_parquet").mode("append").save(store)
    second_parts = {
        f for f in os.listdir(store) if f.endswith(".parquet")
    } - first_parts

    reader = ArrowParquetStreamReader(None, {"path": store})
    assert reader.initialOffset() == {"seq": 0}
    assert reader.latestOffset() == {"seq": 2}
    window = [
        p.path.rsplit("/", 1)[-1]
        for p in reader.partitions({"seq": 1}, {"seq": 2})
        if p.path
    ]
    assert set(window) == second_parts
    # empty window → one placeholder partition
    empty = reader.partitions({"seq": 2}, {"seq": 2})
    assert len(empty) == 1 and not empty[0].path
    # overwrite bumps base_seq → stale offsets refuse
    spark.createDataFrame([(9, "z")], "id long, s string").write.format(
        "arrow_parquet"
    ).mode("overwrite").save(store)
    with pytest.raises(UpstreamOverwrittenError):
        reader.partitions({"seq": 1}, {"seq": 3})

    latest = ArrowParquetStreamReader(
        None, {"path": store, "starting": "latest"}
    )
    assert latest.initialOffset() == latest.latestOffset()

    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    with pytest.raises(FileNotFoundError):
        ArrowParquetStreamReader(None, {"path": bare}).initialOffset()


def test_stream_rejects_pre_seq_manifest(tmp_path, spark):
    """A manifest written before the seq protocol refuses with the
    remediation in the message rather than mis-windowing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from connect_server_spark.sources.arrow_parquet import (
        ArrowParquetStreamReader,
    )

    store = tmp_path / "legacy"
    store.mkdir()
    pq.write_table(pa.table({"id": [1]}), store / "part-x.parquet")
    (store / MANIFEST_NAME).write_text(
        json.dumps({"parts": ["part-x.parquet"], "rows": 1})
    )
    with pytest.raises(ValueError, match="seq protocol"):
        ArrowParquetStreamReader(None, {"path": str(store)}).initialOffset()


def test_corpus_ingest_arrow_stream_drill_matches_batch(spark, sf_dir):
    """The registered drill's sink aggregate must equal the plain batch
    aggregate over the whole table (the four slices partition it)."""
    from connect_server_spark.queries.streaming_queries import (
        corpus_ingest_arrow_stream,
    )

    got = sorted(
        map(tuple, corpus_ingest_arrow_stream(spark, sf_dir).collect())
    )
    want = sorted(
        map(
            tuple,
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
            .collect(),
        )
    )
    assert got == want


def test_empty_write_leaves_scannable_store(spark, tmp_path):
    """A zero-row commit writes one empty schema-carrying part, so the
    store scans as an empty table (and a stream can tail it) instead of
    leaving an un-inferable manifest."""
    out = str(tmp_path / "empty")
    register_arrow_parquet(spark)
    src = spark.createDataFrame([], "id long, s string")
    src.write.format("arrow_parquet").mode("overwrite").save(out)
    back = read_arrow_parquet(spark, out)
    assert back.schema == src.schema and back.count() == 0
    # streaming from the empty store, then an append arrives
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    _drain(spark, out, ckpt, sink)
    spark.createDataFrame([(1, "a")], "id long, s string").write.format(
        "arrow_parquet"
    ).mode("append").save(out)
    _drain(spark, out, ckpt, sink)
    assert sorted(map(tuple, spark.read.parquet(sink).collect())) == [
        (1, "a")
    ]


def test_concurrent_commit_loser_raises(tmp_path):
    """Two racing commits: object stores have no CAS, so the second
    manifest PUT wins — the overwritten loser's read-back guard raises
    ConcurrentCommitError instead of reporting success for rows the
    manifest no longer lists (the append_guarded discipline)."""
    import pyarrow as pa

    from connect_server_spark.sources.arrow_parquet import (
        ArrowParquetWriter,
        ConcurrentCommitError,
    )

    out = str(tmp_path / "raced")
    os.makedirs(out)
    loser = ArrowParquetWriter({"path": out}, overwrite=False)
    winner = ArrowParquetWriter({"path": out}, overwrite=True)
    loser_msg = loser.write(iter([pa.record_batch({"id": [1]})]))
    winner_msg = winner.write(iter([pa.record_batch({"id": [2]})]))
    # the winner's overwrite lands inside the loser's PUT→verify window
    # and replaces the loser's manifest wholesale
    loser._post_put_hook = lambda: winner.commit([winner_msg])
    with pytest.raises(ConcurrentCommitError):
        loser.commit([loser_msg])
    # the store stays consistent on the winner's manifest
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert manifest["parts"] == sorted(winner_msg.parts)
    assert manifest["rows"] == 1
    # a racing APPEND is benign by construction — it reads the loser's
    # just-landed manifest and merges it, so nothing is lost either way;
    # only a window-straddling pair that both read the SAME predecessor
    # can drop a commit, and the read-back guard names the loser then too
