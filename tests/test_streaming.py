"""Structured Streaming tests: the windowed aggregations running as real
streams (readStream + watermark + availableNow trigger) and the stateful
status tracker, each checked against its batch equivalent."""

import pytest
from pyspark.sql import functions as F

from connect_server_spark.streaming.status_stream import track_status
from connect_server_spark.streaming.windows import tumbling_counts

SF_DIR = "/root/testdata/sf0.001"


def _event_stream(spark):
    from connect_server_spark.tables import normalize_event_ts

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    return normalize_event_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if name == "status" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_window_stream_matches_batch(spark):
    from connect_server_spark.tables import load_events

    streamed = tumbling_counts(
        _event_stream(spark), watermark="1 hour"
    )
    # complete mode: append would withhold the final windows still inside
    # the watermark when the bounded stream ends
    q = (
        streamed.writeStream.format("memory")
        .queryName("tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    expected = {
        (r.window_start, r.event_type): r.n_events
        for r in tumbling_counts(load_events(spark, SF_DIR)).collect()
    }
    assert got == expected and len(got) > 0


def test_sliding_window_stream_matches_batch(spark):
    """T6 gate: 1h/30min sliding value sums computed incrementally must
    equal the oracle-gated batch result."""
    from connect_server_spark.streaming.windows import sliding_value_sums
    from connect_server_spark.tables import load_events

    streamed = sliding_value_sums(_event_stream(spark))
    q = (
        streamed.writeStream.format("memory")
        .queryName("sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.window_start: r.value_cents
        for r in spark.sql("SELECT * FROM sliding").collect()
    }
    expected = {
        r.window_start: r.value_cents
        for r in sliding_value_sums(load_events(spark, SF_DIR)).collect()
    }
    assert got == expected and len(got) > 0


def test_session_window_stream_matches_batch(spark):
    """T6 gate: gap-based session windows computed incrementally
    (readStream + watermark) must equal the oracle-gated batch result."""
    from connect_server_spark.streaming.windows import session_counts
    from connect_server_spark.tables import load_events

    streamed = session_counts(_event_stream(spark), watermark="1 hour")
    q = (
        streamed.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.session_start, r.user_id): r.n_events
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    expected = {
        (r.session_start, r.user_id): r.n_events
        for r in session_counts(load_events(spark, SF_DIR)).collect()
    }
    assert got == expected and len(got) > 0


def test_stateful_status_tracker_matches_batch(spark):
    stream = _event_stream(spark).select("user_id", "ts", "event_type")
    q = _run_to_memory(track_status(stream), "status")
    rows = spark.sql(
        "SELECT user_id, n_events, n_errors, lifecycle FROM status"
    ).collect()
    got = {r.user_id: (r.n_events, r.n_errors) for r in rows}

    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("e"),
        )
    )
    expected = {r.user_id: (r.n, r.e) for r in batch.collect()}
    assert got == expected
    assert all(r.lifecycle in ("active", "failed") for r in rows)


def test_foreachbatch_idempotent_status_sink(spark, tmp_path):
    """T3: the status table as a streaming sink — micro-batches land
    through the S8 insert guard, so a key replayed in a later batch (or a
    restarted writer) appends nothing."""
    import json

    from connect_server_spark.sinks import idempotent_append

    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"source_id": f"s{i}", "version": "1.0"})
                  for i in range(5))
    )
    (src / "b2.json").write_text(
        "\n".join(json.dumps({"source_id": f"s{i}", "version": "1.0"})
                  for i in range(3, 8))  # 3,4 overlap batch 1
    )
    out = str(tmp_path / "status")
    stream = (
        spark.readStream.schema("source_id string, version string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )

    def sink(batch_df, batch_id):
        idempotent_append(
            spark, batch_df, out, ["source_id", "version"]
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 8  # 10 incoming, 2 duplicates guarded out
    assert len({r.source_id for r in rows}) == 8


def test_curation_decision_stream_stream_join(spark, tmp_path):
    """T2 streaming: decisions within the window resolve pending rows;
    a row whose window expires under the watermark emits 'hibernating'."""
    import json

    from connect_server_spark.streaming.status_stream import (
        join_curation_decisions,
    )

    pdir = tmp_path / "pending"
    ddir = tmp_path / "decisions"
    pdir.mkdir(); ddir.mkdir()
    (pdir / "p1.json").write_text("\n".join([
        json.dumps({"source_id": "s1", "submitted_at": "2026-01-01T10:00:00"}),
        json.dumps({"source_id": "s2", "submitted_at": "2026-01-01T10:01:00"}),
        json.dumps({"source_id": "s3", "submitted_at": "2026-01-01T10:02:00"}),
    ]))
    # late heartbeats advance the pending watermark past s2's window
    (pdir / "p2.json").write_text(json.dumps(
        {"source_id": "hb1", "submitted_at": "2026-01-01T11:00:00"}))
    (pdir / "p3.json").write_text(json.dumps(
        {"source_id": "hb2", "submitted_at": "2026-01-01T12:00:00"}))
    (ddir / "d1.json").write_text("\n".join([
        json.dumps({"source_id": "s1", "decided_at": "2026-01-01T10:05:00",
                    "decision": "accept"}),
        json.dumps({"source_id": "s3", "decided_at": "2026-01-01T10:04:00",
                    "decision": "reject"}),
    ]))
    (ddir / "d2.json").write_text(json.dumps(
        {"source_id": "hb1", "decided_at": "2026-01-01T11:00:00",
         "decision": "accept"}))
    (ddir / "d3.json").write_text(json.dumps(
        {"source_id": "hb2", "decided_at": "2026-01-01T12:00:00",
         "decision": "accept"}))

    pending = (
        spark.readStream.schema("source_id string, submitted_at timestamp")
        .option("maxFilesPerTrigger", "1").json(str(pdir))
    )
    decisions = (
        spark.readStream.schema(
            "source_id string, decided_at timestamp, decision string")
        .option("maxFilesPerTrigger", "1").json(str(ddir))
    )
    out = join_curation_decisions(pending, decisions)
    q = (
        out.writeStream.format("memory").queryName("curation_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.source_id: r.curation_state
        for r in spark.sql("SELECT * FROM curation_out").collect()
        if r.source_id.startswith("s")
    }
    assert got["s1"] == "accept"
    assert got["s3"] == "reject"
    assert got["s2"] == "hibernating"  # window expired with no decision
