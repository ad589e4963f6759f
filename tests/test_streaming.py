"""Structured Streaming tests: the windowed aggregations running as real
streams (readStream + watermark + availableNow trigger) and the stateful
status tracker, each checked against its batch equivalent."""

import pytest
from pyspark.sql import functions as F

from connect_server_spark.streaming.status_stream import track_status
from connect_server_spark.streaming.windows import tumbling_counts

SF_DIR = "/root/testdata/sf0.001"


def _event_stream(spark):
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
        .withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
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
