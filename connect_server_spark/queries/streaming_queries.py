"""Driver queries for the windowed-aggregation surface over ``events``
(batch semantics oracle-gated; the streaming path is exercised by
``tests/test_streaming.py`` with readStream + watermark)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.queries._fixtures import (
    cache_root,
    fixture_ready,
)
from connect_server_spark.registry import register
from connect_server_spark.streaming.windows import (
    session_counts,
    sliding_value_sums,
    tumbling_counts,
)
from connect_server_spark.tables import load_events


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_events(spark, sf_dir))


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_value_sums(load_events(spark, sf_dir))


def events_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h counts per event_type) and sliding (1h window / 30min
    slide value sums) arms tagged and unioned into one gated result.
    Column contract: ``grp`` carries the tumbling arm's event_type (null
    for sliding); ``measure`` is the count / cents-sum respectively. Both
    arms are single windowed hash aggregates over the projected events
    scan — the same plans Structured Streaming runs incrementally
    (``tests/test_streaming.py``)."""
    tumbling = events_tumbling_hourly(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"),
        "window_start",
        F.col("event_type").alias("grp"),
        F.col("n_events").alias("measure"),
    )
    sliding = events_sliding_windows(spark, sf_dir).select(
        F.lit("sliding").alias("kind"),
        "window_start",
        F.lit(None).cast("string").alias("grp"),
        F.col("value_cents").alias("measure"),
    )
    return tumbling.unionAll(sliding)


register(
    "events_time_windows",
    events_time_windows,
    sql="""
    SELECT 'tumbling' AS kind,
           time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type AS grp,
           count(*) AS measure
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start,
           CAST(NULL AS VARCHAR) AS grp,
           CAST(sum(cents) AS BIGINT) AS measure
    FROM (
      WITH b AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS bucket,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
      )
      SELECT bucket AS window_start, cents FROM b
      UNION ALL
      SELECT bucket - INTERVAL 30 MINUTE AS window_start, cents FROM b
    )
    GROUP BY 1, 2, 3
    """,
)


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_counts(load_events(spark, sf_dir))


register(
    "events_session_windows",
    events_session_windows,
    sql="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY ts) AS prev_t
      FROM events
    ),
    marked AS (
      SELECT user_id, t,
             CASE WHEN prev_t IS NULL
                       OR t - prev_t > INTERVAL 5 MINUTE THEN 1 ELSE 0 END
               AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, t,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT min(t) AS session_start, user_id, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
)


def daily_ingest_composed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED production ingest job
    (:mod:`connect_server_spark.streaming.daily_ingest`) run end-to-end
    as a batch-driven drill: build the base minhash/IVF/BM25/winnow
    stores from a third of the corpus, then push the other two thirds
    through the one-``foreachBatch`` sink as two daily batches — gate,
    rollup partial, all three dedup probes, all index appends,
    survivors commit.
    Returns the survivor ledger (deterministic: the probes, splits, and
    thresholds are all hash-derived). Rows-only by design — the
    exactly-once/crash-replay semantics are the pytest-pinned part
    (``tests/test_streaming.py`` composed-ingest suite)."""
    import tempfile

    from connect_server_spark.streaming.daily_ingest import (
        build_base_stores,
        composed_ingest_sink,
        ingest_store_paths,
    )
    from connect_server_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    corpus = (
        docs.join(emb, "doc_id")
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("doc_id") % 86400
            ),
        )
        .withColumn("value", (F.col("doc_id") % 100).cast("double"))
    )
    root = tempfile.mkdtemp(prefix="daily_ingest_composed_")
    paths = ingest_store_paths(root)
    base = corpus.filter(F.col("doc_id") % 3 == 0)
    build_base_stores(base, paths)
    sink = composed_ingest_sink(
        spark, root, "doc_id", "text", "embedding", "ts", "value"
    )
    sink(corpus.filter(F.col("doc_id") % 3 == 1), 0)
    sink(corpus.filter(F.col("doc_id") % 3 == 2), 1)
    return spark.read.parquet(paths["survivors"]).select("doc_id")


register("daily_ingest_composed", daily_ingest_composed, defer=True)


def daily_ingest_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CRAWL-FED composed ingest job (r7 verdict ask #7): the same
    store discipline as ``daily_ingest_composed``, but each daily batch
    arrives the way a crawl delivers it — real ``.warc.gz`` shard
    payloads — and runs the incremental crawl head first (WARC record
    parse → HTML text extraction → URL blocklist/canonical-dedup/
    per-domain-cap → C4 gate → deterministic embed) before the probe +
    append discipline. Returns the survivor ledger. Rows-only by
    design; the kill-mid-batch replay convergence for this leg is
    pinned in ``tests/test_streaming.py`` (crawl_leg matrix)."""
    import tempfile

    from connect_server_spark.sources.warc import synthesize_warc
    from connect_server_spark.streaming.daily_ingest import (
        build_base_stores,
        composed_crawl_ingest_sink,
        hash_embedder,
        ingest_store_paths,
    )
    from connect_server_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "text"
    )
    root = tempfile.mkdtemp(prefix="daily_ingest_crawl_")
    paths = ingest_store_paths(root)
    # base stores from a third of the corpus, embedded with the SAME
    # deterministic embedder the head applies, so the IVF probe compares
    # like with like
    base = hash_embedder()(docs.filter(F.col("doc_id") % 3 == 0), "text")
    build_base_stores(base, paths)

    def shard_batch(part: int) -> DataFrame:
        day = docs.filter(F.col("doc_id") % 3 == part).withColumn(
            "shard", F.col("doc_id") % 8
        ).withColumn(
            "domain", F.concat(F.col("source"), F.lit(".example"))
        )
        return synthesize_warc(day, "doc_id", "text", domain_col="domain")

    sink = composed_crawl_ingest_sink(
        spark, root, block_domains=["src3.example"], domain_cap=10_000
    )
    sink(shard_batch(1), 0)
    sink(shard_batch(2), 1)
    return spark.read.parquet(paths["survivors"]).select("doc_id")


register("daily_ingest_crawl", daily_ingest_crawl, defer=True)


def corpus_quality_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming drift alarm run as a batch-driven drill: freeze a
    reference profile (``n_chars`` deciles) from the even-id half of
    the corpus, then push two "daily" batches through the
    ``foreachBatch`` monitor — one faithful (odd ids, same
    distribution: psi ≈ 0) and one deliberately degenerate (the same
    docs with the metric halved: drift). Returns the telemetry log.
    Rows-only by design; PSI-identity to the batch ``metric_drift``
    operator and replay idempotence are pinned in
    ``tests/test_streaming.py``."""
    import tempfile

    from connect_server_spark.streaming.quality_monitor import (
        quality_monitor_sink,
        read_monitor_log,
        write_reference_profile,
    )
    from connect_server_spark.tables import load_table

    import os

    from connect_server_spark.tables import dataset_cache_key

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.col("n_chars").cast("double").alias("n_chars")
    )
    # the frozen profile is a per-release model artifact — cache it per
    # dataset like the IVF/BM25/BPE caches (bench reps and the audit
    # reuse it; production builds it once per accepted release)
    key = dataset_cache_key(sf_dir, "documents")
    profile = (
        f"{cache_root(spark, 'connect_server_spark_quality_profile_v1')}/{key}"
    )
    if not fixture_ready(spark, f"{profile}/_SUCCESS"):
        write_reference_profile(
            docs.filter(F.col("doc_id") % 2 == 0), "n_chars", profile
        )
    root = tempfile.mkdtemp(prefix="quality_monitor_")
    sink = quality_monitor_sink(spark, profile, f"{root}/log", "n_chars")
    faithful = docs.filter(F.col("doc_id") % 2 == 1)
    sink(faithful, 0)
    sink(faithful.withColumn("n_chars", F.col("n_chars") / 2), 1)
    return read_monitor_log(spark, f"{root}/log")


register("corpus_quality_monitor", corpus_quality_monitor, defer=True)


def corpus_ingest_arrow_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental object-store ingest drill (r12): three appends land
    in a manifest-committed ``arrow_parquet`` store, a Structured
    Streaming query tails it with ``trigger(availableNow)``, a FOURTH
    append arrives while the query is down, and the restart drains
    exactly the new commit from the checkpointed integer offset — the
    Auto Loader loop with the ledger folded into the manifest
    (``sources/arrow_parquet.py`` streaming section). Returns per-lang
    (n_docs, n_chars) over the sink, which must equal the batch
    aggregate of all four slices — the drill recomputes that equality
    implicitly because slices partition the corpus by ``doc_id % 4``.
    Rows-only by design; offset/replay/overwrite-refusal semantics are
    pytest-pinned in ``tests/test_arrow_source.py`` stream suite."""
    import tempfile

    from connect_server_spark.sources.arrow_parquet import (
        register_arrow_parquet,
    )
    from connect_server_spark.tables import load_table

    register_arrow_parquet(spark)
    root = tempfile.mkdtemp(prefix="arrow_stream_drill_")
    store, ckpt, out = f"{root}/store", f"{root}/ckpt", f"{root}/out"
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "n_chars"
    )
    for k in range(3):
        docs.filter(F.col("doc_id") % 4 == k).write.format(
            "arrow_parquet"
        ).mode("append").save(store)

    def _drain() -> None:
        q = (
            spark.readStream.format("arrow_parquet")
            .load(store)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _drain()
    # the query is DOWN; a new commit lands; the restart reads only it
    docs.filter(F.col("doc_id") % 4 == 3).write.format(
        "arrow_parquet"
    ).mode("append").save(store)
    _drain()
    return (
        spark.read.parquet(out)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


register("corpus_ingest_arrow_stream", corpus_ingest_arrow_stream, defer=True)
