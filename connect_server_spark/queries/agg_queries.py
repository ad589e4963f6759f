"""Driver queries for the grouping-sets aggregation surface.

SURVEY §2.4: the reference has no grouping-set queries, but the Spark
engine gets ``rollup``/``cube`` free from Catalyst (one Expand + one
hash aggregate — map-side combined, no extra shuffle versus a plain
groupBy), so the surface is exposed and oracle-gated here.

Value sums use ``floor(value*100)`` integer cents: ``floor`` over the
identical IEEE product is bit-deterministic in both engines, where a
rounded double sum could drift one ulp across aggregation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def _events_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return e.select(
        "event_type",
        (F.col("user_id") % 10).alias("cohort"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )


_GSET_COLS = ["event_type", "cohort", "g_type", "g_cohort", "n", "sum_cents"]


def _gset_agg(grouped) -> DataFrame:
    return grouped.agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("cohort").cast("int").alias("g_cohort"),
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
    ).select(*_GSET_COLS)


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (event_type, cohort): per-pair, per-type, and grand
    totals with grouping indicators."""
    base = _events_base(spark, sf_dir)
    return _gset_agg(base.rollup("event_type", "cohort"))


def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, cohort): all four grouping sets."""
    base = _events_base(spark, sf_dir)
    return _gset_agg(base.cube("event_type", "cohort"))


def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE arms tagged and unioned into one gated result.
    Each arm is one Expand + one map-side-combined hash aggregate — no
    extra shuffle versus a plain groupBy — so the fold costs one extra
    pass over the (3-column) projected scan, nothing at the agg layer."""
    rollup = events_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("gset"), *_GSET_COLS
    )
    cube = events_cube(spark, sf_dir).select(
        F.lit("cube").alias("gset"), *_GSET_COLS
    )
    return rollup.unionAll(cube)


# DuckDB sum(BIGINT) widens to HUGEINT — cast back so the driver's value
# hash sees Spark's int64.
_GSET_SQL = """
    SELECT event_type,
           user_id % 10 AS cohort,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(user_id % 10) AS INT) AS g_cohort,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY {clause} (event_type, user_id % 10)
"""

register(
    "events_grouping_sets",
    events_grouping_sets,
    sql=f"""
    SELECT 'rollup' AS gset, * FROM ({_GSET_SQL.format(clause="ROLLUP")})
    UNION ALL
    SELECT 'cube' AS gset, * FROM ({_GSET_SQL.format(clause="CUBE")})
    """,
)


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus telemetry, the monitoring shape a 100 TB
    pipeline actually runs: per source, document counts, HLL++ distinct
    text estimates (`approx_count_distinct` — fixed-size sketch per
    group, merges map-side, hashes its input internally; an exact
    distinct would shuffle every value) and Greenwald-Khanna rank-error
    quantile summaries over document lengths (`percentile_approx` —
    same bounded-sketch property). rsd=0.02 costs a few KB of registers
    per group and keeps small-group relative error sane (the default
    0.05 measured 12% on 25-distinct groups). Rows-only: sketch values
    are engine-specific (DuckDB's HLL differs); 10% (HLL) / 20%
    (quantile) error-vs-exact bounds are pinned in
    ``tests/test_aggs.py``."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct("text", 0.02).alias(
                "approx_distinct_texts"
            ),
            F.percentile_approx("n_chars", 0.5).alias("p50_chars"),
            F.percentile_approx("n_chars", 0.95).alias("p95_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


register("corpus_stats", corpus_stats, defer=True)


def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source release DATA CARD: the one-page telemetry a corpus
    release ships with — volume (docs, tokens), composition (English
    share by the n-gram language guesser), quality (mean heuristic
    score, Gopher pass rate), and redundancy (exact-duplicate rate from
    text digests) — composed in ONE scan of the documents table: every
    per-document metric is a scan-stage expression sharing one token
    split, folded by a single per-source aggregation (the digests the
    distinct-count shuffles are 16-byte keys, never text). Rows-only
    (md5/xxhash machinery); the full per-source DuckDB mirror runs in
    ``tests/test_aggs.py``."""
    from connect_server_spark.operators.quality import (
        gopher_flags,
        gopher_pass,
    )
    from connect_server_spark.operators.text import (
        language_id,
        quality_score,
        token_count,
        tokens,
    )

    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    toks = F.col("_toks")
    per_doc = docs.select(
        "source", t.alias("text"), tokens(t).alias("_toks")
    ).select(
        "source",
        token_count(t, toks=toks).alias("_nt"),
        language_id(t, toks=toks).alias("_lang"),
        quality_score(t, toks=toks).alias("_q"),
        gopher_pass(gopher_flags(t, toks=toks)).alias("_gok"),
        F.md5(t).alias("_digest"),
    )
    agged = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.round(F.avg("_nt"), 6).alias("avg_tokens"),
        F.round(
            F.avg((F.col("_lang") == "en").cast("double")), 6
        ).alias("en_share"),
        F.round(F.avg(F.col("_q").cast("double")), 6).alias("avg_quality_e7"),
        F.round(
            F.avg(F.col("_gok").cast("double")), 6
        ).alias("gopher_pass_rate"),
        F.count_distinct(F.col("_digest")).alias("n_distinct_texts"),
    )
    return agged.select(
        "*",
        F.round(
            1.0 - F.col("n_distinct_texts") / F.col("n_docs"), 6
        ).alias("dup_rate"),
    ).orderBy("source")


register("corpus_datacard", corpus_datacard, defer=True)
