"""Sketch-aggregate telemetry: error bounds vs exact computation."""

from pyspark.sql import functions as F

from connect_server_spark.queries.agg_queries import corpus_stats

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_stats_sketches_within_error_bounds(spark):
    got = {r.source: r for r in corpus_stats(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.md5("text")).alias("nd"),
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for src, e in exact.items():
        g = got[src]
        assert g.n_docs == e.n  # counts are exact
        # HLL++ default rsd is 5%
        assert abs(g.approx_distinct_texts - e.nd) <= max(0.1 * e.nd, 2), src
        # percentile_approx returns an actual data point near the quantile
        assert g.p50_chars <= g.p95_chars, src
        assert abs(g.p50_chars - e.p50) <= 0.2 * max(e.p50, 1), src
        assert abs(g.p95_chars - e.p95) <= 0.2 * max(e.p95, 1), src


def test_corpus_stats_plan_has_single_shuffle(spark):
    """Sketches merge map-side: one Exchange for the groupBy, and the
    orderBy's range exchange — never a distinct-expansion shuffle."""
    plan = (
        corpus_stats(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan  # no count-distinct expansion
