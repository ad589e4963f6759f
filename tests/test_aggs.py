"""Sketch-aggregate telemetry: error bounds vs exact computation."""

from pyspark.sql import functions as F

from connect_server_spark.queries.agg_queries import corpus_stats


def test_corpus_stats_sketches_within_error_bounds(spark, sf_dir):
    got = {r.source: r for r in corpus_stats(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("text").alias("nd"),
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for src, e in exact.items():
        g = got[src]
        assert g.n_docs == e.n  # counts are exact
        # rsd=0.02 sketch; floor of 3 absorbs small-group (~25 distinct)
        # bias where relative bounds are meaningless
        assert abs(g.approx_distinct_texts - e.nd) <= max(0.1 * e.nd, 3), src
        # percentile_approx returns an actual data point near the quantile
        assert g.p50_chars <= g.p95_chars, src
        assert abs(g.p50_chars - e.p50) <= 0.2 * max(e.p50, 1), src
        assert abs(g.p95_chars - e.p95) <= 0.2 * max(e.p95, 1), src


def test_corpus_stats_plan_is_expand_free(spark, sf_dir):
    """Sketches merge map-side — the plan must never contain the
    count-distinct Expand rewrite. (The Exchange ceiling itself is
    pinned by SHUFFLE_BUDGET in test_plan_audit.py.)"""
    plan = (
        corpus_stats(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan


def test_corpus_datacard_matches_duckdb_mirror(spark, sf_dir):
    """The release data card recomputed per-source in DuckDB SQL —
    volume, English share, mean quality, Gopher pass rate, and exact
    duplicate rate, value-for-value. Reuses the language-score SQL
    fragments the gated text_analysis oracle is built from."""
    import duckdb

    from connect_server_spark.queries.agg_queries import (
        corpus_datacard,
        corpus_datacard_oracle_sql,
    )
    got = sorted(map(tuple, corpus_datacard(spark, sf_dir).collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        corpus_datacard_oracle_sql()).fetchall()))
    assert len(got) > 0
    assert got == want
