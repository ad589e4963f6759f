"""Published quality gates (Gopher rules, C4 line cleaning): behavioral
unit tests per rule plus the oracle-grade DuckDB mirror for the
rows-only ``quality_gates`` driver query."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_server_spark.operators.quality import (
    GOPHER_STOPWORDS,
    c4_clean_lines,
    c4_doc_flags,
    gopher_flags,
    gopher_pass,
)
from connect_server_spark.queries.quality_queries import quality_gates


def _flags(spark, text, **kw):
    df = spark.createDataFrame([Row(text=text)])
    [r] = df.select(
        gopher_flags(F.col("text"), **kw).alias("g")
    ).select("g.*").collect()
    return r


GOOD = (
    "The quick brown fox jumps over the lazy dog and that is fine. "
    "We have been to the park with many friends of ours today. "
    "Everyone should be happy to read plain text that flows well. "
    "The weather was mild and the coffee tasted of roasted hazelnut. "
    "That walk by the river gave everyone time to think and to rest."
)


def test_gopher_good_document_passes(spark):
    r = _flags(spark, GOOD)
    assert r.ok_words and r.ok_word_len and r.ok_symbols
    assert r.ok_bullets and r.ok_ellipsis and r.ok_alpha
    assert r.ok_stopwords and r.ok_dup_lines and r.ok_top_2gram


def test_gopher_word_count_bounds(spark):
    assert not _flags(spark, "too short of a text").ok_words
    assert _flags(spark, "ten " * 50).ok_words
    assert not _flags(spark, "w " * 20, min_words=5, max_words=10).ok_words


def test_gopher_symbol_ratio_rule(spark):
    spam = " ".join(f"#tag{i}" for i in range(60))
    r = _flags(spark, spam)
    assert r.symbol_word_ratio >= 1.0
    assert not r.ok_symbols


def test_gopher_bullet_and_ellipsis_rules(spark):
    bullets = "\n".join(f"- item {i} of the list" for i in range(20))
    r = _flags(spark, bullets)
    assert r.bullet_line_share == 1.0
    assert not r.ok_bullets

    trailing = "\n".join(f"line {i} keeps going..." for i in range(10))
    r2 = _flags(spark, trailing)
    assert r2.ellipsis_line_share == 1.0
    assert not r2.ok_ellipsis


def test_gopher_alpha_word_rule(spark):
    numeric = " ".join(str(i) for i in range(100))
    r = _flags(spark, numeric)
    assert r.alpha_word_share == 0.0
    assert not r.ok_alpha


def test_gopher_stopword_rule(spark):
    r = _flags(spark, "lorem dolor sit amet " * 20)
    assert r.stopword_hits < 2
    assert not r.ok_stopwords
    assert _flags(spark, GOOD).stopword_hits >= 2
    assert set(GOPHER_STOPWORDS) >= {"the", "and"}


def test_gopher_repetition_rules(spark):
    looped = "\n".join(["the same exact line again"] * 30)
    r = _flags(spark, looped)
    assert not r.ok_dup_lines
    assert not r.ok_top_2gram


def test_gopher_pass_is_and_of_rules(spark):
    df = spark.createDataFrame([Row(text=GOOD), Row(text="x")])
    rows = df.select(
        gopher_flags(F.col("text")).alias("g")
    ).select(gopher_pass(F.col("g")).alias("ok"), "g.*").collect()
    for r in rows:
        oks = [v for k, v in r.asDict().items() if k.startswith("ok_")]
        assert r.ok == all(oks)


def test_c4_clean_lines_rules(spark):
    text = "\n".join(
        [
            "This line is long enough and ends with a period.",
            "short one.",                          # < 5 words: dropped
            "No terminal punctuation on this line",  # dropped
            "Enable JavaScript to view the page.",   # javascript: dropped
            'He said it was "a fine day indeed."',   # kept (quote end)
        ]
    )
    [r] = (
        spark.createDataFrame([Row(text=text)])
        .select(c4_clean_lines(F.col("text")).alias("c"))
        .collect()
    )
    kept = r.c.split("\n")
    assert kept == [
        "This line is long enough and ends with a period.",
        'He said it was "a fine day indeed."',
    ]


def test_c4_doc_flags(spark):
    rows = (
        spark.createDataFrame(
            [
                Row(doc_id=1, text="Normal prose here."),
                Row(doc_id=2, text="Lorem Ipsum dolor sit."),
                Row(doc_id=3, text="code { return 1; }"),
            ]
        )
        .select("doc_id", c4_doc_flags(F.col("text")).alias("f"))
        .select("doc_id", "f.*")
        .collect()
    )
    got = {r.doc_id: (r.has_lorem_ipsum, r.has_brace) for r in rows}
    assert got == {1: (False, False), 2: (True, False), 3: (False, True)}


def test_quality_gates_plan_is_scan_stage(spark, sf_dir):
    """The metric projection itself stays scan-stage: the only Exchange
    allowed is the conditional round-robin spread of the one-split local
    scan (spread_scan, r12) — never a hash/range shuffle, never a
    Python node."""
    plan = (
        quality_gates(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "ReusedExchange" not in ln
    ]
    assert len(exchanges) <= 1
    assert all("RoundRobinPartitioning" in ln for ln in exchanges)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_quality_gates_matches_duckdb_mirror(spark, sf_dir):
    """Every metric, verdict, and the cleaned length recomputed in
    DuckDB SQL on the same parquet — since r9 this SQL is ALSO the
    driver's gated oracle (imported from quality_queries so the two
    can never drift); the test keeps the sf0.001 fast check."""
    from connect_server_spark.queries.quality_queries import (
        QUALITY_GATES_ORACLE_SQL,
    )

    got = sorted(map(tuple, quality_gates(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(QUALITY_GATES_ORACLE_SQL).fetchall()))
    assert len(got) > 0
    assert got == want




def test_metric_drift_planted_shift_and_stability(spark):
    """PSI oracle: shares and psi terms recomputed in python from the
    operator's own bucket bounds; a planted +50 shift must read as
    drift (>0.25), an identical split as stable (<0.01), and the old
    side's deciles must be ~equal-share by construction."""
    import math

    from connect_server_spark.operators.quality import metric_drift

    old_vals = [float(i % 100) for i in range(1000)]
    new_vals = [v + 50.0 for v in old_vals]
    old = spark.createDataFrame([(v,) for v in old_vals], "m double")
    new = spark.createDataFrame([(v,) for v in new_vals], "m double")

    out = metric_drift(old, new, "m", n_buckets=10, rel_err=1e-6).collect()
    assert [r.bucket for r in out] == list(range(len(out)))
    assert out[0].lo == float("-inf") and out[-1].hi == float("inf")

    # independent recomputation from the reported bounds
    eps = 1e-6
    for r in out:
        p_old = sum(1 for v in old_vals if r.lo < v <= r.hi or
                    (r.lo == float("-inf") and v <= r.hi)) / len(old_vals)
        p_new = sum(1 for v in new_vals if r.lo < v <= r.hi or
                    (r.lo == float("-inf") and v <= r.hi)) / len(new_vals)
        assert abs(r.share_old - p_old) < 1e-4
        assert abs(r.share_new - p_new) < 1e-4
        want = (max(p_new, eps) - max(p_old, eps)) * math.log(
            max(p_new, eps) / max(p_old, eps)
        )
        assert abs(r.psi_term - want) < 1e-4
    assert sum(r.psi_term for r in out) > 0.25  # drift detected
    # old deciles ~equal share
    for r in out:
        assert 0.05 <= r.share_old <= 0.15

    stable = metric_drift(old, old, "m", n_buckets=10, rel_err=1e-6).collect()
    assert sum(r.psi_term for r in stable) < 0.01


def test_metric_drift_collapses_tied_edges(spark):
    from connect_server_spark.operators.quality import metric_drift

    const = spark.createDataFrame([(1.0,)] * 50, "m double")
    out = metric_drift(const, const, "m", n_buckets=10).collect()
    assert len(out) <= 2 and abs(sum(r.psi_term for r in out)) < 1e-9


def test_corpus_drift_query_reports_stable_halves(spark, sf_dir):
    from connect_server_spark.queries.quality_queries import corpus_drift

    out = corpus_drift(spark, sf_dir).collect()
    assert len(out) >= 2
    assert abs(sum(r.share_old for r in out) - 1.0) < 1e-4
    assert abs(sum(r.share_new for r in out) - 1.0) < 1e-4
    # random halves of one corpus: no drift signal
    assert sum(r.psi_term for r in out) < 0.25


def test_metric_drift_excludes_null_metric_rows(spark):
    """Nulls are excluded from both sides' shares: padding the new
    release with null rows must not change a single bucket share or
    psi term."""
    from connect_server_spark.operators.quality import metric_drift

    vals = [float(i % 100) for i in range(1000)]
    old = spark.createDataFrame([(v,) for v in vals], "m double")
    new = spark.createDataFrame([(v,) for v in vals], "m double")
    new_padded = spark.createDataFrame(
        [(v,) for v in vals] + [(None,)] * 300, "m double"
    )
    a = [tuple(r) for r in
         metric_drift(old, new, "m", n_buckets=10, rel_err=1e-6).collect()]
    b = [tuple(r) for r in
         metric_drift(old, new_padded, "m", n_buckets=10,
                      rel_err=1e-6).collect()]
    assert a == b
