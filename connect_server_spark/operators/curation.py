"""Corpus-curation operators a training-data pipeline needs beyond
dedup: benchmark decontamination and deterministic stratified sampling.

Scale design:

* **Decontamination** — benchmark suites are tiny next to the corpus, so
  the benchmark n-gram set is the BROADCAST side; the corpus explodes its
  shingles into narrow (id, gram-hash) rows and a broadcast LEFT SEMI
  join marks contaminated ids. The corpus text never shuffles; the only
  movement is the benchmark hash set to each executor, and the final
  anti-join is on ids.
* **Sampling** — no ``rand()``: the keep decision is a pure function of
  (seed, key) via md5, so it is reproducible across runs, engines, and
  retries (speculative task re-execution with ``rand()`` silently
  changes the sample). md5 yields identical lowercase hex in Spark and
  DuckDB, which makes sampled outputs oracle-gateable — compare the
  first 4 hex chars against ``floor(fraction·16⁴)`` rendered as hex:
  uniform on 65 536 buckets, granularity 2⁻¹⁶ (fraction 1.0 means keep
  everything — skip the filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connect_server_spark.operators.dedup import word_shingles

__all__ = [
    "benchmark_ngrams",
    "contaminated_ids",
    "decontaminate",
    "deterministic_keep",
    "stratified_sample",
]


def benchmark_ngrams(
    bench: DataFrame, text_col: str, n: int = 8
) -> DataFrame:
    """Distinct word n-gram hashes of a benchmark/test set — the small,
    broadcastable side of the contamination join."""
    return (
        bench.select(
            F.explode(
                F.transform(
                    word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
                )
            ).alias("_gram")
        )
        .distinct()
    )


def contaminated_ids(
    docs: DataFrame,
    bench_grams: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Ids of documents sharing ANY n-gram with the benchmark set — the
    standard test-set leakage sweep. Broadcast semi join on 8-byte gram
    hashes; corpus text stays put."""
    grams = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
            )
        ).alias("_gram"),
    )
    return (
        grams.join(F.broadcast(bench_grams), "_gram", "leftsemi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str,
    n: int = 8,
) -> DataFrame:
    """Drop every document that leaks a benchmark n-gram (anti-join on
    ids — document bodies cross no shuffle)."""
    hits = contaminated_ids(
        docs, benchmark_ngrams(bench, bench_text_col, n), id_col, text_col, n
    )
    return docs.join(hits, id_col, "left_anti")


def deterministic_keep(
    key: Column, fraction: Column, seed: str = ""
) -> Column:
    """Reproducible Bernoulli(fraction) decision as a pure function of
    (seed, key): first 4 hex chars of md5 compared against the fraction
    rendered on the same 16⁴ grid. fraction must be in [0, 1)."""
    prefix = F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 4)
    threshold = F.format_string(
        "%04x", F.floor(fraction * F.lit(65536)).cast("int")
    )
    return prefix < threshold


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fraction: Column,
    seed: str = "",
) -> DataFrame:
    """Keep each row with its stratum's probability — ``fraction`` is any
    per-row expression (a `when` chain over strata, a rate-table join),
    evaluated scan-stage. No shuffle, no rand()."""
    return df.filter(deterministic_keep(F.col(key_col), fraction, seed))
