"""Versioned-read operators: latest-version-per-key and friends.

Re-expresses the reference's DynamoDB version resolution
(``aws/dynamo_manager.py:60-88`` — collect all versions of a source_id,
sort numerically-aware, take last; trap set
``aws/tests/test_dynamo_manager.py:7-44`` where ``1.13 > 1.2``) as a
single aggregation.

Scale notes: ``max_by`` is an ordinary declarative aggregate, so Catalyst
runs it with map-side partial aggregation — each task reduces its input to
one candidate row per key before the shuffle, and the shuffle carries at
most #distinct-keys rows per task. A window (`row_number` over
partitionBy/orderBy) would shuffle *every* version row and sort each
partition; at 100 TB with hot keys that is strictly worse. Ties are broken
by explicit tiebreaker columns so results stay deterministic (hash-stable
for the correctness gate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connect_server_spark.functions.source_ids import version_sort_key

__all__ = ["latest_per_key", "latest_version_join", "existence_probe"]


def _ordering(version: Column, tiebreakers: Sequence[Column]) -> Column:
    """Sort key struct: numeric-aware version first, then tiebreakers.

    Struct ordering is lexicographic over fields, and array<long> fields
    compare element-wise — exactly Python's ``[int(s) for s in
    v.split('.')]`` list comparison the reference relies on.
    """
    return F.struct(
        version_sort_key(version).alias("_vk"),
        *[t.alias(f"_tb{i}") for i, t in enumerate(tiebreakers)],
    )


def latest_per_key(
    df: DataFrame,
    key: str,
    version: str,
    payload: Sequence[str],
    tiebreakers: Sequence[str] = (),
    history_col: str | None = None,
) -> DataFrame:
    """One row per ``key``: the payload of the numerically-latest ``version``.

    Output columns: ``key``, ``version``, then ``payload`` in order.
    ``tiebreakers`` break exact-version ties deterministically (pass a
    unique column; the reference's Dynamo table cannot hold duplicate
    (source_id, version) pairs, but synthetic fixtures can).

    ``history_col``: when set, also emit the sorted distinct
    ``{key}-{version}`` list of ALL versions — the reference's
    ``previous_versions`` accumulation (``aws/submit.py:215-216``).
    Computed in the same groupBy, so it adds no extra shuffle; the
    partial ``collect_set`` carries one short string per distinct
    version, bounded by version count, not row count.
    """
    ordering = _ordering(F.col(version), [F.col(t) for t in tiebreakers])
    picked = F.max_by(
        F.struct(F.col(version).alias(version), *[F.col(c).alias(c) for c in payload]),
        ordering,
    )
    aggs = [picked.alias("_latest")]
    if history_col:
        aggs.append(
            F.array_sort(
                F.collect_set(F.concat(F.col(key), F.lit("-"), F.col(version)))
            ).alias(history_col)
        )
    extra = [history_col] if history_col else []
    return (
        df.groupBy(key)
        .agg(*aggs)
        .select(
            key,
            *[F.col(f"_latest.{c}").alias(c) for c in [version, *payload]],
            *extra,
        )
    )


def latest_version_join(
    submissions: DataFrame,
    status: DataFrame,
    key: str,
    version: str,
    payload: Sequence[str],
    tiebreakers: Sequence[str] = (),
    history_col: str | None = None,
) -> DataFrame:
    """Left-join each submission to the latest status row for its key
    (J2, ``aws/submit.py:212-216``). Missing keys keep null status columns
    (a brand-new submission)."""
    latest = latest_per_key(status, key, version, payload, tiebreakers, history_col)
    return submissions.join(latest, on=key, how="left")


def existence_probe(
    df: DataFrame, key: str, probe_limit: int = 2
) -> DataFrame:
    """Per-key existence classification (O2,
    ``aws/source_id_manager.py:212-229``): 0 rows → ``new``, 1 → ``bump``,
    ≥2 → ``error``. The reference issues a ``limit 2`` search per key; the
    set-oriented version is a capped count — the cap means the aggregate
    can stop distinguishing counts past 2, but a plain count is one
    map-side-combined agg either way.
    """
    n = F.count(F.lit(1))
    return df.groupBy(key).agg(
        F.least(n, F.lit(probe_limit)).alias("n_existing"),
        F.when(n == 1, F.lit("bump"))
        .otherwise(F.lit("error"))
        .alias("classification"),
    )
