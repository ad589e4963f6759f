"""Transfer-manifest operators (SURVEY §2: S10, F5, F11; A3).

* F5: origin/destination parameter unification — ``destination_id`` →
  ``origin_id``, ``destination_path`` → ``origin_path``; all of a
  dataset's sources must share one endpoint
  (``aws/automate_manager.py:197-225``).
* S10: transfer-item construction — ``{source_path, destination_path,
  recursive}`` structs (``aws/automate_manager.py:171-227``).
* F11: portal/app link builders (``aws/utils.py:89-93``).
* A3: search/sub version reset rule (``aws/source_id_manager.py:242-267``):
  against the per-name max prior (search, sub) pair — a higher search
  version resets sub to 1, the same search version bumps sub, a lower one
  is an error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unify_origin",
    "transfer_items",
    "single_endpoint_check",
    "next_search_sub_version",
    "loop_unroll",
]


def unify_origin(origin_id: Column, dest_id: Column, origin_path: Column, dest_path: Column) -> Column:
    """F5: struct(origin_id, origin_path) with destination params folded in."""
    return F.struct(
        F.coalesce(origin_id, dest_id).alias("origin_id"),
        F.coalesce(origin_path, dest_path).alias("origin_path"),
    )


def transfer_items(origin_path: Column, dest_root: Column, source_name: Column) -> Column:
    """S10: one recursive transfer item per data source, rooted at the
    dataset's destination directory."""
    return F.struct(
        origin_path.alias("source_path"),
        F.concat(dest_root, F.lit("/"), source_name, F.lit("/")).alias(
            "destination_path"
        ),
        F.lit(True).alias("recursive"),
    )


def single_endpoint_check(df: DataFrame, dataset_key: str, endpoint_col: str) -> DataFrame:
    """F5 invariant: every source of a dataset must point at one endpoint.
    Returns per-dataset (n_endpoints, endpoints_ok)."""
    return df.groupBy(dataset_key).agg(
        F.countDistinct(endpoint_col).alias("n_endpoints"),
        (F.countDistinct(endpoint_col) == 1).alias("endpoints_ok"),
    )


def loop_unroll(df: DataFrame, key_col: str, list_col: str) -> DataFrame:
    """S11/F13: the multi-destination transfer loop
    (``automate/transfer_loop_flow_def.json:14-99``) made set-oriented.

    The flow definition recurses with ``lst[0]`` (current action input),
    ``lst[1:]`` (remaining), and the Choice predicate ``lst == lst[0:0]``
    (loop done). One ``posexplode`` replaces the recursion — every
    iteration of every dataset's loop becomes a row carrying the same
    three expression results (``element_at`` / ``slice`` / ``size == 0``),
    so a 1000-executor cluster runs all loops at once instead of serially.
    """
    exploded = df.select(
        F.col(key_col),
        F.col(list_col).alias("_lst"),
        F.posexplode(F.col(list_col)).alias("iteration", "current"),
    )
    remaining = F.slice(
        F.col("_lst"),
        F.col("iteration") + 2,
        F.greatest(
            F.size(F.col("_lst")) - F.col("iteration") - 1, F.lit(0)
        ),
    )
    return exploded.select(
        F.col(key_col),
        F.col("iteration"),
        F.col("current"),
        F.array_join(remaining, ",").alias("remaining_csv"),
        (F.size(remaining) == 0).alias("loop_done"),
    )


def next_search_sub_version(
    prior: DataFrame,
    candidates: DataFrame,
    name_col: str,
    search_col: str = "search_version",
    sub_col: str = "submission_version",
) -> DataFrame:
    """A3: join each candidate against the max prior (search, max-sub-at-
    max-search) for its name and apply the reset rule. New names start at
    (candidate_search, 1)."""
    agg = prior.groupBy(name_col).agg(
        F.max(search_col).alias("_max_search"),
        F.max_by(F.col(sub_col), F.struct(F.col(search_col), F.col(sub_col))).alias(
            "_sub_at_max"
        ),
    )
    joined = candidates.join(agg, on=name_col, how="left")
    new_sub = (
        F.when(F.col("_max_search").isNull(), F.lit(1))
        .when(F.col(search_col) > F.col("_max_search"), F.lit(1))
        .when(F.col(search_col) == F.col("_max_search"), F.col("_sub_at_max") + 1)
    )
    error = F.when(
        F.col("_max_search").isNotNull()
        & (F.col(search_col) < F.col("_max_search")),
        F.lit("search version older than an existing submission"),
    )
    return joined.select(
        *[F.col(c) for c in candidates.columns],
        F.col("_max_search").alias("max_prior_search"),
        new_sub.alias("next_submission_version"),
        error.alias("version_error"),
    )
