"""Organization-registry operators: alias resolution, parent-rule
inheritance, idempotent insert guard.

Re-expresses ``aws/organization.py:27-58`` (name-or-alias lookup with
duplicate detection), ``aws/source_id_manager.py:282-369`` (BFS parent-rule
inheritance), and ``aws/dynamo_manager.py:339-377`` (conditional insert) as
DataFrame composition.

Scale notes:

* The reference matches ``canonical_name == x OR x IN aliases``. As a join
  predicate that OR forces a nested-loop join. We instead *explode* the
  registry into one row per match name (canonical + every alias) and
  equi-join on it — hash-joinable, and since the registry is a config-sized
  dimension it broadcasts, so the fact side never shuffles (J1).
* Parent inheritance (J3) is an iterative self-join run to fixpoint on the
  dimension only — orgs are O(100) rows; the loop never touches fact data.
* The insert guard (J5) is a left-anti join on the key pair — the only
  correct idempotent-append discipline for a parallel writer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = [
    "explode_match_names",
    "resolve_org",
    "inherit_parent_rules",
    "anti_join_insert",
]


def explode_match_names(orgs: DataFrame, name: str = "canonical_name",
                        aliases: str = "aliases") -> DataFrame:
    """Registry → one row per (match_name, org row): the canonical name plus
    every alias (``aws/organization.py:32-42`` checks both)."""
    match = F.explode(
        F.array_union(
            F.array(F.col(name)),
            F.coalesce(F.col(aliases), F.array().cast("array<string>")),
        )
    )
    return orgs.select(match.alias("match_name"), *orgs.columns)


def resolve_org(
    submissions: DataFrame,
    orgs: DataFrame,
    org_ref: str,
    org_payload: Sequence[str],
) -> DataFrame:
    """J1: left-join each submission to its organization by canonical name
    or alias, with duplicate detection.

    Adds ``org_found`` (bool) and ``org_error`` (null | 'unknown
    organization' | 'duplicate organization match' — the reference errors
    on 0 and >1 matches, ``aws/organization.py:43-58``). The registry side
    is explicitly broadcast.
    """
    lookup = explode_match_names(orgs).select(
        "match_name", *[F.col(c) for c in ["canonical_name", *org_payload]]
    )
    joined = submissions.join(
        broadcast(lookup), submissions[org_ref] == lookup["match_name"], "left"
    ).drop("match_name")

    # Duplicate detection: >1 registry row matching one submission's ref.
    # Counting per org_ref (not per submission row) keeps it a dim-sized agg.
    n_matches = (
        broadcast(lookup)
        .groupBy("match_name")
        .agg(F.count(F.lit(1)).alias("_n_org_matches"))
    )
    out = joined.join(
        broadcast(n_matches), joined[org_ref] == n_matches["match_name"], "left"
    ).drop("match_name")
    return out.select(
        *[F.col(c) for c in submissions.columns],
        *[F.col(c) for c in ["canonical_name", *org_payload]],
        (F.col("canonical_name").isNotNull()).alias("org_found"),
        F.when(F.col("canonical_name").isNull(), F.lit("unknown organization"))
        .when(F.col("_n_org_matches") > 1, F.lit("duplicate organization match"))
        .alias("org_error"),
    )


def inherit_parent_rules(
    orgs: DataFrame,
    parent_col: str = "parent_organizations",
    acl_col: str = "acl",
    curation_col: str = "curation",
    max_depth: int = 8,
) -> DataFrame:
    """J3: merge each org's rules with its ancestors' —
    ``aws/source_id_manager.py:318-359``: list rules append
    (``dict_merge(append_lists=True)``), curation ORs upward.

    Iterates parent links to ``max_depth`` (the registry is a broadcast-
    sized dimension; each step is a dim×dim self-join, never fact data).
    Output: one row per org with ``acl`` = own + ancestors' (own first),
    ``curation`` = own OR any ancestor's.
    """
    cur = orgs.select(
        F.col("canonical_name"),
        F.col(parent_col).alias("_parents"),
        F.col(acl_col).alias("_acl"),
        F.col(curation_col).alias("_curation"),
    )
    parents = orgs.select(
        F.col("canonical_name").alias("_p_name"),
        F.col(parent_col).alias("_p_parents"),
        F.col(acl_col).alias("_p_acl"),
        F.col(curation_col).alias("_p_curation"),
    )
    for _ in range(max_depth):
        step = (
            cur.select("canonical_name", F.explode_outer("_parents").alias("_p"),
                       "_acl", "_curation")
            .join(broadcast(parents), F.col("_p") == F.col("_p_name"), "left")
            .groupBy("canonical_name")
            .agg(
                F.flatten(F.collect_list("_p_parents")).alias("_parents"),
                F.first("_acl").alias("_own_acl"),
                F.flatten(F.collect_list("_p_acl")).alias("_inherited_acl"),
                F.first("_curation").alias("_own_curation"),
                F.bool_or(F.coalesce(F.col("_p_curation"), F.lit(False))).alias("_parent_curation"),
            )
            .select(
                "canonical_name",
                F.col("_parents"),
                F.concat(F.col("_own_acl"), F.col("_inherited_acl")).alias("_acl"),
                (F.col("_own_curation") | F.col("_parent_curation")).alias("_curation"),
            )
        )
        # Fixpoint check on the tiny dim is a cheap driver-side count.
        if step.filter(F.size("_parents") > 0).limit(1).count() == 0:
            cur = step
            break
        cur = step
    return cur.select(
        "canonical_name",
        F.col("_acl").alias(acl_col),
        F.col("_curation").alias(curation_col),
    )


def anti_join_insert(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """J5/S8: rows of ``incoming`` whose key pair is absent from
    ``existing`` — the idempotent-append guard
    (``aws/dynamo_manager.py:359-366``: put_item guarded by
    ``Attr('source_id').not_exists()``)."""
    return incoming.join(existing.select(*keys).distinct(), on=list(keys), how="left_anti")
