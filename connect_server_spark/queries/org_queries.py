"""Driver queries for the organization-join family (SURVEY §2: S4, J1,
J3, J4, J5/S8) with DuckDB oracle twins. S4 (org registry scan with
name-or-alias filter and 0/>1-match errors) is the load+filter stage of
``org_resolve``.

The org registry is synthesized from ``nation`` (child orgs) and ``region``
(parent orgs): nation org ``lower(n_name)`` has aliases ``n{key}`` and
``{name}-org`` and is parented by ``region-{n_regionkey}``. Nation 0 and
region 0 both carry alias ``ambiguous`` so duplicate-match detection is
exercised (``aws/organization.py:43-58`` errors on >1 match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.functions.uris import lookup_http_host
from connect_server_spark.operators.org import (
    anti_join_insert,
    inherit_parent_rules,
    resolve_org,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table

_KEY_MOD = 997


def _org_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    nation_orgs = nation.select(
        F.lower(F.col("n_name")).alias("canonical_name"),
        F.when(
            F.col("n_nationkey") == 0,
            F.array(
                F.concat(F.lit("n"), F.col("n_nationkey").cast("string")),
                F.concat(F.lower(F.col("n_name")), F.lit("-org")),
                F.lit("ambiguous"),
            ),
        )
        .otherwise(
            F.array(
                F.concat(F.lit("n"), F.col("n_nationkey").cast("string")),
                F.concat(F.lower(F.col("n_name")), F.lit("-org")),
            )
        )
        .alias("aliases"),
        F.array(F.concat(F.lit("grp-"), F.col("n_nationkey").cast("string"))).alias("acl"),
        (F.col("n_nationkey") % 3 == 0).alias("curation"),
        F.array(
            F.concat(F.lit("region-"), F.col("n_regionkey").cast("string"))
        ).alias("parent_organizations"),
    )
    region_orgs = region.select(
        F.concat(F.lit("region-"), F.col("r_regionkey").cast("string")).alias(
            "canonical_name"
        ),
        F.when(
            F.col("r_regionkey") == 0, F.array(F.lower(F.col("r_name")), F.lit("ambiguous"))
        )
        .otherwise(F.array(F.lower(F.col("r_name"))))
        .alias("aliases"),
        F.array(F.concat(F.lit("racl-"), F.col("r_regionkey").cast("string"))).alias("acl"),
        (F.col("r_regionkey") % 2 == 0).alias("curation"),
        F.array().cast("array<string>").alias("parent_organizations"),
    )
    return nation_orgs.unionByName(region_orgs)


_ORG_REGISTRY_SQL = """
      SELECT
        lower(n_name) AS canonical_name,
        CASE WHEN n_nationkey = 0
          THEN [concat('n', CAST(n_nationkey AS VARCHAR)),
                concat(lower(n_name), '-org'), 'ambiguous']
          ELSE [concat('n', CAST(n_nationkey AS VARCHAR)),
                concat(lower(n_name), '-org')] END AS aliases,
        [concat('grp-', CAST(n_nationkey AS VARCHAR))] AS acl,
        n_nationkey % 3 = 0 AS curation,
        [concat('region-', CAST(n_regionkey AS VARCHAR))] AS parent_organizations
      FROM nation
      UNION ALL
      SELECT
        concat('region-', CAST(r_regionkey AS VARCHAR)) AS canonical_name,
        CASE WHEN r_regionkey = 0 THEN [lower(r_name), 'ambiguous']
             ELSE [lower(r_name)] END AS aliases,
        [concat('racl-', CAST(r_regionkey AS VARCHAR))] AS acl,
        r_regionkey % 2 = 0 AS curation,
        CAST([] AS VARCHAR[]) AS parent_organizations
      FROM region
"""

_ORG_LOOKUP_SQL = f"""
      SELECT unnest(list_prepend(canonical_name, aliases)) AS match_name,
             canonical_name, curation
      FROM ({_ORG_REGISTRY_SQL})
"""


def org_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: submissions joined to the org registry by canonical name or
    alias via an exploded-match-key broadcast equi-join, with unknown-org
    and duplicate-match error columns."""
    customer = load_table(spark, "customer", sf_dir)
    submissions = customer.select(
        F.col("c_custkey"),
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.concat(F.lit("n"), (F.col("c_nationkey")).cast("string")),
        )
        .when(
            F.col("c_custkey") % 4 == 1,
            F.concat(F.lit("region-"), (F.col("c_nationkey") % 5).cast("string")),
        )
        .when(F.col("c_custkey") % 4 == 2, F.lit("ambiguous"))
        .otherwise(F.concat(F.lit("unknown-org-"), F.col("c_custkey").cast("string")))
        .alias("org_ref"),
    )
    orgs = _org_registry(spark, sf_dir)
    return resolve_org(submissions, orgs, "org_ref", ["curation"])


register(
    "org_resolve",
    org_resolve,
    sql=f"""
    WITH submissions AS (
      SELECT c_custkey,
        CASE
          WHEN c_custkey % 4 = 0 THEN concat('n', CAST(c_nationkey AS VARCHAR))
          WHEN c_custkey % 4 = 1 THEN concat('region-', CAST(c_nationkey % 5 AS VARCHAR))
          WHEN c_custkey % 4 = 2 THEN 'ambiguous'
          ELSE concat('unknown-org-', CAST(c_custkey AS VARCHAR))
        END AS org_ref
      FROM customer
    ),
    lookup AS ({_ORG_LOOKUP_SQL}),
    counts AS (
      SELECT match_name, count(*) AS n FROM lookup GROUP BY match_name
    )
    SELECT
      s.c_custkey, s.org_ref, l.canonical_name, l.curation,
      l.canonical_name IS NOT NULL AS org_found,
      CASE
        WHEN l.canonical_name IS NULL THEN 'unknown organization'
        WHEN c.n > 1 THEN 'duplicate organization match'
      END AS org_error
    FROM submissions s
    LEFT JOIN lookup l ON s.org_ref = l.match_name
    LEFT JOIN counts c ON s.org_ref = c.match_name
    """,
)


def org_parent_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: registry with ancestor rules merged in — acl appended (own
    first), curation OR-ed upward."""
    merged = inherit_parent_rules(_org_registry(spark, sf_dir))
    return merged.select(
        "canonical_name",
        F.array_join("acl", ",").alias("acl_csv"),
        "curation",
    )


# r11 fifth rotation: demoted (frozen green since r1); oracle preserved
# verbatim in tests/test_entry_oracle.py.
ORG_PARENT_RULES_ORACLE_SQL = f"""
    WITH orgs AS ({_ORG_REGISTRY_SQL})
    SELECT
      o.canonical_name,
      CASE WHEN p.canonical_name IS NULL
           THEN array_to_string(o.acl, ',')
           ELSE array_to_string(list_concat(o.acl, p.acl), ',') END AS acl_csv,
      o.curation OR coalesce(p.curation, false) AS curation
    FROM orgs o
    LEFT JOIN orgs p ON len(o.parent_organizations) > 0
                    AND o.parent_organizations[1] = p.canonical_name
    """

register("org_parent_rules", org_parent_rules, defer=True)


def status_insert_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/S8: incoming (source_id, '1.0') rows left-anti-joined against the
    existing status table — only absent key pairs survive to be appended."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    incoming = customer.select(
        F.col("c_custkey"),
        F.concat(F.lit("src_"), (F.col("c_custkey") % _KEY_MOD).cast("string")).alias(
            "source_id"
        ),
        F.lit("1.0").alias("version"),
    )
    existing = orders.select(
        F.concat(F.lit("src_"), (F.col("o_custkey") % _KEY_MOD).cast("string")).alias(
            "source_id"
        ),
        F.concat(
            (F.col("o_orderkey") % 3 + 1).cast("string"),
            F.lit("."),
            (F.col("o_orderkey") % 17).cast("string"),
        ).alias("version"),
    )
    return anti_join_insert(incoming, existing, ["source_id", "version"])


register(
    "status_insert_guard",
    status_insert_guard,
    sql=f"""
    WITH incoming AS (
      SELECT c_custkey,
             concat('src_', CAST(c_custkey % {_KEY_MOD} AS VARCHAR)) AS source_id,
             '1.0' AS version
      FROM customer
    ),
    existing AS (
      SELECT concat('src_', CAST(o_custkey % {_KEY_MOD} AS VARCHAR)) AS source_id,
             concat(CAST(o_orderkey % 3 + 1 AS VARCHAR), '.',
                    CAST(o_orderkey % 17 AS VARCHAR)) AS version
      FROM orders
    )
    SELECT source_id, version, c_custkey FROM incoming i
    WHERE NOT EXISTS (
      SELECT 1 FROM existing e
      WHERE e.source_id = i.source_id AND e.version = i.version
    )
    """,
)


_MDF_EP = "82f1b5c6-6e9b-11e5-ba47-22000b92c6ec"


def endpoint_http_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: endpoint → HTTP host lookup (vanity-host dim join + generic
    fallback; goldens ``tests/test_utils.py:181-198``)."""
    supplier = load_table(spark, "supplier", sf_dir)
    k = F.col("s_suppkey")
    generic_ep = F.concat(
        F.lit("00000000-0000-0000-0000-"),
        F.lpad((k % 1000000).cast("string"), 12, "0"),
    )
    location = (
        F.when(k % 4 == 0, F.lit(_MDF_EP))
        .when(k % 4 == 1, generic_ep)
        .when(k % 4 == 2, F.concat(F.lit("globus://"), generic_ep, F.lit("/data/path")))
        .otherwise(F.lit("not-an-endpoint"))
    )
    return supplier.select(
        k.alias("s_suppkey"),
        location.alias("location"),
        lookup_http_host(location).alias("http_host"),
    )


# Demoted from the gated-50 window in r10 (third rotation — displaced
# by events_overlap_join): semantics frozen since r3 and pinned by the
# preserved-oracle mirror in tests/test_entry_oracle.py.
ENDPOINT_HTTP_HOST_ORACLE_SQL = f"""
    WITH loc AS (
      SELECT s_suppkey,
        concat('00000000-0000-0000-0000-',
               lpad(CAST(s_suppkey % 1000000 AS VARCHAR), 12, '0')) AS generic_ep,
        CASE
          WHEN s_suppkey % 4 = 0 THEN '{_MDF_EP}'
          WHEN s_suppkey % 4 = 1 THEN concat('00000000-0000-0000-0000-',
               lpad(CAST(s_suppkey % 1000000 AS VARCHAR), 12, '0'))
          WHEN s_suppkey % 4 = 2 THEN concat('globus://',
               concat('00000000-0000-0000-0000-',
                      lpad(CAST(s_suppkey % 1000000 AS VARCHAR), 12, '0')),
               '/data/path')
          ELSE 'not-an-endpoint'
        END AS location
      FROM supplier
    )
    SELECT s_suppkey, location,
      CASE
        WHEN s_suppkey % 4 = 3 THEN NULL
        WHEN s_suppkey % 4 = 0 THEN 'https://data.materialsdatafacility.org'
        ELSE concat('https://', generic_ep, '.e.globus.org')
      END AS http_host
    FROM loc
"""

register("endpoint_http_host", endpoint_http_host, defer=True)
