"""Driver queries for the scan/filter/project surface (SURVEY §2: S5-S7,
P1-P11) — the reference's ``scan_table`` expression language run against the
``orders``/``part`` tables as status-table analogs.

Reference: ``aws/dynamo_manager.py:127-286`` (scan), ``aws/submissions.py:54-85``
(user-scoped read path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.plans import scan_table, user_scoped_filters
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table


def scan_status_read_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POST /submissions analog: projection + ^, ==, > filters (P1, P2, P4, P6)."""
    orders = load_table(spark, "orders", sf_dir)
    return scan_table(
        orders,
        fields=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
        filters=[
            ("o_orderstatus", "==", "O"),
            ("o_totalprice", ">", 150000.0),
            ("o_orderpriority", "^", "1"),
        ],
    )


register(
    "scan_status_read_path",
    scan_status_read_path,
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice > 150000.0
      AND o_orderpriority LIKE '1%'
    """,
)


def scan_ops_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining filter ops on one scan: * contains, [] between, in, != (P3, P5, P7, P8, P9)."""
    part = load_table(spark, "part", sf_dir)
    return scan_table(
        part,
        fields=["p_partkey", "p_name", "p_brand", "p_type", "p_size"],
        filters=[
            ("p_name", "*", "r"),
            ("p_size", "[]", [10, 30]),
            ("p_brand", "in", ["Brand#1", "Brand#2", "Brand#3", "Brand#4"]),
            ("p_type", "!=", "ECONOMY"),
        ],
    )


register(
    "scan_ops_matrix",
    scan_ops_matrix,
    sql="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_name LIKE '%r%'
      AND p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4')
      AND p_type <> 'ECONOMY'
    """,
)


def scan_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``('f','==',None)`` = field absent / ``('f','!=',None)`` = present (P4/P5
    None-handling, ``aws/dynamo_manager.py:195-205``).

    Both presence classes come out of ONE table pass: the two
    filter-compiler branches become a classifier column and a single
    residual filter, instead of a self-union that scans ``orders`` twice
    (at 100× data that halves the I/O)."""
    from connect_server_spark.plans import compile_filters

    orders = load_table(spark, "orders", sf_dir).withColumn(
        "maybe_priority", F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    )
    absent_pred = compile_filters(orders, [("maybe_priority", "==", None)])
    present_pred = compile_filters(
        orders, [("maybe_priority", "!=", None), ("o_orderstatus", "==", "F")]
    )
    presence = (
        F.when(absent_pred, F.lit("absent"))
        .when(present_pred, F.lit("present"))
    )
    return (
        orders.select(F.col("o_orderkey"), presence.alias("presence"))
        .filter(F.col("presence").isNotNull())
    )


register(
    "scan_null_semantics",
    scan_null_semantics,
    sql="""
    WITH s AS (
      SELECT o_orderkey, o_orderstatus,
             nullif(o_orderpriority, '1-URGENT') AS maybe_priority
      FROM orders
    )
    SELECT o_orderkey, 'absent' AS presence FROM s WHERE maybe_priority IS NULL
    UNION ALL
    SELECT o_orderkey, 'present' AS presence FROM s
    WHERE maybe_priority IS NOT NULL AND o_orderstatus = 'F'
    """,
)


def scan_user_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level security conjunct prepended to client filters (P11,
    ``aws/submissions.py:73-76``); user_id analog = o_custkey."""
    orders = load_table(spark, "orders", sf_dir)
    filters = user_scoped_filters(
        [("o_totalprice", ">", 50000.0)], 1, field="o_custkey"
    )
    return scan_table(
        orders, fields=["o_orderkey", "o_custkey", "o_totalprice"], filters=filters
    )


register(
    "scan_user_scoped",
    scan_user_scoped,
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey = 1 AND o_totalprice > 50000.0
    """,
)


def scan_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: key lookup — the ``get_item (source_id, version)`` point read
    (``aws/dynamo_manager.py:328-337``) as an equality scan on both key
    parts. Both conjuncts push to the parquet reader, so at scale this is
    a partition-pruned point probe, not a table pass."""
    orders = load_table(spark, "orders", sf_dir)
    status = orders.select(
        F.concat(F.lit("src_"), (F.col("o_custkey") % 997).cast("string")).alias(
            "source_id"
        ),
        F.concat(
            (F.col("o_orderkey") % 3 + 1).cast("string"),
            F.lit("."),
            (F.col("o_orderkey") % 17).cast("string"),
        ).alias("version"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    return scan_table(
        status,
        fields=["source_id", "version", "o_orderkey", "o_totalprice"],
        filters=[("source_id", "==", "src_42"), ("version", "==", "3.12")],
    )


register(
    "scan_point_read",
    scan_point_read,
    sql="""
    WITH status AS (
      SELECT concat('src_', CAST(o_custkey % 997 AS VARCHAR)) AS source_id,
             concat(CAST(o_orderkey % 3 + 1 AS VARCHAR), '.',
                    CAST(o_orderkey % 17 AS VARCHAR)) AS version,
             o_orderkey, o_totalprice
      FROM orders
    )
    SELECT source_id, version, o_orderkey, o_totalprice
    FROM status WHERE source_id = 'src_42' AND version = '3.12'
    """,
)
