"""Tests for storage-layout helpers: bucketed co-located joins (no
Exchange) and salted skew aggregation."""

import pytest
from pyspark.sql import functions as F

from connect_server_spark.storage import (
    read_table,
    salted_collect_set,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner away from broadcast so the bucket-join
    effect (no shuffle on either SMJ side) is observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    status = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("source_id"), F.col("id").alias("payload")
    )
    subs = spark.range(0, 200).select(
        (F.col("id") % 97).alias("source_id"), F.col("id").alias("sub")
    )
    write_bucketed(status, "t_status_b", "source_id", buckets=8)
    write_bucketed(subs, "t_subs_b", "source_id", buckets=8)
    try:
        joined = read_table(spark, "t_status_b").join(
            read_table(spark, "t_subs_b"), "source_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # co-location must not change results
        assert joined.count() == status.join(subs, "source_id").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_status_b")
        spark.sql("DROP TABLE IF EXISTS t_subs_b")


def test_salted_collect_set_matches_unsalted(spark):
    df = spark.createDataFrame(
        [("hot", f"u{i % 7}") for i in range(200)] + [("cold", "u1")],
        ["k", "v"],
    )
    salted = {
        r.k: r.v_set for r in salted_collect_set(df, "k", "v", salt=8).collect()
    }
    plain = {
        r.k: sorted(r.s)
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    assert salted == plain


def test_write_partitioned_prunes_at_read(spark, sf_dir, tmp_path):
    """A key filter over the hive-partitioned layout becomes a
    PartitionFilter — directories prune before any parquet footer is
    touched."""
    from connect_server_spark.storage import write_partitioned
    from connect_server_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, "lang")

    filtered = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    want = docs.filter(F.col("lang") == "en").count()
    assert filtered.count() == want
