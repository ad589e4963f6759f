"""Deterministic per-epoch training shuffle (`operators/training.py`):
the keyed-hash reshard every large-scale training pipeline runs before
each epoch. md5 is bit-identical across Spark / DuckDB / hashlib, so
the oracle recomputes the EXACT assignment, not a proxy."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from connect_server_spark.operators.training import epoch_shuffle
from connect_server_spark.queries.release_queries import (
    TRAINING_EPOCH_SHUFFLE_ORACLE_SQL,
    training_epoch_shuffle,
)


def test_epoch_shuffle_matches_duckdb_mirror(spark, sf_dir):
    """Shard AND in-shard position, exactly, against the SQL twin."""
    got = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in training_epoch_shuffle(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(TRAINING_EPOCH_SHUFFLE_ORACLE_SQL).fetchall())
    )
    assert len(got) > 0
    assert got == want


def test_epoch_shuffle_matches_hashlib_reference(spark):
    """Python-reference recompute (hashlib md5) on a small corpus —
    the engine-independent ground truth behind the SQL mirror."""
    import hashlib

    ids = list(range(100, 140))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r.id: (r.shard, r.pos)
        for r in epoch_shuffle(df, "id", epoch=7, n_shards=4).collect()
    }

    keyed = [
        (hashlib.md5(f"7:{i}".encode()).hexdigest(), i) for i in ids
    ]
    want = {}
    by_shard: dict = {}
    for h, i in sorted(keyed):
        s = int(h[:8], 16) % 4
        by_shard.setdefault(s, []).append(i)
        want[i] = (s, len(by_shard[s]))
    assert got == want


def test_epoch_shuffle_deterministic_and_epochs_decorrelated(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")

    def order(epoch):
        return sorted(
            (r.id, r.shard, r.pos)
            for r in epoch_shuffle(df, "id", epoch, 8).collect()
        )

    # reruns identical (retry-safe: no rand() anywhere)
    assert order(1) == order(1)
    # different epochs re-draw the order: most rows move
    a = {i: (s, p) for i, s, p in order(1)}
    b = {i: (s, p) for i, s, p in order(2)}
    moved = sum(1 for i in a if a[i] != b[i])
    assert moved > 400, f"epochs barely decorrelated: {moved}/500"


def test_epoch_shuffle_shards_are_balanced_and_positions_dense(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], "id long")
    out = epoch_shuffle(df, "id", epoch=5, n_shards=8)
    sizes = {
        r.shard: r.n
        for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(8))  # every shard drawn
    assert max(sizes.values()) <= 1.25 * min(sizes.values()), sizes
    # positions are a dense 1..n ranking per shard (a dataloader seeks
    # by position — gaps or dups would skip/double-read documents)
    dense = out.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.count_distinct("pos").alias("d"),
    )
    for r in dense.collect():
        assert (r.lo, r.hi, r.d) == (1, r.n, r.n)


def test_epoch_shuffle_plan_is_one_exchange_no_python(spark):
    """The 100 TB shape: assignment is scan-stage Catalyst; the only
    data movement is the one hash-partition Exchange the window needs
    (rows move once, straight to their shard)."""
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    plan = (
        epoch_shuffle(df, "id", epoch=1, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan


def test_epoch_shuffle_rejects_bad_shards(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(df, "id", epoch=1, n_shards=0)
