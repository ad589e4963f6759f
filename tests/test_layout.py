"""Z-order layout (`operators/layout.py`): multi-dimensional file
pruning from parquet footer stats. The payoff is mechanical, so the
pins measure it mechanically — `file_pruning_fraction` reads the same
min/max statistics a predicate-pushdown scan uses to skip files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connect_server_spark.operators.layout import (
    file_pruning_fraction,
    write_zordered,
    zorder_value,
)


def _grid(spark, n=4096):
    """Two independent uniform columns — the canonical z-order case."""
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 1000).alias("a"),
            ((F.xxhash64("id", F.lit(1)) % 1000) / 10.0).alias("b"),
        )
    )


def test_zorder_rewrite_is_lossless_and_prunes_both_columns(
    spark, tmp_path
):
    df = _grid(spark)
    zp = str(tmp_path / "z")
    sp = str(tmp_path / "s")
    write_zordered(df, zp, ["a", "b"], files=16)
    # baseline: single-key sort on `a` only
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(sp)
    )

    # lossless rewrite
    assert sorted(tuple(r) for r in spark.read.parquet(zp).collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # the z-value column is scaffolding, not persisted
    assert spark.read.parquet(zp).columns == df.columns

    probe = df.limit(1).collect()[0]
    z_a = file_pruning_fraction(zp, "a", probe.a)
    z_b = file_pruning_fraction(zp, "b", probe.b)
    s_a = file_pruning_fraction(sp, "a", probe.a)
    s_b = file_pruning_fraction(sp, "b", probe.b)
    # single-sort: tight on its key, nothing on the other
    assert s_a <= 2 / 16
    assert s_b == 1.0
    # z-order: BOTH columns prune most files (the trade: each a bit
    # looser than a dedicated sort, neither degenerate)
    assert z_a <= 0.5, (z_a, s_a)
    assert z_b <= 0.5, (z_b, s_b)


def test_zorder_value_is_pure_catalyst_and_handles_types(spark):
    """No Python boundary in the z-expression (it runs inside the write
    pipeline of every layout job), and timestamp columns interleave on
    their epoch position."""
    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
    )
    z = zorder_value(df, ["k", "ts"], bits=8)
    plan = (
        df.withColumn("_z", z)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    vals = df.withColumn("_z", z).select("_z").distinct().count()
    assert vals > 50  # real resolution, not a constant


def test_zorder_value_contracts(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(5).alias("const"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="at least one"):
        zorder_value(df, [])
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_value(df, ["id", "v"], bits=32)
    # constant column degrades to one stripe instead of crashing, and
    # the other column still provides resolution
    z = zorder_value(df, ["const", "v"], bits=8)
    assert df.select(z.alias("z")).distinct().count() == 10


def test_zorder_nulls_cluster_at_origin(spark, tmp_path):
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .alias("a"),
        (F.col("id") % 50).alias("b"),
    )
    zp = str(tmp_path / "z")
    write_zordered(df, zp, ["a", "b"], files=8)
    got = spark.read.parquet(zp)
    assert got.filter(F.col("a").isNull()).count() == 20
    assert got.count() == 200


def test_events_zorder_scan_matches_duckdb_mirror(spark, sf_dir):
    """The registered query's DuckDB oracle (rows-only in the driver
    window — the mirror runs here)."""
    import duckdb

    from connect_server_spark.queries.scan_queries import (
        EVENTS_ZORDER_SCAN_ORACLE_SQL,
        events_zorder_scan,
    )

    got = sorted(
        tuple(r) for r in events_zorder_scan(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(EVENTS_ZORDER_SCAN_ORACLE_SQL).fetchall())
    assert got == want and len(got) > 0

    # the demonstration only demonstrates if BOTH predicates reach the
    # parquet scan (range comparisons push; an expression would not)
    df = events_zorder_scan(spark, sf_dir)
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = qe.explainString(mode.fromString("formatted"))
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThanOrEqual(user_id,4)" in pushed
    assert "LessThanOrEqual(value,4.0)" in pushed
    # and column pruning holds: the scan reads only the projected four
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert set(read_schema.split("struct<")[1].rstrip(">").split(",")) == {
        "event_id:bigint", "user_id:bigint", "event_type:string",
        "value:double",
    }


def test_maintain_zorder_measures_decay_and_recluster_restores_pruning(
    spark, tmp_path
):
    """The layout lifecycle loop: a fresh z-table measures healthy and
    maintenance DOES NOTHING; interleaved appends decay the footer
    ranges toward full overlap; maintenance then fires, re-clusters
    behind the generation pointer (rows identical, old snapshot
    readable as grace), and both columns prune again."""
    from connect_server_spark.fsutil import resolve_store
    from connect_server_spark.operators.layout import (
        clustering_decay,
        maintain_zorder,
    )

    root = str(tmp_path / "t")
    df = _grid(spark, 4096)
    write_zordered(df, root, ["a", "b"], files=16)
    assert clustering_decay(root, "a") < 0.5
    assert maintain_zorder(spark, root, ["a", "b"]) is False  # healthy
    assert resolve_store(spark, root) == root  # still flat — no rewrite

    # interleaved appends: each new file spans the whole value range
    extra = _grid(spark, 2048).select(
        (F.col("id") + 100000).alias("id"), "a", "b"
    )
    extra.repartition(8).write.mode("append").parquet(root)
    decayed_a = clustering_decay(root, "a")
    assert decayed_a > 0.5  # appends wrecked the clustering

    fired = maintain_zorder(spark, root, ["a", "b"])
    assert fired is True
    live = resolve_store(spark, root)
    assert live != root  # pointer-published re-layout
    # back under the healthy threshold on both columns (a z-layout's
    # per-column overlap is inherently ~sqrt-resolution, not zero)
    assert clustering_decay(live, "a") < 0.5 < decayed_a
    assert clustering_decay(live, "b") < 0.5

    # lossless: union of base + appends, exactly
    got = sorted(tuple(r) for r in spark.read.parquet(live).collect())
    want = sorted(
        tuple(r) for r in df.unionByName(extra).collect()
    )
    assert got == want

    # healthy again: a second maintenance pass is a no-op (no new gen)
    assert maintain_zorder(spark, root, ["a", "b"]) is False
    assert resolve_store(spark, root) == live


def test_append_after_publish_lands_in_live_generation(spark, tmp_path):
    """Appends must follow the pointer: rows appended through
    append_zordered_store after a maintenance publish are visible to
    resolving readers AND survive the next maintenance publish — a
    flat append to the root would be silently GC'd as legacy."""
    from connect_server_spark.fsutil import resolve_store
    from connect_server_spark.operators.layout import (
        append_zordered_store,
        maintain_zorder,
    )

    root = str(tmp_path / "t")
    write_zordered(_grid(spark, 2048), root, ["a", "b"], files=8)
    # decay + maintain → store upgrades to generational
    _grid(spark, 1024).select(
        (F.col("id") + 50000).alias("id"), "a", "b"
    ).repartition(8).write.mode("append").parquet(root)
    assert maintain_zorder(spark, root, ["a", "b"]) is True

    late = spark.createDataFrame(
        [(999999, 1, 1.0)], "id long, a long, b double"
    )
    append_zordered_store(late, root)
    live = resolve_store(spark, root)
    assert (
        spark.read.parquet(live).filter(F.col("id") == 999999).count() == 1
    )
    # the append decays the layout; the next maintenance folds it in
    # rather than deleting it
    assert maintain_zorder(spark, root, ["a", "b"], decay_threshold=0.0)
    live2 = resolve_store(spark, root)
    assert live2 != live
    assert (
        spark.read.parquet(live2).filter(F.col("id") == 999999).count() == 1
    )
    assert spark.read.parquet(live2).count() == 2048 + 1024 + 1


def test_footer_stats_resolve_leaf_columns_on_nested_schemas(
    spark, tmp_path
):
    """Review pin: parquet footer stats index LEAF columns — a struct
    column ahead of the z-columns must not shift the lookup onto the
    wrong column's min/max (the silent way maintenance stops firing),
    and a typo'd column gets a named error, not a bare IndexError."""
    from connect_server_spark.operators.layout import clustering_decay

    df = spark.range(256).select(
        F.struct(
            (F.col("id") % 2).alias("x"), F.lit(7).alias("y")
        ).alias("meta"),
        F.col("id").alias("a"),
        (F.col("id") % 4).alias("b"),
    )
    p = str(tmp_path / "nested")
    df.repartitionByRange(4, "a").sortWithinPartitions("a").write.parquet(p)
    # `a` is range-sorted: its decay must read ~0, which only happens if
    # the lookup hit a's OWN stats (meta.x/meta.y spans would overlap)
    assert clustering_decay(p, "a") < 0.2
    assert clustering_decay(p, "b") > 0.5  # b interleaves — and resolves
    assert file_pruning_fraction(p, "a", 0) <= 0.5
    with pytest.raises(ValueError, match="not found among parquet leaves"):
        clustering_decay(p, "nope")


def test_maintain_zorder_skewed_key_triggers_and_pruning_survives(
    spark, tmp_path
):
    """r9 verdict ask #7 — the crawl-domain shape: ~90% of rows under
    ONE hot key. Three pins: (1) a FRESH skewed z-layout measures
    healthy (pure hot-key files are the unavoidable floor, not decay —
    counting them would rewrite forever), (2) interleaved appends still
    trip the decay trigger despite the skew, and (3) after the
    re-cluster a cold-key point predicate prunes to a sliver while the
    hot key reads roughly its own (unavoidable) share of files and no
    decay re-fires — the maintenance loop converges instead of
    thrashing."""
    from connect_server_spark.fsutil import resolve_store
    from connect_server_spark.operators.layout import (
        clustering_decay,
        maintain_zorder,
    )

    def skewed(n, base=0):
        return spark.range(base, base + n).select(
            "id",
            F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 9, F.lit(7))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)))
            .alias("a"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) / 10.0)
            .alias("b"),
        )

    root = str(tmp_path / "t")
    df = skewed(6000)
    write_zordered(df, root, ["a", "b"], files=16)

    # (1) fresh skewed layout: healthy — maintenance must NOT fire
    assert clustering_decay(root, "a") < 0.5
    assert maintain_zorder(spark, root, ["a", "b"]) is False
    assert resolve_store(spark, root) == root

    # (2) interleaved appends (every append file spans everything,
    # hot rows included) trip the trigger even under skew
    extra = skewed(3000, base=100000)
    extra.repartition(8).write.mode("append").parquet(root)
    assert clustering_decay(root, "a") > 0.5
    assert maintain_zorder(spark, root, ["a", "b"]) is True
    live = resolve_store(spark, root)
    assert live != root

    # (3a) lossless
    got = sorted(tuple(r) for r in spark.read.parquet(live).collect())
    want = sorted(tuple(r) for r in df.unionByName(extra).collect())
    assert got == want

    # (3b) a COLD key prunes to a sliver even though 90% of rows share
    # one value; the HOT key necessarily reads nearly every file — it
    # IS ~90% of the rows, so that is the floor no layout can shrink
    # (which is exactly why the decay metric must not count it)
    cold = [
        r.a for r in spark.read.parquet(live)
        .filter(F.col("a") != 7).limit(1).collect()
    ][0]
    assert file_pruning_fraction(live, "a", cold) <= 0.35
    assert file_pruning_fraction(live, "a", 7) >= 0.8  # the real floor

    # (3c) converged: the loop is done, not thrashing
    assert clustering_decay(live, "a") < 0.5
    assert maintain_zorder(spark, root, ["a", "b"]) is False
    assert resolve_store(spark, root) == live
