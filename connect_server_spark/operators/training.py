"""Deterministic per-epoch training-data shuffling.

Dataloaders want a DIFFERENT pseudo-random document order every epoch,
reproducible across reruns and failures, without ever materializing a
permutation — at 100 TB a stored permutation is another corpus. The
standard trick (every large-scale training pipeline ships a variant):
order by a keyed hash of (epoch, id). Changing the epoch re-keys the
hash and yields a fresh decorrelated order; the hash is a pure column
expression, so the "shuffle" costs exactly one hash-partition Exchange
(rows move once, straight to their output shard) plus a per-shard
sort — the same I/O a dataloader re-shard pays anyway, with zero
driver state and task-retry determinism for free (no ``rand()``).

MD5 is used (not xxhash64) deliberately: it is bit-identical across
Spark, DuckDB and ``hashlib``, so the assignment is EXACTLY
SQL-mirrorable — the oracle recomputes shard and position, not a
proxy. Crypto strength is irrelevant here; cross-engine determinism
is the property being bought.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["epoch_shuffle"]


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int,
    pos_col: str = "pos",
    shard_col: str = "shard",
) -> DataFrame:
    """Assign every row a ``(shard, pos)`` for this ``epoch``: shard =
    the first 8 hex digits of ``md5(epoch:id)`` mod ``n_shards``, pos =
    the row's rank inside its shard under the full-hash order (ties —
    md5 collisions on the 32-char key — broken by id, so the output is
    a total order regardless). A dataloader reads shard ``k`` in
    ``pos`` order; across epochs every shard/order is re-drawn.

    One Exchange (hash-partition by shard) + per-shard sort; the hash
    and shard id are scan-stage Catalyst expressions. Deterministic
    under task retry and across engines (exact DuckDB mirror in
    ``tests/test_epoch_shuffle.py``)."""
    if n_shards < 1:
        raise ValueError(f"epoch_shuffle: n_shards={n_shards} must be >= 1")
    h = F.md5(
        F.concat_ws(":", F.lit(int(epoch)).cast("string"),
                    F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_eshuf_h"), F.col(id_col)
    )
    return (
        df.withColumn("_eshuf_h", h)
        .withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w))
        .drop("_eshuf_h")
    )
