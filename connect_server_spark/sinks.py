"""Write-path sinks (SURVEY §2: S8, S9).

* ``idempotent_append`` — the conditional-insert discipline
  (``aws/dynamo_manager.py:339-377``): left-anti join against the
  current table state, then append. Safe to re-run: a crashed writer
  re-appends nothing.
* ``search_ingest`` — the search-index sink
  (``automate/minimus_mdf_flow.py:359-375``): records keyed by subject
  (versioned_source_id), overwrite-by-subject semantics via dynamic
  partition overwrite on a bounded subject bucket (hashing the subject
  into ``n_buckets`` keeps partition counts sane at 100 TB — one
  directory per subject would melt the metastore).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors.exceptions.base import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.operators.org import anti_join_insert

__all__ = [
    "fresh_rows",
    "idempotent_append",
    "search_ingest",
    "read_search_index",
    "write_feedstock",
    "read_feedstock",
]


def _is_path_not_found(exc: AnalysisException) -> bool:
    """True only for the "the table does not exist yet" read failure.

    Anything else (permissions, corrupt footer, transient storage error)
    must propagate: treating an arbitrary read failure as "first write"
    would silently drop the existing data under overwrite semantics."""
    cond = exc.getErrorClass() or ""
    return cond.startswith("PATH_NOT_FOUND") or "PATH_NOT_FOUND" in str(exc)


def fresh_rows(
    spark: SparkSession, incoming: DataFrame, path: str, keys: Sequence[str]
) -> DataFrame:
    """The read side of the S8 guard: rows of ``incoming`` whose key tuple
    is absent from the table at ``path``. Materialized once (checkpointed)
    so callers can count AND write without re-running the anti-join — the
    checkpoint also severs lineage from ``path``, which the append itself
    targets. Exposed for sinks that need the surviving rows themselves
    (the streaming ingest-dedup loop appends them to a second artifact)."""
    try:
        existing = spark.read.parquet(path).select(*keys)
        fresh = anti_join_insert(incoming, existing, keys)
    except AnalysisException as exc:
        if not _is_path_not_found(exc):
            raise  # a real read failure must not masquerade as first-write
        fresh = incoming  # first write: nothing to guard against
    return fresh.localCheckpoint(eager=True)


def idempotent_append(
    spark: SparkSession, incoming: DataFrame, path: str, keys: Sequence[str]
) -> int:
    """S8: append only rows whose key tuple is absent. Returns appended
    row count (the reference returns a duplicate error per row; batch
    semantics surface it as incoming-minus-appended)."""
    fresh = fresh_rows(spark, incoming, path, keys)
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(path)
    return n


def search_ingest(
    df: DataFrame, path: str, subject_col: str, n_buckets: int = 256
) -> None:
    """S9: upsert-by-subject into the search index.

    Dynamic partition overwrite rewrites only the hash buckets this batch
    touches; surviving rows of those buckets (subjects NOT in the batch)
    are carried over, so the operation is a true replace-by-subject. The
    I/O cost is proportional to touched buckets, not the index size."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch = df.withColumn(
        "subject_bucket", F.pmod(F.xxhash64(F.col(subject_col)), n_buckets)
    )
    try:
        existing = spark.read.parquet(path)
        affected = batch.select("subject_bucket").distinct()
        survivors = (
            existing.join(F.broadcast(affected), "subject_bucket")
            .join(batch.select(subject_col).distinct(), subject_col, "left_anti")
            .select(*batch.columns)
            # sever lineage from `path`: Spark refuses to overwrite a path
            # its own read plan references
            .localCheckpoint(eager=True)
        )
        out = survivors.unionByName(batch)
    except AnalysisException as exc:
        if not _is_path_not_found(exc):
            # Overwriting on a transient read failure would drop every
            # surviving subject in the touched buckets — fail loudly.
            raise
        out = batch  # first write
    out.write.mode("overwrite").partitionBy("subject_bucket").parquet(path)


def read_search_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("subject_bucket")


def write_feedstock(df: DataFrame, path: str) -> None:
    """Feedstock sink: the validator's scroll_id-addressed record stream
    (``tests/test_validator.py:165-247``) as newline-delimited JSON — the
    artifact the flow's SearchIngest step pulls over HTTPS
    (``automate/mdf_flow_def.json:102,302-303``). Partitioned JSONL: the
    write stays distributed (one file per task), and ``scroll_id`` stays
    the record address, independent of file layout."""
    df.write.mode("overwrite").json(path)


def read_feedstock(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a feedstock directory back. Pass ``schema`` to pin field
    types (JSONL carries no schema of its own); without it Spark infers,
    which is fine for the self-written artifact."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
