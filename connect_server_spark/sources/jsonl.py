"""JSONL corpus source: the interchange format most training corpora
actually ship in (one JSON document per line, gzip-compressed shards —
the RedPajama/Dolma/C4-dump layout).

Spark-first contracts, each load-bearing at 100 TB:

* **Explicit schema, never inference.** ``inferSchema`` is a full extra
  pass over every byte before the real read; at corpus scale that
  doubles ingest I/O. :func:`read_jsonl_corpus` requires the schema.
* **PERMISSIVE + corrupt-record capture.** A crawl-adjacent dump WILL
  contain broken lines; FAILFAST kills a 6-hour job on one of them,
  DROPMALFORMED silently shrinks the corpus. The honest mode surfaces
  bad lines as rows (``_corrupt_record``) so telemetry counts them and
  curation decides.
* **``.gz`` shards are unsplittable** — one task per shard, so shard
  SIZE is the parallelism knob (the standard dump layout: many
  ~100 MB–1 GB shards). The reader documents rather than hides this;
  the fixture writer shards by count for the same reason
  ``warc_shard_files`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_jsonl_shards", "read_jsonl_corpus"]

CORRUPT_COL = "_corrupt_record"


def write_jsonl_shards(
    docs: DataFrame,
    shard_dir: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    corrupt_per_shard: int = 0,
    columns: list[str] | None = None,
) -> None:
    """Write ``docs`` as real ``shard-*.jsonl.gz`` files (driver-side
    gzip via ``toLocalIterator`` — bounded memory, one shard buffered at
    a time; each file lands by the unique-tmp atomic rename and a
    ``_SUCCESS`` marker commits the set last). ``corrupt_per_shard``
    plants that many non-JSON lines per shard so ingest tests exercise
    the PERMISSIVE contract with a known ground truth — sharding is
    ``pmod(id, n_shards)`` (a plain ``%`` keeps the dividend's sign, so
    negative ids would mint negative shard labels), and a shard no id
    hashes to emits NO file, so the planted-corruption ground truth is
    ``shards_present × corrupt_per_shard``, not ``n_shards ×
    corrupt_per_shard``. JSON escaping (newlines, quotes, unicode) is
    ``to_json``'s — line-per-record is safe for arbitrary text."""
    import gzip

    from connect_server_spark.fsutil import (
        write_bytes_atomic,
        write_text_atomic,
    )

    spark = docs.sparkSession
    cols = columns or docs.columns
    lines = (
        docs.select(
            F.pmod(F.col(id_col), F.lit(n_shards)).alias("_shard"),
            F.col(id_col).alias("_id"),
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("line"),
        )
        .orderBy("_shard", "_id")
    )

    def flush(shard: int, buf: list[str]) -> None:
        buf = buf + ["{not json" for _ in range(corrupt_per_shard)]
        write_bytes_atomic(
            spark,
            f"{shard_dir}/shard-{shard:05d}.jsonl.gz",
            gzip.compress(("\n".join(buf) + "\n").encode("utf-8")),
        )

    cur, buf = None, []
    for r in lines.toLocalIterator():
        if cur is not None and r["_shard"] != cur:
            flush(cur, buf)
            buf = []
        cur = r["_shard"]
        buf.append(r["line"])
    if cur is not None:
        flush(cur, buf)
    write_text_atomic(spark, f"{shard_dir}/_SUCCESS", "")


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Scan a JSONL shard directory with an EXPLICIT schema and the
    corrupt-record column attached: valid lines parse into the schema's
    columns, broken lines arrive with every schema column NULL and the
    raw line in ``_corrupt_record``. One task per ``.gz`` shard (gzip
    is unsplittable — size shards accordingly); line parsing is
    JVM-side Jackson inside the scan, no Python boundary."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("pathGlobFilter", "*.jsonl.gz")
        .json(path)
    )
