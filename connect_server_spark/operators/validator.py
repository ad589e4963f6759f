"""Validator/feedstock operators: the legacy Validator's dataset→feedstock
semantics (golden outputs ``tests/test_validator.py:90-348``).

* A5 ``dataset_total_size`` — sum of ``files[].length`` across a dataset's
  records (``tests/test_validator.py:174-175,224-226``).
* A6 ``derive_elements`` — composition string → sorted distinct element
  symbols (``FFO2`` → ``['F','O']``, ``tests/test_validator.py:265-267``).
* A7 ``feedstock`` — one dataset header row + N record rows, each stamped
  a contiguous ``scroll_id`` (the engine's declared semantic; the
  reference allows gaps after rejected records — SURVEY §7 hard-parts #2).
* A4 ``distinct_submitters`` — ``collect_set`` per source.

The reference's Validator is a Python generator (1 dataset → N records);
set-oriented it is a union + window, with the window partitioned by
dataset key — the sort is per-dataset, bounded by record count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "file_sizes_sum",
    "dataset_total_size",
    "derive_elements",
    "feedstock",
    "distinct_submitters",
]


def file_sizes_sum(files: Column) -> Column:
    """Per-record total of ``files[].length`` (missing lengths count 0)."""
    return F.aggregate(
        files,
        F.lit(0).cast("long"),
        lambda acc, f: acc + F.coalesce(f["length"], F.lit(0)).cast("long"),
    )


def dataset_total_size(
    records: DataFrame, dataset_key: str, files_col: str
) -> DataFrame:
    """A5: records carry ``files`` arrays; the dataset's ``total_size`` is
    the sum over all its records. Partial-aggregates map-side."""
    return (
        records.select(
            F.col(dataset_key), file_sizes_sum(F.col(files_col)).alias("_sz")
        )
        .groupBy(dataset_key)
        .agg(F.sum("_sz").alias("total_size"))
    )


def derive_elements(composition: Column) -> Column:
    """A6: chemical composition → sorted distinct element symbols."""
    return F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(composition, F.lit("([A-Z][a-z]?)"), F.lit(1))
        )
    )


def feedstock(
    datasets: DataFrame,
    records: DataFrame,
    dataset_key: str,
    order_col: str,
) -> DataFrame:
    """A7: feedstock stream — per dataset, a ``dataset`` header row with
    ``scroll_id`` 0 followed by its records as ``record`` rows with
    contiguous scroll_ids 1..N (ordered by ``order_col``).

    Output: (dataset_key, scroll_id, resource_type, record_ref)."""
    header = datasets.select(
        F.col(dataset_key),
        F.lit(0).alias("scroll_id"),
        F.lit("dataset").alias("resource_type"),
        F.lit(None).cast("long").alias("record_ref"),
    )
    w = Window.partitionBy(dataset_key).orderBy(F.col(order_col).asc())
    recs = records.select(
        F.col(dataset_key),
        F.row_number().over(w).cast("int").alias("scroll_id"),
        F.lit("record").alias("resource_type"),
        F.col(order_col).cast("long").alias("record_ref"),
    )
    return header.unionByName(recs)


def distinct_submitters(
    status: DataFrame, key: str, submitter_col: str
) -> DataFrame:
    """A4: sorted distinct submitters per source as CSV (set semantics,
    deterministic output for the hash gate)."""
    return status.groupBy(key).agg(
        F.array_join(
            F.array_sort(F.collect_set(submitter_col)), ","
        ).alias("submitters_csv"),
        F.size(F.collect_set(submitter_col)).alias("n_submitters"),
    )
