"""Local mini-oracle: run a Spark DataFrame and a DuckDB SQL string over the
same parquet tables and compare row-count + column names + values, the same
way the driver's t2 gate does (order-insensitive).

Floats are compared with a small relative tolerance here; queries intended
for the driver's exact value-hash should already emit hash-stable values
(ints, strings, raw pass-through doubles, or integer-cents aggregates).
"""

from __future__ import annotations

import math
import os

import duckdb

from connect_server_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant digits for order-insensitive compare
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def assert_matches_oracle(spark_df, sql: str, sf_dir: str):
    con = duckdb_connection(sf_dir)
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_norm = _normalize(s_rows, s_cols)
    o_norm = _normalize(o_rows, o_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, o_norm) if a != b
    ]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
