"""Local pre-flight for the driver's correctness gate.

Runs every ``oracle_sql()``-gated query from ``__spark_entry__`` at
sf0.01 through BOTH engines — the Spark implementation and the DuckDB
oracle over the same parquet tables — and compares row count, sorted
column names, and a canonicalized value digest (columns sorted by name,
rows sorted, floats rounded to 6 significant decimals so engine-level
float formatting differences don't false-alarm).

Usage::

    python tools/check_oracles.py [--sf-dir /root/testdata/sf0.01] [query ...]

Exit code 0 iff every compared query matches.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from connect_server_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.queries or sorted(oracles)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            sdf = qs[name](spark, args.sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = [f.name for f in sdf.schema.fields]
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = [tuple(r) for r in orel.fetchall()]
        except Exception as exc:  # noqa: BLE001 - report, keep going
            failed.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and _digest(scols, srows) == _digest(ocols, orows)
        status = "ok" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failed.append(name)
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={'ok' if schema_ok else 'MISMATCH'} "
            f"hash={'ok' if hash_ok else 'MISMATCH'}"
        )
        if not schema_ok:
            print(f"  spark cols:  {sorted(scols)}")
            print(f"  oracle cols: {sorted(ocols)}")
    print(f"\n{len(names) - len(failed)}/{len(names)} matched")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
