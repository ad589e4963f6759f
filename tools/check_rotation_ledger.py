"""Mechanical audit of the gate-rotation ledger (r11 verdict ask #7).

Every query demoted out of the driver's 50-slot oracle window must stay
externally auditable:

1. its name appears in ``tests/test_entry_oracle.py``'s
   ``_demoted_mirrors()`` map with a non-empty preserved oracle SQL
   (the frozen gate keeps running in pytest),
2. it is registered ``defer=True`` (rows-only) — never half-rotated,
3. it is NOT also in the live oracle map (no double gating),
4. README's deferred-map table cites the preserved-oracle mirror test
   for it by parametrized name.

Run: ``python tools/check_rotation_ledger.py`` — exits non-zero with a
named finding per violation. ``tests/test_entry_oracle.py`` runs the
same audit in-process so the ledger cannot drift between rounds.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def audit() -> list[str]:
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    import connect_server_spark.registry as registry
    from tests.test_entry_oracle import _demoted_mirrors

    registry._load()
    mirrors = _demoted_mirrors()
    live_oracles = set(registry.all_oracle_sql())
    deferred = set(registry._DEFERRED)

    with open(os.path.join(_REPO, "README.md")) as f:
        readme = f.read()

    problems: list[str] = []
    if not mirrors:
        problems.append("demoted-mirror map is empty — rotation ledger gone")
    for name, sql in sorted(mirrors.items()):
        if not isinstance(sql, str) or not sql.strip():
            problems.append(f"{name}: preserved oracle SQL is empty")
        if name not in deferred:
            problems.append(
                f"{name}: demoted mirror exists but query is not "
                "registered rows-only (defer=True)"
            )
        if name in live_oracles:
            problems.append(
                f"{name}: both demoted-mirrored and live-gated — drop one"
            )
        needle = f"test_demoted_query_matches_preserved_oracle[{name}]"
        if needle not in readme:
            problems.append(
                f"{name}: README deferred map does not cite `{needle}`"
            )
    return problems


def audit_oracle_dtypes(sf_dir: str = "/root/testdata/sf0.001") -> list[str]:
    """Fail on any gated oracle whose DuckDB result schema contains a
    HUGEINT column (r12 postmortem: DuckDB widens ``sum(BIGINT)`` to
    int128, Spark stays int64, and the driver's value hash is
    dtype-sensitive — ``corpus_datacard`` failed its first external
    contact on exactly this). ``DESCRIBE SELECT`` resolves types without
    executing, so the audit is metadata-only and runs in milliseconds."""
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    import duckdb

    import connect_server_spark.registry as registry

    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    problems: list[str] = []
    for name, sql in sorted(registry.all_oracle_sql().items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001 - a broken oracle is a finding
            problems.append(f"{name}: oracle SQL fails DESCRIBE: {exc}")
            continue
        for col, typ, *_ in desc:
            if "HUGEINT" in str(typ).upper():
                problems.append(
                    f"{name}: output column '{col}' is {typ} — DuckDB "
                    "integer-sum widening; CAST the aggregate to BIGINT"
                )
    return problems


def main() -> int:
    problems = audit() + audit_oracle_dtypes()
    for p in problems:
        print(f"ROTATION-LEDGER: {p}")
    print(
        f"rotation ledger: {'FAIL' if problems else 'OK'} "
        f"({len(problems)} problems)"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
