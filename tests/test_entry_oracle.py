"""Local mirror of the driver's t2 gate: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB on row-count + columns + values
(order-insensitive) at the test scale factor."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import assert_matches_oracle

_QUERIES = entry_mod.queries()
_ORACLE = entry_mod.oracle_sql()


def test_every_query_has_callable():
    assert _QUERIES, "no queries registered"
    for name, fn in _QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    missing = set(_ORACLE) - set(_QUERIES)
    assert not missing, f"oracle_sql for unregistered queries: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, _ORACLE[name], sf_dir)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    # driver's t1 gate requires rows > 0 (61 rows at sf0.001)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
