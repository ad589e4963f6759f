"""Property-based tests: the filter compiler vs a plain-Python reference
evaluator, over randomized filter lists (hypothesis).

The compiler's contract is the reference's ``scan_table`` expression
language (``aws/dynamo_manager.py:127-286``): AND-ed conjuncts, None ==
absent / None != present, ``^`` begins_with, ``*`` contains, ``[]``
inclusive between, ``in`` membership, ordered compares that exclude null
rows. Any divergence between the Catalyst compilation and the
row-at-a-time reference semantics is a bug here, not a flake.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from connect_server_spark.plans import scan_table

ROWS = [
    (1, "alpha", 10),
    (2, "beta", 25),
    (3, "gamma", None),
    (4, None, 40),
    (5, "alpastry", 5),
    (6, "delta", 25),
    (7, "", 0),
    (8, "Alpha", -3),
]
COLS = ["k", "s", "i"]

STRINGS = st.sampled_from(["alpha", "beta", "al", "a", "", "zeta", "Alpha"])
INTS = st.integers(min_value=-5, max_value=45)

STR_FILTER = st.one_of(
    st.tuples(st.just("s"), st.sampled_from(["==", "!="]),
              st.one_of(STRINGS, st.none())),
    st.tuples(st.just("s"), st.sampled_from(["^", "*", ">", ">=", "<", "<="]),
              STRINGS),
    st.tuples(st.just("s"), st.just("in"), st.lists(STRINGS, min_size=1, max_size=3)),
)
INT_FILTER = st.one_of(
    st.tuples(st.just("i"), st.sampled_from(["==", "!="]),
              st.one_of(INTS, st.none())),
    st.tuples(st.just("i"), st.sampled_from([">", ">=", "<", "<="]), INTS),
    st.tuples(st.just("i"), st.just("[]"),
              st.tuples(INTS, INTS).map(lambda t: sorted(t))),
    st.tuples(st.just("i"), st.just("in"), st.lists(INTS, min_size=1, max_size=3)),
)
FILTERS = st.lists(st.one_of(STR_FILTER, INT_FILTER), min_size=1, max_size=3)


def _py_one(row: dict, f) -> bool:
    field, op, value = f
    v = row[field]
    if op == "==" and value is None:
        return v is None
    if op == "!=" and value is None:
        return v is not None
    if v is None:
        return False  # SQL three-valued logic: null never matches
    if op == "==":
        return v == value
    if op == "!=":
        return v != value
    if op == "^":
        return str(v).startswith(value)
    if op == "*":
        return value in str(v)
    if op == "[]":
        return value[0] <= v <= value[1]
    if op == "in":
        return v in value
    if op == ">":
        return v > value
    if op == ">=":
        return v >= value
    if op == "<":
        return v < value
    if op == "<=":
        return v <= value
    raise AssertionError(op)


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(ROWS, COLS).cache()


@given(filters=FILTERS)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compiler_matches_reference_semantics(fixture_df, filters):
    got = sorted(r.k for r in scan_table(fixture_df, ["k"], filters).collect())
    want = sorted(
        row[0]
        for row in ROWS
        if all(_py_one(dict(zip(COLS, row)), f) for f in filters)
    )
    assert got == want, f"filters={filters}"


@given(major=st.integers(min_value=0, max_value=99),
       minor=st.integers(min_value=0, max_value=99))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_increment_version_property(spark, major, minor):
    """A2/F3: '<maj>.<min>' always increments the minor; the major never
    moves (``aws/dynamo_manager.py:90-100``)."""
    from pyspark.sql import functions as F

    from connect_server_spark.functions.source_ids import (
        increment_record_version,
    )

    df = spark.createDataFrame([(f"{major}.{minor}",)], ["v"])
    [r] = df.select(increment_record_version(F.col("v")).alias("out")).collect()
    assert r.out == f"{major}.{minor + 1}"


@given(vs=st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),
              st.integers(min_value=0, max_value=20)),
    min_size=1, max_size=6, unique=True))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_latest_version_numeric_ordering_property(spark, vs):
    """A1/O1: the engine's latest-version pick must equal Python's
    numeric (major, minor) max — never the lexicographic max
    (the 1.13 > 1.2 trap, ``aws/tests/test_dynamo_manager.py:7-44``)."""
    from connect_server_spark.operators.versioning import latest_per_key

    rows = [("k", f"{a}.{b}", i) for i, (a, b) in enumerate(vs)]
    df = spark.createDataFrame(rows, ["source_id", "version", "payload"])
    [r] = latest_per_key(
        df, key="source_id", version="version", payload=["payload"],
        tiebreakers=["payload"],
    ).collect()
    want = max(vs)
    assert r.version == f"{want[0]}.{want[1]}"


_WORDS = st.sampled_from(
    ["Quantum", "dataset", "of", "the", "über", "phase-field", "NiTi",
     "2024", "v2.0", "study", "and", "smith", "データ", "_", ""]
)


@given(words=st.lists(_WORDS, min_size=1, max_size=6),
       author=st.sampled_from(["Smith", "de la Cruz", "Ng"]))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_make_source_name_idempotence_property(spark, words, author):
    """F2: for ANY title (unicode, stopwords, versions, punctuation),
    running the name pipeline on its own output is a fixpoint, and the
    output alphabet is [a-z0-9_] (golden ``tests/test_utils.py:60-70``
    generalized)."""
    import re

    from pyspark.sql import functions as F

    from connect_server_spark.functions.source_ids import make_source_name

    title = " ".join(words)
    df = spark.createDataFrame([(title, author)], ["t", "a"])
    [r1] = df.select(
        make_source_name(F.col("t"), F.col("a")).alias("o")
    ).collect()
    if not r1.o.success:
        return  # no usable word: error row, nothing to be idempotent over
    name = r1.o.source_name
    assert re.fullmatch(r"[a-z0-9_]+", name), name
    df2 = spark.createDataFrame([(name, author)], ["t", "a"])
    [r2] = df2.select(
        make_source_name(F.col("t"), F.col("a")).alias("o")
    ).collect()
    assert r2.o.success and r2.o.source_name == name
