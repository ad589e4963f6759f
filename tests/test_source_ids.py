"""Golden tests for the source-id/version expression library, ported from
the reference's ``tests/test_utils.py:5-119`` (make/split_source_id) and
``aws/tests/test_dynamo_manager.py:66-70`` (increment) /
``:7-44`` (numeric-aware version ordering)."""

from pyspark.sql import functions as F

from connect_server_spark.functions import (
    increment_record_version,
    make_source_name,
    split_source_id,
    version_sort_key,
)


def _rows(spark, col_expr, values, extra_cols=()):
    df = spark.createDataFrame([(v,) + tuple(e) for v, e in zip(values, extra_cols or [()] * len(values))],
                               ["value"] + [f"x{i}" for i in range(len(extra_cols[0]) if extra_cols else 0)])
    return df.select(col_expr.alias("out")).collect()


def _split(spark, sid):
    row = (
        spark.range(1)
        .select(split_source_id(F.lit(sid)).alias("s"))
        .select("s.*")
        .collect()[0]
    )
    return row.asDict()


def test_split_source_id_goldens(spark):
    # tests/test_utils.py:82-98 — standard forms
    assert _split(spark, "_test_foo_bar_study_v1.1") == {
        "success": True,
        "source_name": "_test_foo_bar_study",
        "source_id": "_test_foo_bar_study_v1.1",
        "search_version": 1,
        "submission_version": 1,
    }
    assert _split(spark, "study_v8_engines_v2.8") == {
        "success": True,
        "source_name": "study_v8_engines",
        "source_id": "study_v8_engines_v2.8",
        "search_version": 2,
        "submission_version": 8,
    }
    # tests/test_utils.py:99-105 — incorrect form
    assert _split(spark, "just_this") == {
        "success": False,
        "source_name": "just_this",
        "source_id": "just_this",
        "search_version": 0,
        "submission_version": 0,
    }
    # tests/test_utils.py:106-119 — invalid forms handled anyway
    assert _split(spark, "study_v3.4_engines_v2.8") == {
        "success": True,
        "source_name": "study_v3.4_engines",
        "source_id": "study_v3.4_engines_v2.8",
        "search_version": 2,
        "submission_version": 8,
    }
    assert _split(spark, "just_v3.4_this") == {
        "success": False,
        "source_name": "just_v3.4_this",
        "source_id": "just_v3.4_this",
        "search_version": 0,
        "submission_version": 0,
    }


def test_split_source_id_preserves_zero_padding(spark):
    # reference reassembles raw parts: x_v08.1 round-trips (ADVICE r1 low #3)
    out = _split(spark, "x_v08.1")
    assert out["source_id"] == "x_v08.1"
    assert out["search_version"] == 8


def _name(spark, title, author, is_test=False, sanitize_only=False):
    row = (
        spark.range(1)
        .select(
            make_source_name(
                F.lit(title), F.lit(author), is_test=is_test, sanitize_only=sanitize_only
            ).alias("s")
        )
        .select("s.*")
        .collect()[0]
    )
    return row.asDict()


def test_make_source_name_standard(spark):
    # tests/test_utils.py:5-18 (correct1)
    for title, author in [
        ("Foo and Bar:,; a V123 !@#$ Stuff with dataset", "Smith"),
        ("foo_bar_v123_stuff", "Smith!"),
        ("foo_bar_v123_stuff_v1.1", "  smith   "),
    ]:
        out = _name(spark, title, author)
        assert out["success"] is True, (title, out)
        assert out["source_name"] == "smith_foo_bar_stuff", (title, out)


def test_make_source_name_test_flag(spark):
    # tests/test_utils.py:20-31 (correct2)
    for title, author in [
        ("Foo and V123:,; a Bar !@#$ Thing", "Fox-Hound"),
        ("foo_v123_bar_thing", "Fox Hound"),
        ("foo_v123_bar_thing_v1.1", "Fox-!-Hound"),
    ]:
        out = _name(spark, title, author, is_test=True)
        assert out["source_name"] == "_test_foxhound_foo_v123_thing", (title, out)


def test_make_source_name_low_token_count(spark):
    # tests/test_utils.py:33-45 (correct3)
    for title, author in [
        ("Small! A dataset data with THE data!!", "Very"),
        ("very_small_v1.1", "V Ery"),
        ("very_small", "$V $E RY"),
    ]:
        out = _name(spark, title, author)
        assert out["source_name"] == "very_small", (title, out)


def test_make_source_name_sanitize_only(spark):
    # tests/test_utils.py:47-59 (correct4)
    for title, author in [
        ("A Theory Of Everything", "Issac Erwin Einstein"),
        ("_Theory_Everything", "Issac Erwin Einstein"),
        ("theory_everything_v1.1", "Marie DeGrasse Nye"),
    ]:
        out = _name(spark, title, author, sanitize_only=True)
        assert out["source_name"] == "theory_everything", (title, out)


def test_make_source_name_idempotent(spark):
    # tests/test_utils.py:61-72 — double usage should not mutate
    cases = [
        ("smith_foo_bar_stuff_v1.1", "SMITH", False, False, "smith_foo_bar_stuff"),
        ("smith_foo_bar_stuff", "  Smith", False, False, "smith_foo_bar_stuff"),
        ("_test_foxhound_foo_v123_thing_v1.1", "Fox Hound", True, False,
         "_test_foxhound_foo_v123_thing"),
        ("_test_foxhound_foo_v123_thing", "FOXHound", True, False,
         "_test_foxhound_foo_v123_thing"),
        ("very_small_v1.1", "Very", False, False, "very_small"),
        ("very_small", "V. Ery", False, False, "very_small"),
        ("theory_everything_v1.1", "Grace Tesla Hawking", False, True, "theory_everything"),
        ("theory_everything", "Kermit Witha Mustache", False, True, "theory_everything"),
    ]
    for title, author, is_test, sanitize, expect in cases:
        out = _name(spark, title, author, is_test=is_test, sanitize_only=sanitize)
        assert out["source_name"] == expect, (title, author, out)


def test_make_source_name_error_row(spark):
    # aws/source_id_manager.py:106-111 — no non-author word → error
    out = _name(spark, "The And Of", "Smith")
    assert out["success"] is False
    assert out["source_name"] is None
    assert out["error"].startswith("Title 'The And Of' invalid")


def test_make_source_name_non_ascii(spark):
    # reference keeps ASCII alnum only: Überstudy → berstudy
    out = _name(spark, "Überstudy results", "Smith")
    assert out["source_name"] == "smith_berstudy_results"


def test_increment_record_version(spark):
    # aws/tests/test_dynamo_manager.py:66-70
    df = spark.createDataFrame(
        [("1.1",), ("1.12",), ("1",), (None,), ("",)], ["v"]
    ).select(increment_record_version(F.col("v")).alias("out"))
    assert [r.out for r in df.collect()] == ["1.2", "1.13", None, "1.0", "1.0"]


def test_version_sort_key_numeric_aware(spark):
    # aws/tests/test_dynamo_manager.py:7-44 — 1.13 beats 1.2 across batches
    versions = ["1.1", "1.12", "1.2", "1.6", "1.13", "1.7"]
    df = spark.createDataFrame([(v,) for v in versions], ["version"])
    top = (
        df.orderBy(version_sort_key(F.col("version")).desc())
        .limit(1)
        .collect()[0]
        .version
    )
    assert top == "1.13"
