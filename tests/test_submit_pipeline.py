"""Scenario tests for the submit pipeline — the reference's BDD scenarios
(``aws/tests/submit_dataset.feature:1-110``) translated to DataFrame
fixtures asserting ``(success, error)``."""

from pyspark.sql import functions as F

from connect_server_spark.pipeline.submit import ERRORS, submit_pipeline

ORG_COLS = "canonical_name aliases acl curation parent_organizations".split()
SUB_COLS = (
    "source_id title org_ref update identities user_groups required_group "
    "metadata_value".split()
)


_ORG_SCHEMA = (
    "canonical_name string, aliases array<string>, acl array<string>, "
    "curation boolean, parent_organizations array<string>"
)
_STATUS_SCHEMA = "source_id string, version string, owner string, seq long"
_SUB_SCHEMA = (
    "source_id string, title string, org_ref string, update boolean, "
    "identities array<string>, user_groups array<string>, "
    "required_group string, metadata_value double"
)


def _orgs(spark):
    return spark.createDataFrame(
        [("mdf", ["materials data facility"], ["g1"], True, [])], _ORG_SCHEMA
    )


def _status(spark, rows=()):
    return spark.createDataFrame(list(rows), _STATUS_SCHEMA)


def _run(spark, sub_rows, status_rows=()):
    subs = spark.createDataFrame(sub_rows, _SUB_SCHEMA)
    out = submit_pipeline(subs, _orgs(spark), _status(spark, status_rows), "seq")
    return {r.source_id: r for r in out.collect()}


def _sub(source_id="src_a", title="A Study", org="mdf", update=False,
         identities=("u1", "alt-u1"), groups=("gA",), required="gA", value=1.5):
    return (source_id, title, org, update, list(identities), list(groups), required, value)


def test_new_submission_happy_path(spark):
    r = _run(spark, [_sub()])["src_a"]
    assert r.success and r.error is None
    assert r.assigned_version == "1.0"
    assert r.versioned_source_id == "src_a-1.0"
    assert r.canonical_name == "mdf" and r.curation is True


def test_update_happy_path_increments(spark):
    r = _run(spark, [_sub(update=True)],
             [("src_a", "1.12", "u1", 1)])["src_a"]
    assert r.success
    assert r.assigned_version == "1.13"


def test_update_of_missing_source_rejected(spark):
    r = _run(spark, [_sub(update=True)])["src_a"]
    assert not r.success and r.error == ERRORS["update_missing"]


def test_resubmit_without_update_rejected(spark):
    r = _run(spark, [_sub(update=False)], [("src_a", "1.0", "u1", 1)])["src_a"]
    assert not r.success and r.error == ERRORS["exists"]


def test_ownership_violation(spark):
    r = _run(spark, [_sub(update=True)], [("src_a", "1.0", "someone-else", 1)])["src_a"]
    assert not r.success and r.error == ERRORS["owner"]


def test_group_gate(spark):
    r = _run(spark, [_sub(groups=("gOther",))])["src_a"]
    assert not r.success and r.error == ERRORS["group"]


def test_nan_guard_precedes_org_check(spark):
    r = _run(spark, [_sub(org="nope", value=float("nan"))])["src_a"]
    assert r.error == ERRORS["nan"]


def test_missing_title(spark):
    r = _run(spark, [_sub(title="   ")])["src_a"]
    assert r.error == ERRORS["title"]


def test_unknown_org(spark):
    r = _run(spark, [_sub(org="nope")])["src_a"]
    assert r.error == ERRORS["org_unknown"]


def test_test_flag_suffixes_source_and_isolates_lineage(spark):
    """Feature 'Submit Test Dataset With Provided source_id': the test
    flag tacks -test onto the source_id (aws/submit.py:198-204), so a
    test submission of an existing prod source is still NEW."""
    subs = spark.createDataFrame(
        [_sub() + (True, False)], _SUB_SCHEMA + ", test boolean, "
        "update_metadata_only boolean"
    )
    out = {r.source_id: r for r in submit_pipeline(
        subs, _orgs(spark), _status(spark, [("src_a", "1.0", "u1", 1)]), "seq"
    ).collect()}
    r = out["src_a"]
    assert r.success  # prod src_a exists, but src_a-test does not
    assert r.versioned_source_id == "src_a-test-1.0"


def test_previous_versions_accumulate_sorted(spark):
    """aws/submit.py:215-216: previous_versions carries every existing
    versioned id of the source."""
    r = _run(
        spark,
        [_sub(update=True)],
        [("src_a", "1.0", "u1", 1), ("src_a", "1.2", "u1", 2),
         ("src_a", "1.13", "u1", 3)],
    )["src_a"]
    assert r.success and r.assigned_version == "1.14"
    assert r.previous_versions_csv == "src_a-1.0,src_a-1.13,src_a-1.2"


def test_update_metadata_only_passthrough(spark):
    """Feature 'Update metadata only': the flag rides through to the flow
    stage untouched (aws/submit.py:183)."""
    subs = spark.createDataFrame(
        [_sub(update=True) + (False, True)],
        _SUB_SCHEMA + ", test boolean, update_metadata_only boolean",
    )
    out = submit_pipeline(
        subs, _orgs(spark), _status(spark, [("src_a", "1.0", "u1", 1)]), "seq"
    ).collect()[0]
    assert out.success and out.update_metadata_only is True


def _doc(
    creators='[{"creatorName": "C"}]',
    year='"2018"',
    publisher=', "publisher": "MDF"',
    titles='[{"title": "T"}]',
    acl='["public"]',
    version="1",
    extra="",
):
    return (
        '{"dc": {"creators": ' + creators
        + ', "publicationYear": ' + year + publisher
        + ', "resourceType": {"resourceTypeGeneral": "Dataset"}, "titles": '
        + titles
        + '}, "mdf": {"source_name": "src_a", "acl": ' + acl
        + ', "version": ' + version + "}" + extra + "}"
    )


def _check(spark, doc):
    from connect_server_spark.pipeline.schema_check import check_submission

    df = spark.createDataFrame([(doc,)], "doc string")
    return check_submission(df, "doc").collect()[0]


def test_schema_check_valid_doc(spark):
    r = _check(spark, _doc())
    assert r.schema_valid and r.schema_error is None
    assert r.violations_csv == "" and r.n_violations == 0


def test_schema_check_each_constraint_fires(spark):
    """One violation per defect class; first-failure message matches the
    reference's 'Invalid submission: <first error>' shape
    (aws/submit.py:30-38)."""
    cases = {
        "additional_properties": _doc(extra=', "bogus": true'),
        "title_required": _doc(titles="[]"),
        "creators_min_items": _doc(creators="[]"),
        "publication_year_type": _doc(year="2018"),
        "publisher_required": _doc(publisher=""),
        "acl_min_items": _doc(acl="[]"),
        "version_type": _doc(version='"one"'),
    }
    for rule, doc in cases.items():
        r = _check(spark, doc)
        assert not r.schema_valid, rule
        assert rule in r.violations_csv.split(","), rule
        assert r.schema_error.startswith("Invalid submission: "), rule


def test_schema_check_missing_blocks_report_first(spark):
    """bad_dataset analog (tests/test_validator.py:65-69): junk keys and
    no valid dc/mdf members — additionalProperties fires first, required
    blocks all flagged."""
    r = _check(spark, '{"invalid": true, "dcx": {"qwerty": "asdf"}}')
    v = r.violations_csv.split(",")
    assert v[0] == "additional_properties"
    assert "dc_required" in v and "mdf_required" in v
    assert r.schema_error == "Invalid submission: additional_properties"


def test_schema_check_rule_names_pinned(spark):
    from connect_server_spark.pipeline.schema_check import (
        DATASET_RULES,
        _rules,
    )

    assert [n for n, _ in _rules(F.lit("{}"))] == DATASET_RULES


def test_submit_pipeline_doc_col_gates_schema(spark):
    """The raw-doc constraint stage slots into the guard chain after the
    title slice; original_submission carries the doc verbatim."""
    bad = _doc(acl="[]")
    subs = spark.createDataFrame(
        [_sub() + (bad,), _sub(source_id="src_b") + (_doc(),)],
        _SUB_SCHEMA + ", doc string",
    )
    out = submit_pipeline(subs, _orgs(spark), _status(spark), "seq", doc_col="doc")
    rows = {r.source_id: r for r in out.collect()}
    assert not rows["src_a"].success
    assert rows["src_a"].error == "Invalid submission: acl_min_items"
    assert rows["src_a"].original_submission == bad
    assert rows["src_b"].success


def test_submit_pipeline_retains_original_submission_without_doc(spark):
    """Without a raw doc the input columns re-serialize losslessly
    (aws/submit.py:299-312)."""
    import json

    r = _run(spark, [_sub()])["src_a"]
    doc = json.loads(r.original_submission)
    assert doc["source_id"] == "src_a" and doc["title"] == "A Study"
    assert doc["identities"] == ["u1", "alt-u1"]
