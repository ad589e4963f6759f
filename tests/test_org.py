"""Unit tests for the organization-join operators (J1/J3/J5), modeled on
``aws/tests/test_organization.py:5-14`` and
``aws/source_id_manager.py:282-369``."""

from pyspark.sql import functions as F

from connect_server_spark.operators.org import (
    anti_join_insert,
    inherit_parent_rules,
    resolve_org,
)

ORG_COLS = "canonical_name aliases acl curation parent_organizations".split()


def _orgs(spark):
    rows = [
        ("mdf", ["materials data facility"], ["g1"], False, ["root"]),
        ("root", [], ["g0"], True, []),
        ("deep", ["d"], ["g3"], False, ["mdf"]),
        ("dup-a", ["shared"], ["g4"], False, []),
        ("dup-b", ["shared"], ["g5"], False, []),
    ]
    return spark.createDataFrame(rows, ORG_COLS)


def test_resolve_org_by_name_and_alias(spark):
    subs = spark.createDataFrame(
        [(1, "mdf"), (2, "materials data facility"), (3, "nope")], ["id", "org_ref"]
    )
    out = {r.id: (r.canonical_name, r.org_found, r.org_error)
           for r in resolve_org(subs, _orgs(spark), "org_ref", ["curation"]).collect()}
    assert out[1] == ("mdf", True, None)
    assert out[2] == ("mdf", True, None)
    assert out[3] == (None, False, "unknown organization")


def test_resolve_org_duplicate_match_flagged(spark):
    subs = spark.createDataFrame([(1, "shared")], ["id", "org_ref"])
    rows = resolve_org(subs, _orgs(spark), "org_ref", ["curation"]).collect()
    assert len(rows) == 2
    assert all(r.org_error == "duplicate organization match" for r in rows)


def test_resolve_org_plan_is_broadcast(spark):
    subs = spark.createDataFrame([(1, "mdf")], ["id", "org_ref"])
    plan = resolve_org(subs, _orgs(spark), "org_ref", ["curation"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_inherit_parent_rules_transitive(spark):
    out = {r.canonical_name: (r.acl, r.curation)
           for r in inherit_parent_rules(_orgs(spark)).collect()}
    assert out["root"] == (["g0"], True)
    # one level: own acl first, parent appended; curation ORs upward
    assert out["mdf"] == (["g1", "g0"], True)
    # two levels: deep -> mdf -> root
    assert out["deep"] == (["g3", "g1", "g0"], True)
    assert out["dup-a"] == (["g4"], False)


def test_anti_join_insert_guard(spark):
    existing = spark.createDataFrame(
        [("a", "1.0"), ("b", "1.0")], ["source_id", "version"]
    )
    incoming = spark.createDataFrame(
        [("a", "1.0", 1), ("a", "1.1", 2), ("c", "1.0", 3)],
        ["source_id", "version", "payload"],
    )
    out = sorted(
        (r.source_id, r.version)
        for r in anti_join_insert(incoming, existing, ["source_id", "version"]).collect()
    )
    assert out == [("a", "1.1"), ("c", "1.0")]
