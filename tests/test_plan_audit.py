"""Registry-wide physical-plan audit: the scale invariants every
registered query must hold, asserted mechanically.

* **No accidental all-pairs joins.** `CartesianProduct` /
  `BroadcastNestedLoopJoin` appear only in the two documented exact
  baselines that oracle the LSH paths (bounded subsets by construction).
* **No row-at-a-time Python UDFs.** `BatchEvalPython` (the per-row
  pickled-Python operator) must never appear; the only Python boundary
  allowed is Arrow-batched (`ArrowEvalPython` / `MapInPandas` /
  `FlatMapGroupsInPandas`), and only in the queries that declare it.

Plans are built, not executed — the audit covers the whole registry in
seconds and fails the suite the moment a new operator regresses into a
cross join or a pickled UDF.
"""

import pytest

import __spark_entry__ as entry_mod

_QUERIES = entry_mod.queries()

# Exact all-pairs baselines on bounded subsets — the correctness oracles
# for the banded/bucketed scale paths. Everything else must be equi-join.
ALLPAIRS_BASELINES = {
    "dedup_neardup_embedding",
    "similarity_topk_exact",
}

# Queries whose operators legitimately cross the Python boundary — all
# Arrow-batched (pandas UDF / mapInPandas / applyInPandas), never per-row.
ARROW_BOUNDARY_OK = {
    "similarity_topk_ann",
    "similarity_topk_ivf",
    "dedup_neardup_embedding_lsh",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "extract_grouped",
}


def _plan(spark, sf_dir, name: str) -> str:
    df = _QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_plan_scale_invariants(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    if name not in ALLPAIRS_BASELINES:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert (
            "BroadcastNestedLoopJoin" not in plan
        ), f"{name}: nested-loop join"
    # Row-at-a-time Python UDFs are banned everywhere.
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
    if name not in ARROW_BOUNDARY_OK:
        for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in plan, f"{name}: undeclared Python boundary {node}"
