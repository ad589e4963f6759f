"""Oracles for the end-to-end batch curation composite (curation_full).

Three pins:

* **Stage semantics on a hand-built corpus** — every stage's drop set
  is derived independently of the implementation (a doc carrying the
  C4 flag text, a duplicate pair, a doc sharing a 6-gram with the
  held-out set, a unique-token gibberish doc for the LM floor, a
  3-document boilerplate line), and the surviving id set plus the
  per-document removed-line counts are asserted exactly.
* **Composition ≡ no-checkpoint execution** — the stage-boundary
  localCheckpoints are a pure execution-strategy choice; disabling
  them must not change a single row.
* **Single-scan plan pin** — the final plan contains no FileScan at
  all: every leaf is the one lazily-checkpointed corpus scan (the r6
  verdict's "the documents table is scanned once").
"""

import pandas as pd
import pytest

from connect_server_spark.queries.curation_queries import curation_full

# A 15-word shared pool keeps every normal document's unigram
# log-probability tightly clustered near the corpus median (well inside
# the median-minus-1-nat routing floor) while staying varied enough to
# clear the adapted Gopher repetition rules.
_POOL = [
    "alpha", "breeze", "copper", "delta", "ember",
    "falcon", "garden", "harbor", "indigo", "jasper",
    "kelvin", "lumen", "meadow", "nectar", "onyx",
]

_BOILER = "portal footer nav cookie banner terms privacy contact"


def _words(doc_id: int, n: int = 40) -> list[str]:
    # per-document seeded sequences: distinct across documents (no
    # accidental shared lines/duplicates), deterministic across runs
    import random

    rng = random.Random(1000 + doc_id)
    return [_POOL[rng.randrange(len(_POOL))] for _ in range(n)]


def _fixture_rows():
    rows = []
    for i in range(30):
        w = _words(i)
        if i in (10, 11, 12):
            # an aligned 8-word boilerplate block in >=3 documents
            w[16:24] = _BOILER.split()
        if i == 7:
            # copy SIX of doc 0's words mid-line: shares a 6-gram with
            # the held-out doc (doc_id % 41 == 0) without creating a
            # 3-document full-line match (which the boilerplate stage
            # would remove before decontamination sees it)
            w[8:14] = _words(0)[0:6]
        if i == 22:
            w = _words(21)  # exact duplicate of doc 21
        text = " ".join(w)
        if i == 3:
            text += " lorem ipsum dolor sitz amet filler words here"
        if i == 4:
            text += " config{x} brace carrier words filler padding here more"
        if i == 5:
            # 40 unique tokens: avg unigram logp ~ log(1/total), many
            # nats below the corpus median — under any relative floor
            text = " ".join(f"zq{j}xv{j}k" for j in range(40))
        rows.append((i, f"src{i % 4}", text, "en"))
    return rows


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("curation_full_fixture")
    pdf = pd.DataFrame(
        _fixture_rows(), columns=["doc_id", "source", "text", "lang"]
    )
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


# Independently-derived drop sets (see _fixture_rows):
_DROP_BENCH_SELF = {0}      # held-out doc shares its own 6-grams
_DROP_CONTAMINATED = {7}    # copied doc 0's 8-word prefix
_DROP_C4 = {3, 4}           # lorem ipsum / curly brace
_DROP_LM = {5}              # unique-token gibberish under the floor
_DROP_DUP = {22}            # duplicate of doc 21 (min-id canonical wins)
_EXPECTED_SURVIVORS = (
    set(range(30))
    - _DROP_BENCH_SELF - _DROP_CONTAMINATED - _DROP_C4 - _DROP_LM - _DROP_DUP
)


def test_stage_semantics_on_hand_built_corpus(spark, fixture_dir):
    out = curation_full(spark, fixture_dir).collect()
    got_ids = {r.doc_id for r in out}
    assert got_ids == _EXPECTED_SURVIVORS
    # boilerplate stage: exactly one removed line for docs 10-12, none
    # elsewhere (no other line reaches 3 distinct documents)
    removed = {r.doc_id: r.n_removed for r in out}
    for i in _EXPECTED_SURVIVORS:
        assert removed[i] == (1 if i in (10, 11, 12) else 0), i
    # mixing: the 150-doc target exceeds the fixture, so every rate
    # saturates at 1.0 and the stage keeps everything deterministically
    assert {float(r.keep_rate) for r in out} == {1.0}
    assert all(0 < float(r.mix_weight) < 1 for r in out)


def test_composition_insensitive_to_checkpointing(spark, fixture_dir):
    a = sorted(map(tuple, curation_full(spark, fixture_dir).collect()))
    b = sorted(
        map(
            tuple,
            curation_full(spark, fixture_dir, checkpoint=False).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, curation_full(spark, sf_dir).collect()))
    b = sorted(map(tuple, curation_full(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_single_corpus_scan_plan(spark, sf_dir):
    """The composed plan never re-reads parquet: the corpus scan happens
    exactly once, inside the stage-boundary checkpoint chain, so every
    leaf of the final plan is a checkpointed RDD."""
    df = curation_full(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert "BatchEvalPython" not in plan


def test_curation_full_names_the_all_boilerplate_corpus(
    spark, tmp_path_factory
):
    """A corpus whose every line is cross-document boilerplate leaves
    nothing scoreable — the composite must refuse with a named error,
    not crash on an empty quantile or silently emit zero rows."""
    d = tmp_path_factory.mktemp("cf_empty")
    line = "nav footer cookie banner terms privacy contact about"
    pdf = pd.DataFrame(
        [(i, f"src{i % 2}", line, "en") for i in range(6)],
        columns=["doc_id", "source", "text", "lang"],
    )
    pdf.to_parquet(d / "documents.parquet", index=False)
    with pytest.raises(ValueError, match="boilerplate"):
        curation_full(spark, str(d)).collect()
