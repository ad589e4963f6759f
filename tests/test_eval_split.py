"""Oracles for the content-hash eval split + near-dup leakage audit."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from connect_server_spark.operators.curation import (
    eval_split,
    split_leakage_pairs,
)


def _py_split(text, val_frac, test_frac, seed=""):
    # mirror of the operator: normalize = lower + collapse whitespace
    import re

    norm = re.sub(r"\s+", " ", text.strip().lower())
    u = int(hashlib.md5((seed + norm).encode()).hexdigest()[:4], 16) / 65536.0
    if u < test_frac:
        return "test"
    if u < test_frac + val_frac:
        return "val"
    return "train"


def test_eval_split_matches_python_mirror_and_cosplits_duplicates(spark):
    rows = [(i, f"document number {i} alpha beta gamma delta") for i in range(400)]
    rows += [(1000 + i, rows[i][1]) for i in range(50)]  # exact duplicates
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = eval_split(df, "text", val_frac=0.1, test_frac=0.1, seed="t:")
    got = {r.doc_id: r.split for r in out.collect()}
    # python mirror agrees row for row
    for i, text in rows:
        assert got[i] == _py_split(text, 0.1, 0.1, "t:"), i
    # exact duplicates always co-split
    for i in range(50):
        assert got[i] == got[1000 + i]
    # fractions in a loose band (hash uniformity on 450 docs)
    from collections import Counter

    c = Counter(got.values())
    assert 0.03 < c["val"] / len(got) < 0.2
    assert 0.03 < c["test"] / len(got) < 0.2


def test_eval_split_normalization_invariance(spark):
    """Case/whitespace variants of the same text must co-split (the key
    is the NORMALIZED text)."""
    df = spark.createDataFrame(
        [(1, "Alpha  Beta Gamma"), (2, "alpha beta   gamma"),
         (3, "ALPHA BETA GAMMA ")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.split for r in
           eval_split(df, "text", 0.3, 0.3, seed="n:").collect()}
    assert len(set(out.values())) == 1


def test_eval_split_rejects_bad_fractions(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="val_frac"):
        eval_split(df, "text", val_frac=0.6, test_frac=0.5)


def test_split_leakage_finds_planted_cross_split_neardup(spark):
    """Two near-duplicate documents forced into different splits must
    surface as a leakage pair; co-split near-dups must not."""
    base = ("quick brown fox jumps over the lazy dog again and again "
            "while the river runs past the old stone mill every morning")
    near = base.replace("morning", "evening")
    far = "completely different content about spark physical plans here"
    df = spark.createDataFrame(
        [(1, base, "train"), (2, near, "test"), (3, far, "train"),
         (4, base, "train")],
        ["doc_id", "text", "split"],
    )
    out = split_leakage_pairs(df, "doc_id", "text", threshold=0.5).collect()
    pairs = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in out}
    assert (1, 2) in pairs          # cross-split near-dup flagged
    assert (1, 4) not in pairs      # exact dup, but co-split: not a leak
    for r in out:
        assert r.split_a != r.split_b
        assert r.jaccard >= 0.5


def test_corpus_split_queries_run_and_are_deterministic(spark, sf_dir):
    from connect_server_spark.queries.curation_queries import (
        corpus_eval_split,
        corpus_split_leakage,
    )

    a = [tuple(r) for r in corpus_eval_split(spark, sf_dir).collect()]
    b = [tuple(r) for r in corpus_eval_split(spark, sf_dir).collect()]
    assert a == b and len(a) >= 2
    total = sum(r[1] for r in a)
    assert total > 0
    leaks = [tuple(r) for r in corpus_split_leakage(spark, sf_dir).collect()]
    assert leaks == sorted(leaks)


def test_contamination_fraction_matches_python_mirror(spark):
    """Exact per-document fraction against an independent python
    recomputation (distinct word 8-grams, normalized text), including
    the no-gram (short doc) and fully-contaminated cases; threshold
    semantics consistent with the any-hit sweep."""
    from connect_server_spark.operators.curation import (
        benchmark_ngrams,
        contaminated_ids,
        contamination_fraction,
        decontaminate_fraction,
    )

    bench_text = ("held out question about the quick brown fox jumping "
                  "over lazy dogs near the river mill")
    half = ("completely fresh opening words here then question about the "
            "quick brown fox jumping over lazy dogs in a new context "
            "with extra trailing content to dilute the overlap further")
    rows = [
        (1, bench_text),                        # full leak: frac 1.0
        (2, half),                              # partial overlap
        (3, "too short"),                       # no 8-grams: frac 0
        (4, "totally unrelated corpus text about spark physical plans "
            "and shuffle exchanges in adaptive execution mode today"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(bench_text,)], ["text"])
    grams_df = benchmark_ngrams(bench, "text", n=8)
    out = {
        r.doc_id: r
        for r in contamination_fraction(
            docs, grams_df, "doc_id", "text", n=8
        ).collect()
    }

    import re

    def py_grams(text, n=8):
        toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        if len(toks) >= n:
            return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        # word_shingles contract: a short doc is one whole-text shingle
        return {" ".join(toks)}

    bg = py_grams(bench_text)
    for i, text in rows:
        g = py_grams(text)
        want_n, want_hits = len(g), len(g & bg)
        assert out[i].n_grams == want_n, i
        assert out[i].n_hits == want_hits, i
        want_frac = round(want_hits / max(want_n, 1), 6)
        assert abs(out[i].frac - want_frac) < 1e-6, i
    assert out[1].frac == 1.0 and out[3].frac == 0.0
    assert 0.0 < out[2].frac < 1.0

    # threshold semantics: max_fraction=0 reproduces the any-hit sweep
    # for gram-bearing documents
    any_hit = {
        r.doc_id
        for r in contaminated_ids(docs, grams_df, "doc_id", "text", 8).collect()
    }
    kept0 = {
        r.doc_id
        for r in decontaminate_fraction(
            docs, bench, "doc_id", "text", "text", max_fraction=0.0
        ).collect()
    }
    assert kept0 == {i for i, _ in rows} - any_hit
    # a lenient threshold keeps the partial-overlap doc, drops the leak
    kept_half = {
        r.doc_id
        for r in decontaminate_fraction(
            docs, bench, "doc_id", "text", "text", max_fraction=0.6
        ).collect()
    }
    assert 1 not in kept_half and 2 in kept_half


def test_winnow_contamination_mirror_and_edit_robustness(spark):
    """The fuzzy decon leg: exact hashlib mirror of the per-document
    winnow-fingerprint fraction, plus the property that motivates it —
    a benchmark item pasted with a light mid-passage edit still reports
    substantial winnow contamination while the exact 8-gram fraction
    collapses (each edit kills every 8-gram covering it)."""
    import re

    from connect_server_spark.operators.curation import (
        benchmark_ngrams,
        contamination_fraction,
        winnow_contamination,
    )

    from conftest import py_winnow

    k, window = 4, 4

    bench_text = (
        "which planet in our solar system has the largest number of "
        "confirmed moons orbiting it as of the latest survey results"
    )
    # one word swapped mid-passage ("largest" -> "greatest")
    edited = bench_text.replace("largest", "greatest")
    rows = [
        (1, bench_text),
        (2, "intro words then " + edited + " plus trailing filler text"),
        (3, "entirely unrelated document about bucketed shuffle layouts"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(bench_text,)], ["text"])

    got = {
        r.doc_id: (r.n_fps, r.n_hits, round(r.frac, 9))
        for r in winnow_contamination(
            docs, bench, "doc_id", "text", "text", k=k, window=window
        ).collect()
    }
    bfps = py_winnow(bench_text)
    want = {}
    for i, t in rows:
        fps = py_winnow(t)
        hits = len(fps & bfps)
        want[i] = (len(fps), hits, round(hits / max(len(fps), 1), 9))
    assert got == want
    assert got[1][2] == 1.0 and got[3][1] == 0

    # robustness: the edited paste keeps most winnow mass, the exact
    # 8-gram fraction drops far below it
    exact = {
        r.doc_id: r.frac
        for r in contamination_fraction(
            docs, benchmark_ngrams(bench, "text", n=8), "doc_id", "text", n=8
        ).collect()
    }
    assert got[2][2] >= 0.5  # winnow still sees most of the leak
    assert exact[2] <= 0.3  # the one edit killed most covering 8-grams
    assert exact[2] < got[2][2]

    # contamination_fraction parity: a NULL-text document still gets a
    # report row — NULL normalizes to the empty text (word_shingles
    # family convention), one empty-gram fingerprint, frac 0
    with_null = spark.createDataFrame(
        [(1, bench_text), (9, None)], "doc_id long, text string"
    )
    nulled = {
        r.doc_id: (r.n_fps, r.n_hits, r.frac)
        for r in winnow_contamination(
            with_null, bench, "doc_id", "text", "text", k=k, window=window
        ).collect()
    }
    assert set(nulled) == {1, 9}
    assert nulled[9] == (1, 0, 0.0)
