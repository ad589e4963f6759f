"""BPE tokenizer: Spark segmentation ≡ independent Python reference,
training determinism, vocab id contract, and the estimate-vs-exact band.

The reference implementation here is deliberately NAIVE and independent
of the operator's algorithm: it replays merges in training order, one
full pass per merge. The operator applies greedy lowest-rank-first
merging (the GPT-2 algorithm); the two are equivalent because a merge
can only create pairs containing its own new symbol, and every merge
involving that symbol ranks later — so agreement is a real check of the
operator, not a tautology.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connect_server_spark.operators.text import BPE_SPLIT_RE

ADVERSARIAL = [
    "",
    "   ",
    "\t\n\r\f",
    "plain ascii words with spaces",
    "don't isn't o'clock 'tis rock'n'roll",
    "mixed123 numbers 456 and 7z8",
    "naïve café résumé coöperate",  # combining-capable latin
    "日本語のテキストと English mixed 文章",  # CJK
    "emoji 😀🎉 and flags 🇺🇳 and zwj 👩‍🚀",
    "zero​width‌space‍chars",
    "a" * 300,  # long single run
    ("repeat " * 50).strip(),
    "punct!!! ***stars*** [brackets] {braces} <tags>",
    "tabs\tand\nnewlines\r\nand\fformfeed",
    " non-breaking space",  # NBSP is NOT in the ws class
    "combining é accents à grave",
    "currency €99.99 £5 ¥1000 $3.50",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕤𝕥𝕪𝕝𝕖𝕕 (astral plane)",
]

TRAIN_ROWS = [
    (i, t)
    for i, t in enumerate(
        [
            "the quick brown fox jumps over the lazy dog",
            "the slow brown bear walks under the lazy dog",
            "quick queries over the lazy table scan the index",
            "don't scan the index when the filter prunes",
            "numbers 123 and 456 repeat 123 in the table",
            "日本語 text appears twice 日本語 here",
        ]
        * 3  # repetition → pair counts ≥ 2 → merges actually learn
    )
]


def ref_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Naive reference: pre-tokenize, then replay merges in training
    order with one full left-to-right pass each."""
    out: list[str] = []
    for piece in re.findall(BPE_SPLIT_RE, text or ""):
        syms = list(piece)
        for a, b in merges:
            i, merged = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return out


@pytest.fixture(scope="module")
def trained(spark):
    from connect_server_spark.operators.tokenizer import train_bpe_merges

    df = spark.createDataFrame(TRAIN_ROWS, ["doc_id", "text"])
    merges = train_bpe_merges(df, "text", num_merges=120, max_pieces=5000)
    assert len(merges) > 20  # the corpus genuinely trains merges
    return df, merges


def test_training_is_deterministic(spark, trained):
    from connect_server_spark.operators.tokenizer import train_bpe_merges

    df, merges = trained
    again = train_bpe_merges(df, "text", num_merges=120, max_pieces=5000)
    assert merges == again


def test_spark_segmentation_matches_reference_on_adversarial_unicode(
    spark, trained
):
    from connect_server_spark.operators.tokenizer import (
        UNK_ID,
        bpe_vocab,
        tokenize_bpe,
    )

    _, merges = trained
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (list(r.tokens), list(r.token_ids), r.n_tokens)
        for r in tokenize_bpe(df, "doc_id", "text", merges).collect()
    }
    vocab = bpe_vocab(merges)
    for doc_id, text in rows:
        want = ref_encode(text, merges)
        toks, ids, n = got[doc_id]
        assert toks == want, (doc_id, text)
        assert n == len(want)
        assert ids == [vocab.get(t, UNK_ID) for t in want]
    # losslessness: tokens concatenate back to the exact input (the
    # pre-tokenizer covers every character class, merges never drop)
    for doc_id, text in rows:
        assert "".join(got[doc_id][0]) == (text or ""), doc_id


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_operator_encode_matches_reference_property(text):
    """Driver-side property check of the greedy lowest-rank encoder vs
    the naive replay, over a fixed merge table and arbitrary unicode —
    no Spark in the loop, so hypothesis can push hundreds of cases."""
    from connect_server_spark.operators.tokenizer import _encode_piece

    merges = [
        ("a", "b"), ("ab", "c"), ("d", "e"), ("de", "de"),
        (" ", "a"), (" a", "b"), ("1", "2"), ("x", "x"), ("xx", "xx"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    pieces = re.findall(BPE_SPLIT_RE, text)
    got = [t for p in pieces for t in _encode_piece(p, ranks)]
    assert got == ref_encode(text, merges)
    assert "".join(got) == "".join(pieces)


def test_estimate_lower_bounds_exact_count(spark, trained):
    """`bpe_token_estimate` counts pre-merge pieces, so it can never
    exceed the real token count; on text the vocab has never seen the
    real count grows (unmerged characters) but stays within a small
    factor — the band cost budgeting relies on."""
    import pyspark.sql.functions as F

    from connect_server_spark.operators.text import bpe_token_estimate
    from connect_server_spark.operators.tokenizer import tokenize_bpe

    _, merges = trained
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL) if t.strip()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    both = (
        tokenize_bpe(df, "doc_id", "text", merges)
        .join(
            df.select(
                "doc_id", bpe_token_estimate(F.col("text")).alias("est")
            ),
            "doc_id",
        )
        .select("doc_id", "n_tokens", "est")
        .collect()
    )
    assert both
    for r in both:
        assert r.est <= r.n_tokens, r
    # measured band on unseen-vocab text: real/estimate stays small —
    # pieces are short, so even zero merges bound the ratio by piece
    # length; document the observed ceiling rather than guessing one
    ratio = sum(r.n_tokens for r in both) / max(
        sum(r.est for r in both), 1
    )
    assert 1.0 <= ratio <= 12.0, ratio


def test_vocab_ids_and_unk(trained):
    from connect_server_spark.operators.tokenizer import (
        UNK_ID,
        _encode_piece,
        bpe_vocab,
    )

    _, merges = trained
    vocab = bpe_vocab(merges)
    # ids are dense and unique
    assert sorted(vocab.values()) == list(range(len(vocab)))
    # every merged symbol is in the vocab
    for a, b in merges:
        assert a + b in vocab
    # a character the training corpus never saw → token survives (no
    # drop) but maps to UNK
    ranks = {p: i for i, p in enumerate(merges)}
    toks = _encode_piece("ᚠᚢᚦ", ranks)
    assert toks == ["ᚠ", "ᚢ", "ᚦ"]
    assert all(vocab.get(t, UNK_ID) == UNK_ID for t in toks)


def test_alphabet_keeps_unmerged_training_chars_out_of_unk(spark):
    """Real BPE vocabularies are alphabet + merges: a character the
    training corpus CONTAINS but never merges (rare punctuation, a
    one-off digit) must still map to a real id — only genuinely
    never-seen characters are UNK."""
    from connect_server_spark.operators.tokenizer import (
        UNK_ID,
        bpe_vocab,
        tokenize_bpe,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(i, "aa bb aa bb ~ zz") for i in range(4)], ["doc_id", "text"]
    )
    model = train_bpe(df, "text", num_merges=10, max_pieces=100)
    assert "~" in model["alphabet"]  # present in training, never merged
    vocab = bpe_vocab(model["merges"], model["alphabet"])
    assert "~" in vocab and vocab["~"] != UNK_ID
    out = tokenize_bpe(
        spark.createDataFrame([(1, "~ ✈")], ["doc_id", "text"]),
        "doc_id",
        "text",
        model["merges"],
        model["alphabet"],
    ).collect()[0]
    by_tok = dict(zip(out.tokens, out.token_ids))
    # trained char → real id; never-seen char → UNK
    assert by_tok["~"] >= 0
    assert by_tok["✈"] == UNK_ID


def test_tokenize_plan_is_single_arrow_boundary(spark, trained):
    from connect_server_spark.operators.tokenizer import tokenize_bpe

    df, merges = trained
    out = tokenize_bpe(df, "doc_id", "text", merges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_train_bpe_refuses_unbounded_driver_collect(spark):
    from connect_server_spark.operators.tokenizer import train_bpe

    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError, match="max_pieces"):
        train_bpe(df, "text", max_pieces=1_000_001)
