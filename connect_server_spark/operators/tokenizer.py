"""Merge-based BPE tokenization: train a merge table from corpus
statistics, apply it scan-stage, emit token IDs.

The reference system has no tokenizer (it is a metadata/submission
service); this is the LLM-training-pipeline surface: a pretraining job
ultimately feeds token IDs, and sequence packing
(:mod:`~connect_server_spark.operators.packing`) budgets on token
counts — :func:`~connect_server_spark.operators.text.bpe_token_estimate`
approximates that cost with no vocab, this module computes it exactly.

Scale design:

* **Training is bounded by vocabulary, not corpus.** The only
  distributed pass is a piece-frequency aggregation (explode →
  two narrow map-side-combined shuffles, the
  :func:`~connect_server_spark.operators.text.token_frequencies`
  shape); the merge loop runs driver-side over the top ``max_pieces``
  (piece, count) rows with incremental pair-count maintenance —
  O(pieces · merge-span), never O(corpus).
* **Application is one Arrow batch per partition.** The merge-rank
  table is closure-captured by a pandas UDF (the broadcast-model
  analog, exactly :func:`similarity.ivf_assign_udf`'s pattern) and
  every piece is memoized per batch, so repeated words cost one
  encode. Row-at-a-time Python is banned by the plan audit; this is
  the declared Arrow boundary.
* **Determinism end-to-end.** Sample selection, tie-breaks (count
  desc, then lexicographic pair), and greedy lowest-rank merging are
  all total orders — retraining on the same corpus reproduces the
  same merges, and executors reproduce the driver's segmentation
  symbol-for-symbol (property-tested against an independent naive
  reference in ``tests/test_tokenizer.py``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connect_server_spark.operators.text import BPE_SPLIT_RE

__all__ = [
    "piece_frequencies",
    "train_bpe",
    "train_bpe_merges",
    "bpe_vocab",
    "tokenize_bpe",
    "UNK_ID",
]

# Tokens assembled from characters never seen in training map to UNK —
# kept explicit and negative so downstream embedding lookups fail loudly.
UNK_ID = -1


def piece_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(piece, n) corpus frequencies of the GPT-2-style pre-tokenizer
    pieces — the word-frequency dictionary classic BPE trains on
    (Sennrich, Haddow & Birch, ACL 2016, "Neural Machine Translation of
    Rare Words with Subword Units": merges are learned from a word→count
    dict, never from running text). Two narrow map-side-combined
    shuffles; output cardinality is the piece vocabulary."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0)
                )
            ).alias("piece")
        )
        .filter(F.col("piece") != "")
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    max_pieces: int = 20000,
) -> dict:
    """Learn a BPE model from the corpus:
    ``{"merges": [(a, b), ...], "alphabet": [ch, ...]}`` — merges in
    rank order (rank = list position) plus the full training ALPHABET
    (every character of the trained pieces, merged or not), so the
    id space covers everything the corpus contains: a character that
    never participates in a merge must still get a real id, not UNK
    (real BPE vocabularies are alphabet + merges).

    The distributed part ends at ``piece_frequencies``; the driver pulls
    the ``max_pieces`` most frequent pieces (deterministic: count desc,
    piece asc — a TakeOrderedAndProject bounded merge, like the IVF
    training sample) and runs the merge loop locally with incremental
    pair-count updates: each round merges the (count-max, then
    lexicographically-least) adjacent symbol pair and touches only the
    pieces that contain it. Truncating to ``max_pieces`` is the standard
    frequency-threshold training cut — dropped singleton pieces cannot
    influence high-frequency merges.

    **Driver-memory bound**: the collected training set is
    ``max_pieces`` (piece, count) rows — at the 1e6 cap below, tens of
    MB — and the merge loop's pair indexes are proportional to total
    collected piece length, independent of corpus size (the corpus-side
    work is one distributed piece-frequency aggregation regardless of
    scale; measured walls in SCALE.md §tokenizer). ``max_pieces`` above
    1e6 is refused rather than silently risking the driver."""
    if max_pieces > 1_000_000:
        raise ValueError(
            "max_pieces > 1_000_000 would collect an unbounded training "
            "set onto the driver; raise the frequency cut instead"
        )
    top = (
        piece_frequencies(df, text_col)
        .orderBy(F.col("n").desc(), F.col("piece").asc())
        .limit(max_pieces)
        .collect()
    )
    pieces = [list(r.piece) for r in top]
    counts = [int(r.n) for r in top]

    # pair -> total count, pair -> {piece index} (incremental indexes)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_pieces: dict[tuple[str, str], set[int]] = {}

    def add_piece(idx: int, sign: int) -> None:
        syms, n = pieces[idx], counts[idx] * sign
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
            pair_pieces.setdefault((a, b), set()).add(idx)

    for i in range(len(pieces)):
        add_piece(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        # total order: count desc, then lexicographic pair asc
        best, best_n = min(live, key=lambda pc: (-pc[1], pc[0]))
        if best_n < 2:
            break  # a pair occurring once compresses nothing
        merges.append(best)
        merged = best[0] + best[1]
        for idx in list(pair_pieces.get(best, ())):
            syms = pieces[idx]
            if len(syms) < 2:
                continue
            add_piece(idx, -1)  # retract this piece's old pair counts
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            pieces[idx] = out
            add_piece(idx, +1)
    alphabet = sorted({c for r in top for c in r.piece})
    return {"merges": merges, "alphabet": alphabet}


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    max_pieces: int = 20000,
) -> list[tuple[str, str]]:
    """:func:`train_bpe`'s merge list alone (compat shim for callers
    that track the alphabet separately)."""
    return train_bpe(df, text_col, num_merges, max_pieces)["merges"]


def bpe_vocab(
    merges: list[tuple[str, str]], alphabet=()
) -> dict[str, int]:
    """token → id: base characters first (sorted union of the training
    ``alphabet`` and every merge's characters), then one entry per merge
    in rank order — the id space a retrain with the same model
    reproduces exactly. Only characters the training corpus NEVER
    contained map to :data:`UNK_ID` at encode time."""
    base = sorted(
        set(alphabet)
        | {c for pair in merges for sym in pair for c in sym if len(sym) == 1}
    )
    # merged symbols in creation order; base chars inside longer symbols
    # are guaranteed present because merges only combine existing symbols
    vocab = {c: i for i, c in enumerate(base)}
    nxt = len(vocab)
    for a, b in merges:
        sym = a + b
        if sym not in vocab:
            vocab[sym] = nxt
            nxt += 1
    return vocab


def _encode_piece(piece: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merging of one pre-tokenizer piece — the
    GPT-2 application algorithm. Equivalent to replaying merges in
    training order (a merge can only create pairs involving its OWN new
    symbol, whose merges all rank later), which is what the independent
    test reference exploits."""
    syms = list(piece)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = syms[best_i], syms[best_i + 1]
        merged, out, i = a + b, [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def tokenize_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    alphabet=(),
) -> DataFrame:
    """Segment every document with the trained merge table: returns
    ``(id, tokens array<string>, token_ids array<int>, n_tokens)``.

    One Arrow-batched pandas UDF evaluation per row batch; the merge
    ranks and vocab ship in the UDF closure (a few hundred KiB — the
    broadcast-model pattern), and a per-batch piece→tokens memo makes
    repeated words O(1). ``n_tokens`` is the EXACT count
    :func:`~connect_server_spark.operators.text.bpe_token_estimate`
    approximates — the estimate counts pre-merge pieces, so
    ``estimate <= n_tokens`` always, with the measured band pinned in
    ``tests/test_tokenizer.py``."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    vocab = bpe_vocab(merges, alphabet)
    split = re.compile(BPE_SPLIT_RE)

    @pandas_udf("struct<tokens:array<string>,token_ids:array<int>,n_tokens:int>")
    def encode(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, list[str]] = {}
        toks_out, ids_out, n_out = [], [], []
        for text in texts:
            toks: list[str] = []
            for piece in split.findall(text or ""):
                got = memo.get(piece)
                if got is None:
                    got = memo[piece] = _encode_piece(piece, ranks)
                toks.extend(got)
            toks_out.append(toks)
            ids_out.append([vocab.get(t, UNK_ID) for t in toks])
            n_out.append(len(toks))
        return pd.DataFrame(
            {"tokens": toks_out, "token_ids": ids_out, "n_tokens": n_out}
        )

    # two-step projection: the struct is aliased ONCE and the fields are
    # extracted from that alias — inlining encode(...) into three field
    # extractions would risk three UDF evaluations per row
    out = df.select(F.col(id_col), encode(F.col(text_col)).alias("_enc"))
    return out.select(
        F.col(id_col),
        F.col("_enc.tokens").alias("tokens"),
        F.col("_enc.token_ids").alias("token_ids"),
        F.col("_enc.n_tokens").alias("n_tokens"),
    )
