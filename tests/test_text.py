"""Unit tests for text-analysis operators."""

from pyspark.sql import functions as F

from connect_server_spark.operators.text import (
    alnum_token_count,
    doc_fingerprint,
    language_id,
    punct_ratio,
    quality_score,
    token_count,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["t"]).select(
        expr(F.col("t")).alias("out")
    ).collect()[0].out


def test_token_counts(spark):
    assert _one(spark, "The quick brown fox", token_count) == 4
    assert _one(spark, "don't stop-me now", alnum_token_count) == 5


def test_language_id(spark):
    assert _one(spark, "the cat sat on the mat with a hat", language_id) == "en"
    assert _one(spark, "el gato y la casa en un dia", language_id) == "es"
    assert _one(spark, "der hund und die katze ist hier", language_id) == "de"
    assert _one(spark, "lorem ipsum dolor sit amet", language_id) == "und"


def test_punct_ratio(spark):
    assert _one(spark, "abcde!!!!!", punct_ratio) == 0.5


def test_quality_prefers_clean_english(spark):
    good = _one(spark, "the quick brown fox jumps over the lazy dog", quality_score)
    bad = _one(spark, "@@@@ #### $$$$ %%%%", quality_score)
    assert good > bad


def test_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", doc_fingerprint)
    b = _one(spark, "gamma beta alpha", doc_fingerprint)
    c = _one(spark, "alpha beta gamma", doc_fingerprint)
    assert a == c and a != b


def test_dup_line_ratio(spark):
    from connect_server_spark.operators.text import dup_line_ratio

    spam = "buy now\nbuy now\nbuy now\nlimited offer"
    assert _one(spark, spam, dup_line_ratio) == 0.5  # 2 dup lines of 4
    prose = "first line\nsecond line\nthird line"
    assert _one(spark, prose, dup_line_ratio) == 0.0
    # blank lines are ignored, trailing whitespace is trimmed
    assert _one(spark, "a\n\n a \n\nb", dup_line_ratio) == round(1 / 3, 6)


def test_top_ngram_share(spark):
    from connect_server_spark.operators.text import top_ngram_share

    looped = "spam ham spam ham spam ham spam"  # 'spam ham' 2-gram x3 of 6
    assert _one(spark, looped, top_ngram_share) == 0.5
    varied = "one two three four five six"
    assert _one(spark, varied, top_ngram_share) == round(1 / 5, 6)
    # degenerate: one 2-gram -> share 1, no shingles -> 0
    assert _one(spark, "just two", top_ngram_share) == 1.0
    assert _one(spark, "solo", top_ngram_share) == 0.0


def test_pii_flags_and_scrub(spark):
    from connect_server_spark.operators.text import pii_flags, pii_scrub

    text = (
        "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567; "
        "card 4111 1111 1111 1111 expires soon"
    )
    flags = _one(spark, text, pii_flags)
    assert flags.email == 1 and flags.phone >= 1 and flags.card >= 1
    scrubbed = _one(spark, text, pii_scrub)
    assert "<EMAIL>" in scrubbed and "<PHONE>" in scrubbed and "<CARD>" in scrubbed
    assert "example.co.uk" not in scrubbed
    assert "4111" not in scrubbed
    clean = _one(spark, "no contact details in this text", pii_scrub)
    assert clean == "no contact details in this text"


def test_text_metric_invariants_on_adversarial_corpus(spark):
    """Range/idempotence invariants over a seeded corpus of edge cases:
    empties, whitespace, newline soup, unicode, heavy repetition, PII.
    One Spark job for the whole batch."""
    import random

    from connect_server_spark.operators.text import (
        dup_line_ratio,
        pii_flags,
        pii_scrub,
        quality_score,
        top_ngram_share,
    )

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "x1", "café", "Ω", "a@b.io", "42"]
    rows = [
        "", " ", "\n\n\n", "one", "a b", "same\nsame\nsame",
        "no newline just words " * 30,
        "spam ham " * 50,
        "é ü ñ 漢字 emoji ☃",
        "reach me: bob@corp.example and +44 20 7946 0958",
        "cards 4111 1111 1111 1111 and 5500-0000-0000-0004",
    ] + [
        " ".join(rng.choice(words) for _ in range(rng.randint(0, 40)))
        + ("\n" * rng.randint(0, 3))
        for _ in range(150)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], ["i", "t"])
    t = F.col("t")
    out = df.select(
        "i",
        dup_line_ratio(t).alias("dlr"),
        top_ngram_share(t, 2).alias("tgs"),
        quality_score(t).alias("q"),
        pii_flags(pii_scrub(t)).alias("flags_after_scrub"),
        (pii_scrub(pii_scrub(t)) == pii_scrub(t)).alias("scrub_idempotent"),
    ).collect()
    for r in out:
        assert 0.0 <= r.dlr <= 1.0, (r.i, r.dlr)
        assert 0.0 <= r.tgs <= 1.0, (r.i, r.tgs)
        assert 0 <= r.q <= 10_000_000, (r.i, r.q)
        assert r.flags_after_scrub.email == 0, r.i
        assert r.flags_after_scrub.card == 0, r.i
        assert r.flags_after_scrub.phone == 0, r.i
        assert r.scrub_idempotent, r.i


def test_decontaminate_drops_leaking_docs(spark):
    from connect_server_spark.operators.curation import (
        contaminated_ids,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [("what is the capital of france paris is",)], ["q"]
    )
    docs = spark.createDataFrame(
        [
            (1, "trivia time what is the capital of france paris is correct"),
            (2, "a completely unrelated training document about spark plans"),
            (3, "another clean document with enough words to shingle over"),
        ],
        ["doc_id", "text"],
    )
    hits = {r.doc_id for r in contaminated_ids(
        docs, __import__("connect_server_spark.operators.curation",
                         fromlist=["benchmark_ngrams"]).benchmark_ngrams(
            bench, "q", 6), "doc_id", "text", 6).collect()}
    assert hits == {1}
    kept = {r.doc_id for r in
            decontaminate(docs, bench, "doc_id", "text", "q", 6).collect()}
    assert kept == {2, 3}


def test_decontaminate_plan_broadcasts_benchmark(spark):
    from connect_server_spark.operators.curation import decontaminate

    bench = spark.createDataFrame([("a b c d e f",)], ["q"])
    docs = spark.createDataFrame([(1, "x y z w v u")], ["doc_id", "text"])
    plan = (
        decontaminate(docs, bench, "doc_id", "text", "q", 6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_bloom_no_false_negatives_and_fpr_budget(spark):
    """Equivalence modulo the one-sided FPR: every id the exact sweep
    flags is flagged by the bloom sweep (no false negatives — a leaked
    document can never survive), and on a corpus of clean documents the
    extra drops stay within the sized false-positive budget."""
    from connect_server_spark.operators.curation import (
        benchmark_bloom,
        benchmark_ngrams,
        contaminated_ids,
        contaminated_ids_bloom,
        decontaminate_bloom,
    )

    def words(tag, n=12):
        return " ".join(f"{tag}w{j}" for j in range(n))

    bench = spark.createDataFrame(
        [(words(f"b{i}"),) for i in range(20)], ["q"]
    )
    # 10 leaking docs (contain a full benchmark row) + 300 clean docs
    docs = spark.createDataFrame(
        [(i, f"prefix {words(f'b{i}')} suffix") for i in range(10)]
        + [(1000 + i, words(f"c{i}")) for i in range(300)],
        ["doc_id", "text"],
    )
    exact = {
        r.doc_id
        for r in contaminated_ids(
            docs, benchmark_ngrams(bench, "q", 6), "doc_id", "text", 6
        ).collect()
    }
    assert exact == set(range(10))
    bloom_words, n_words = benchmark_bloom(bench, "q", 6)
    got = {
        r.doc_id
        for r in contaminated_ids_bloom(
            docs, bloom_words, n_words, "doc_id", "text", 6
        ).collect()
    }
    assert exact <= got  # no false negatives, structurally
    # FPR budget: default sizing targets ~3e-3 per probed gram; with ~7
    # grams per clean doc the per-doc budget is well under 5%
    false_pos = len(got - exact)
    assert false_pos <= 15, (false_pos, sorted(got - exact)[:5])

    kept = {
        r.doc_id
        for r in decontaminate_bloom(
            docs, bench, "doc_id", "text", "q", 6
        ).collect()
    }
    assert kept.isdisjoint(exact) and kept == {
        1000 + i for i in range(300)
    } - (got - exact)


def test_decontaminate_bloom_plan_never_shuffles_corpus(spark):
    """The corpus side of the bloom sweep is explode → broadcast
    equi-join → id distinct: the only Exchanges carry the bloom words
    (bounded by the filter size) and the candidate ids — never corpus
    text. One broadcast join total (one probe per gram, not per hash
    function), no cartesian, no Python."""
    from connect_server_spark.operators.curation import decontaminate_bloom

    bench = spark.createDataFrame([("a b c d e f g h",)], ["q"])
    docs = spark.createDataFrame(
        [(1, "x y z w v u t s")], ["doc_id", "text"]
    )
    out = decontaminate_bloom(docs, bench, "doc_id", "text", "q", 6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan  # pure Catalyst, both sides
    # no Exchange consumes a plan branch containing the corpus text
    # column: text appears only below the (exchange-free) gram explode
    for line in plan.splitlines():
        if "Exchange" in line and "ReusedExchange" not in line:
            assert "text" not in line, line


def test_stratified_sample_deterministic_and_proportional(spark):
    from connect_server_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(4000)],
        ["id", "stratum"],
    )
    frac = F.when(F.col("stratum") == "a", F.lit(0.5)).otherwise(F.lit(0.1))
    s1 = stratified_sample(df, "id", frac, seed="t:").collect()
    s2 = stratified_sample(df, "id", frac, seed="t:").collect()
    assert {r.id for r in s1} == {r.id for r in s2}  # pure function of key
    by = {"a": 0, "b": 0}
    for r in s1:
        by[r.stratum] += 1
    assert abs(by["a"] / 2000 - 0.5) < 0.05
    assert abs(by["b"] / 2000 - 0.1) < 0.03
    # a different seed draws a different sample
    s3 = {r.id for r in stratified_sample(df, "id", frac, seed="u:").collect()}
    assert s3 != {r.id for r in s1}


def test_bpe_token_estimate_pieces(spark):
    """Pin the GPT-2-pre-tokenizer piece count on hand-counted cases; the
    pattern's alternatives are position-disjoint so Java regex and the
    DuckDB oracle (RE2) agree — the gated query proves that at corpus
    scale, this pins the absolute values."""
    from connect_server_spark.operators.text import bpe_token_estimate

    cases = [
        ("hello world", 2),            # "hello", " world"
        ("don't stop", 3),             # "don", "'t", " stop"
        ("a1b2", 4),                   # letter/digit runs alternate
        ("x  y", 3),                   # "x", " ", " y": double space leaves one ws piece
        ("price: $4,200.50!", 9),      # "price", ":", " $", "4", ",", "200", ".", "50", "!"
        ("", 0),
        ("'", 1),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
    )
    got = {
        r.i: r.n
        for r in df.select(
            "i", bpe_token_estimate(F.col("t")).alias("n")
        ).collect()
    }
    for i, (text, want) in enumerate(cases):
        assert got[i] == want, f"{text!r}: got {got[i]}, want {want}"


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _BPE_TEXT = st.text(
        alphabet=st.characters(
            min_codepoint=9, max_codepoint=126, exclude_categories=("Cc",)
        )
        | st.sampled_from([" ", "\n", "\t", "'"]),
        max_size=80,
    )

    @given(text=_BPE_TEXT)
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_bpe_token_estimate_matches_python_re(spark, text):
        """Java regex (Spark) == Python re (leftmost-first reference) on
        arbitrary printable strings; the gated text_analysis oracle pins
        the third engine (DuckDB/RE2) at corpus scale."""
        import re

        from connect_server_spark.operators.text import (
            BPE_SPLIT_RE,
            bpe_token_estimate,
        )

        want = len(re.findall(BPE_SPLIT_RE, text))
        df = spark.createDataFrame([(text,)], "t string")
        [r] = df.select(bpe_token_estimate(F.col("t")).alias("n")).collect()
        assert r.n == want, repr(text)


def test_bpe_token_estimate_vertical_tab_consistency(spark):
    """Review pin: \\x0b sits inside Java's \\s but outside RE2's — the
    pattern's explicit ASCII whitespace class keeps it a PUNCTUATION run
    in every engine, so the count stays oracle-identical."""
    import re

    from connect_server_spark.operators.text import (
        BPE_SPLIT_RE,
        bpe_token_estimate,
    )

    text = "a\x0b\x0b b"
    want = len(re.findall(BPE_SPLIT_RE, text))
    df = spark.createDataFrame([(text,)], "t string")
    [r] = df.select(bpe_token_estimate(F.col("t")).alias("n")).collect()
    assert r.n == want == 3  # "a", "\x0b\x0b", " b"

    import duckdb

    sql_pat = BPE_SPLIT_RE.replace("'", "''")
    [(oracle_n,)] = duckdb.connect().execute(
        f"SELECT len(regexp_extract_all('a' || chr(11) || chr(11) || ' b', '{sql_pat}', 0))"
    ).fetchall()
    assert oracle_n == r.n


def test_vocab_top_tokens_matches_duckdb_mirror(spark, sf_dir):
    """Oracle-grade check outside the driver's 50-query gate window:
    the vocab query's exact rows vs DuckDB — via the SHARED module
    constant, promotion-ready verbatim."""
    import duckdb

    from connect_server_spark.queries.text_queries import (
        VOCAB_TOP_TOKENS_ORACLE_SQL,
        vocab_top_tokens,
    )

    got = [
        (r.token, r.n_occurrences, r.n_docs)
        for r in vocab_top_tokens(spark, sf_dir).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(VOCAB_TOP_TOKENS_ORACLE_SQL).fetchall()
    assert got == want


def test_top_tokens_plan_no_expand_and_bounded_limit(spark):
    from connect_server_spark.operators.text import top_tokens

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], ["doc_id", "text"]
    )
    out = top_tokens(df, "doc_id", "text", 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # no count-distinct rewrite
    assert "TakeOrderedAndProject" in plan  # top-k merge, never full sort
    rows = [(r.token, r.n_occurrences, r.n_docs) for r in out.collect()]
    assert rows == [("a", 2, 1), ("b", 2, 2)]


def test_lm_quality_matches_python_reference_and_ranks_gibberish_low(spark):
    """The unigram LM scores equal a python reference exactly (rounded
    grid), OOV accounting is exact under a truncated vocab, and fluent
    corpus-like text outranks rare-token soup — the property the CCNet
    filter thresholds on."""
    import math
    import re
    from collections import Counter

    from connect_server_spark.operators.text import (
        lm_quality_scores,
        unigram_lm,
    )

    rows = [
        (1, "the cat sat on the mat and the dog sat on the rug"),
        (2, "the dog and the cat sat on the warm mat again today"),
        (3, "zxqv wvut qqpl mmnn kkjj hhgg"),  # rare-token soup
        (4, "the the the the the"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    vocab, oov = unigram_lm(df, "doc_id", "text", vocab_size=8)  # truncated
    got = {
        r.doc_id: (r.avg_logprob, r.n_oov, r.n_scored_tokens)
        for r in lm_quality_scores(df, vocab, oov, "doc_id", "text").collect()
    }

    def toks(t):
        return re.sub(r"\s+", " ", t.lower()).strip().split(" ")

    cnt = Counter(tok for _, t in rows for tok in toks(t))
    total = sum(cnt.values())
    top = {
        tok: round(math.log(n / total), 6)
        for tok, n in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    }
    oov_ref = round(math.log(0.5 / total), 6)
    assert oov == oov_ref
    for doc_id, text in rows:
        lps = [top.get(tok, oov_ref) for tok in toks(text)]
        want = (
            round(sum(lps) / len(lps), 6),
            sum(1 for tok in toks(text) if tok not in top),
            len(lps),
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    # fluent text above soup; "the the the" is the most typical of all
    assert got[4][0] > got[1][0] > got[3][0]
    assert got[2][0] > got[3][0]


def test_lm_quality_plan_broadcasts_vocab(spark):
    from connect_server_spark.operators.text import (
        lm_quality_scores,
        unigram_lm,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")], ["doc_id", "text"]
    )
    vocab, oov = unigram_lm(df, "doc_id", "text", vocab_size=4)
    plan = (
        lm_quality_scores(df, vocab, oov, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_corpus_line_dedup_matches_python_reference(spark, sf_dir):
    """End-to-end CCNet line dedup on the re-lined corpus vs a pure
    python reference: identical cleaned digests and removal counts."""
    import hashlib

    import pandas as pd

    from connect_server_spark.queries.text_queries import corpus_line_dedup

    got = {
        r.doc_id: (r.clean_digest, r.clean_chars, r.n_lines, r.n_removed)
        for r in corpus_line_dedup(spark, sf_dir).collect()
    }

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    relined = {}
    for _, row in docs.iterrows():
        words = row["text"].split(" ")
        chunks = [
            " ".join(words[i : i + 8]) for i in range(0, len(words), 8)
        ]
        relined[row["doc_id"]] = "\n".join(chunks)
    from collections import Counter

    docfreq = Counter()
    for text in relined.values():
        seen = {ln.strip() for ln in text.split("\n") if ln.strip()}
        docfreq.update(seen)
    boiler = {ln for ln, n in docfreq.items() if n >= 3}
    want = {}
    for doc_id, text in relined.items():
        lines = text.split("\n")
        kept = [ln for ln in lines if ln.strip() not in boiler]
        clean = "\n".join(kept)
        want[doc_id] = (
            hashlib.md5(clean.encode()).hexdigest(),
            len(clean),
            len(lines),
            len(lines) - len(kept),
        )
    assert got == want
    assert sum(w[3] for w in want.values()) > 0, "fixture has no boilerplate"


def test_remove_boilerplate_lines_semantics(spark):
    """Order survives, all-boilerplate docs persist with empty text, and
    sub-min_chars lines are exempt (never counted, never removed)."""
    from connect_server_spark.operators.curation import (
        remove_boilerplate_lines,
    )

    rows = [
        (1, "cookie banner\nunique alpha\nx\ncookie banner"),
        (2, "cookie banner\nunique beta"),
        (3, "cookie banner"),
        (4, "unique gamma\nx"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.text, r.n_lines, r.n_removed)
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", min_docs=3, min_chars=2
        ).collect()
    }
    assert out[1] == ("unique alpha\nx", 4, 2)   # order kept; 'x' exempt
    assert out[2] == ("unique beta", 2, 1)
    assert out[3] == ("", 1, 1)                   # row survives empty
    assert out[4] == ("unique gamma\nx", 2, 0)


def test_corpus_release_diff_matches_duckdb_mirror(spark, sf_dir):
    """Full DuckDB recomputation of the release diff — same null-tagged
    unit-separated md5 payload digests, same status classification."""
    import duckdb

    from connect_server_spark.queries.text_queries import corpus_release_diff

    got = sorted(
        (r.doc_id, r.status, r.old_digest, r.new_digest)
        for r in corpus_release_diff(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    dig = (
        "md5(coalesce(text, chr(0)||'NULL') || chr(31) || "
        "coalesce(lang, chr(0)||'NULL') || chr(31) || "
        "coalesce(source, chr(0)||'NULL'))"
    )
    want = con.execute(f"""
        WITH oldd AS (
          SELECT doc_id, {dig} AS old_digest
          FROM documents WHERE doc_id % 11 <> 0
        ),
        newd AS (
          SELECT doc_id, {dig} AS new_digest
          FROM (
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                        ELSE text END AS text,
                   lang, source
            FROM documents WHERE doc_id % 7 <> 0
          )
        )
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.old_digest = n.new_digest THEN 'unchanged'
                    ELSE 'changed' END AS status,
               o.old_digest, n.new_digest
        FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id
        ORDER BY 1
    """).fetchall()
    assert len(got) > 0
    assert got == sorted(tuple(w) for w in want)
    statuses = {s for _, s, _, _ in got}
    assert statuses == {"added", "removed", "changed", "unchanged"}
