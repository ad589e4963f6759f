"""Corpus-sampling family: temperature mixing, DSIR importance
resampling, cluster-balanced diversity sampling.

The three driver queries register rows-only; their oracle-grade gates
live here — a full DuckDB SQL mirror for the mixing gate, a DuckDB score
mirror + pure-Python Gumbel-selection reference for DSIR, and a NumPy
re-ranking reference for the diversity sampler.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_server_spark.operators.sampling import (
    diversity_sample,
    hash_uniform,
    importance_resample,
    importance_weights,
    mix_corpus,
    source_mixing_rates,
)
from connect_server_spark.queries.sampling_queries import (
    DSIR_K,
    MIX_ALPHA,
    MIX_FRACTION,
    corpus_mixing,
    dsir_resample,
    embeddings_diversity_sample,
)
from connect_server_spark.tables import load_table

TOKEN_SQL = (
    "unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))"
)


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


# --------------------------------------------------------------- mixing


def test_corpus_mixing_matches_duckdb_mirror(spark, sf_dir):
    """Since r9 the same SQL is the driver's gated oracle (imported
    from sampling_queries so the two can never drift)."""
    from connect_server_spark.queries.sampling_queries import (
        CORPUS_MIXING_ORACLE_SQL,
    )

    got = sorted(map(tuple, corpus_mixing(spark, sf_dir).collect()))
    con = _con(sf_dir)
    want = sorted(
        map(tuple, con.execute(CORPUS_MIXING_ORACLE_SQL).fetchall())
    )
    assert len(got) > 0
    assert got == want


def _skewed(spark):
    rows = (
        [Row(doc_id=i, source="big") for i in range(900)]
        + [Row(doc_id=900 + i, source="small") for i in range(100)]
    )
    return spark.createDataFrame(rows)


def test_mixing_alpha_semantics(spark):
    """alpha=1 keeps natural proportions (equal rates); alpha<1
    up-weights the small source; alpha=0 targets equal counts."""
    df = _skewed(spark)
    natural = {
        r.source: r.keep_rate
        for r in source_mixing_rates(df, "source", 1.0, 500).collect()
    }
    assert natural["big"] == pytest.approx(natural["small"], abs=1e-9)

    sqrt = {
        r.source: r.keep_rate
        for r in source_mixing_rates(df, "source", 0.5, 500).collect()
    }
    assert sqrt["small"] > sqrt["big"]

    # alpha=0 equalizes EXPECTED COUNTS (rate_s·n_s) — pick a target
    # small enough that the small source's rate doesn't cap at 1.
    equal = {
        r.source: (r.keep_rate, r.n_rows)
        for r in source_mixing_rates(df, "source", 0.0, 150).collect()
    }
    assert equal["big"][0] * equal["big"][1] == pytest.approx(
        equal["small"][0] * equal["small"][1], rel=1e-6
    )
    # and a rate that WOULD exceed 1 caps at 1 (a source can't produce
    # more rows than it has)
    capped = {
        r.source: r.keep_rate
        for r in source_mixing_rates(df, "source", 0.0, 500).collect()
    }
    assert capped["small"] == 1.0


def test_mixing_deterministic_and_near_target(spark):
    df = _skewed(spark)
    a = sorted(r.doc_id for r in
               mix_corpus(df, "doc_id", "source", 0.5, 500).collect())
    b = sorted(r.doc_id for r in
               mix_corpus(df, "doc_id", "source", 0.5, 500).collect())
    assert a == b
    # binomial(1000, ~0.5): 5 sigma ≈ 79
    assert abs(len(a) - 500) < 80
    # a different seed draws a different sample at the same rates
    c = sorted(
        r.doc_id
        for r in mix_corpus(df, "doc_id", "source", 0.5, 500,
                            seed="other").collect()
    )
    assert a != c


def test_mixing_plan_broadcasts_rates_no_corpus_shuffle(spark, sf_dir):
    """The corpus side must reach the gate without an Exchange: the only
    shuffle is the per-source count; the rate table joins broadcast."""
    docs = load_table(spark, "documents", sf_dir)
    plan = (
        mix_corpus(docs, "doc_id", "source", 0.5, 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ----------------------------------------------------------------- DSIR


def test_dsir_scores_match_duckdb_mirror(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    target = docs.filter(F.col("lang") == "en")
    got = sorted(map(tuple, importance_weights(
        docs, "doc_id", "text", target, vocab_size=20000
    ).collect()))
    want = sorted(map(tuple, _con(sf_dir).execute("""
        WITH tok_all AS (
          SELECT doc_id, {tok} AS token FROM documents
        ),
        tok AS (SELECT * FROM tok_all WHERE token <> ''),
        tok_t_all AS (
          SELECT doc_id, {tok} AS token FROM documents WHERE lang = 'en'
        ),
        tok_t AS (SELECT * FROM tok_t_all WHERE token <> ''),
        raw_total AS (SELECT count(*) AS t FROM tok),
        t_total AS (SELECT count(*) AS t FROM tok_t),
        raw_vocab AS (
          SELECT token, round(ln(count(*) / (SELECT t FROM raw_total)), 6)
                   AS logp_r
          FROM tok GROUP BY token
          ORDER BY count(*) DESC, token ASC LIMIT 20000
        ),
        t_vocab AS (
          SELECT token, round(ln(count(*) / (SELECT t FROM t_total)), 6)
                   AS logp_t
          FROM tok_t GROUP BY token
          ORDER BY count(*) DESC, token ASC LIMIT 20000
        )
        SELECT k.doc_id,
               round(sum(
                 coalesce(tv.logp_t,
                          round(ln(0.5 / (SELECT t FROM t_total)), 6))
                 - coalesce(rv.logp_r,
                            round(ln(0.5 / (SELECT t FROM raw_total)), 6))
               ), 6) AS dsir_score,
               count(*) AS n_scored_tokens
        FROM tok k
        LEFT JOIN t_vocab tv USING (token)
        LEFT JOIN raw_vocab rv USING (token)
        GROUP BY k.doc_id
    """.format(tok=TOKEN_SQL)).fetchall()))
    assert len(got) > 0
    assert got == want


def _py_gumbel_key(doc_id, score, seed="dsir", temperature=1.0):
    h = hashlib.md5((seed + str(doc_id)).encode()).hexdigest()
    u = (int(h[:8], 16) + 0.5) / 2**32
    return round(score / temperature + (-math.log(-math.log(u))), 6)


def test_dsir_gumbel_selection_matches_python_reference(spark, sf_dir):
    """The Gumbel-top-k draw, recomputed independently from the scores
    with hashlib: same keys, same winning set."""
    docs = load_table(spark, "documents", sf_dir)
    target = docs.filter(F.col("lang") == "en")
    scores = {
        r.doc_id: r.dsir_score
        for r in importance_weights(
            docs, "doc_id", "text", target, vocab_size=20000
        ).collect()
    }
    k = min(DSIR_K, len(scores))
    want = sorted(
        scores, key=lambda d: (-_py_gumbel_key(d, scores[d]), d)
    )[:k]
    got = dsir_resample(spark, sf_dir).collect()
    assert sorted(r.doc_id for r in got) == sorted(want)
    for r in got:
        assert r.gumbel_key == pytest.approx(
            _py_gumbel_key(r.doc_id, r.dsir_score), abs=2e-6
        )


def test_dsir_favors_target_domain(spark, sf_dir):
    """Sanity on the signal itself: English documents must outscore the
    non-Latin-script subset under an English-target LM."""
    docs = load_table(spark, "documents", sf_dir)
    target = docs.filter(F.col("lang") == "en")
    w = importance_weights(docs, "doc_id", "text", target).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r.lang: r.m
        for r in w.groupBy("lang").agg(F.avg("dsir_score").alias("m")).collect()
    }
    assert means["en"] > means["zh"]


def test_importance_weights_predicate_path_identical(spark, sf_dir):
    """r12 fused dual-LM path (one tokenization pass, one build action)
    must be VALUE-IDENTICAL to the generic two-chain path — same score
    for every document, digit for digit (the dsir_resample oracle gate
    rests on this)."""
    docs = load_table(spark, "documents", sf_dir)
    old = sorted(
        map(
            tuple,
            importance_weights(
                docs, "doc_id", "text", docs.filter(F.col("lang") == "en")
            ).collect(),
        )
    )
    new = sorted(
        map(
            tuple,
            importance_weights(
                docs,
                "doc_id",
                "text",
                None,
                target_predicate=F.col("lang") == "en",
            ).collect(),
        )
    )
    assert old == new


def test_hash_uniform_in_unit_interval(spark):
    df = spark.range(1000).select(hash_uniform(F.col("id"), "s").alias("u"))
    lo, hi, avg = df.agg(F.min("u"), F.max("u"), F.avg("u")).first()
    assert 0.0 < lo and hi < 1.0
    assert 0.4 < avg < 0.6


def test_importance_resample_k_bound(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    target = docs.filter(F.col("lang") == "en")
    out = importance_resample(docs, "doc_id", "text", target, k=7)
    assert out.count() == 7


# ------------------------------------------------------------ diversity


def test_diversity_sample_invariants(spark, sf_dir):
    out = embeddings_diversity_sample(spark, sf_dir).collect()
    assert len(out) > 0
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, rows in by_cell.items():
        assert len(rows) <= 10
        ranks = sorted(r.cell_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        # ranked nearest-first
        ordered = sorted(rows, key=lambda r: r.cell_rank)
        cosines = [r.centroid_cos for r in ordered]
        assert cosines == sorted(cosines, reverse=True)
    # deterministic
    again = embeddings_diversity_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_diversity_sample_matches_numpy_reference(spark, sf_dir):
    """Assignment + per-cell ranking recomputed in NumPy from the same
    deterministic centroids."""
    from connect_server_spark.operators.similarity import train_ivf_centroids

    emb = load_table(spark, "embeddings", sf_dir)
    cents = train_ivf_centroids(emb, 8)
    got = sorted(
        (r.vec_id, r.cell, r.cell_rank)
        for r in diversity_sample(
            emb, nlist=8, quota=5, centroids=cents
        ).collect()
    )

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    owner = np.argmax(vn @ cn.T, axis=1)
    # centroid_cos as the operator computes it: raw vec vs raw centroid
    cos = np.array([
        float(np.dot(vecs[i], cents[owner[i]]))
        / (np.linalg.norm(vecs[i]) * np.linalg.norm(cents[owner[i]]))
        for i in range(len(ids))
    ])
    want = []
    for cell in range(8):
        members = [
            (round(cos[i], 6), int(ids[i]))
            for i in range(len(ids)) if owner[i] == cell
        ]
        members.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c, vid) in enumerate(members[:5], start=1):
            want.append((vid, cell, rank))
    assert got == sorted(want)


def test_diversity_sample_quota_caps_hot_cluster(spark):
    """A corpus that is 90% one duplicated direction still yields at most
    quota rows from that mode — the balanced-coverage property."""
    rng = np.random.RandomState(3)
    hot = [
        Row(vec_id=i, embedding=[1.0 + rng.rand() * 1e-3, 0.0, 0.0])
        for i in range(90)
    ]
    rest = [
        Row(vec_id=100 + i,
            embedding=[float(x) for x in rng.randn(3)])
        for i in range(10)
    ]
    df = spark.createDataFrame(hot + rest)
    out = diversity_sample(df, nlist=4, quota=3, sample_size=100).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, 0)
        by_cell[r.cell] += 1
    assert all(n <= 3 for n in by_cell.values())
    assert len(out) <= 12


# ------------------------------------------------------------- quantile


def test_filter_top_quantile_keeps_target_fraction(spark):
    from connect_server_spark.operators.sampling import (
        filter_top_quantile,
        quantile_threshold,
    )

    df = spark.range(10000).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), 100000) / 1000.0).alias("score"),
    )
    kept = filter_top_quantile(df, "score", 0.3, relative_error=0.001)
    frac = kept.count() / 10000
    assert 0.29 <= frac <= 0.31
    # the threshold really is ~the 70th percentile of the data
    import numpy as np

    scores = np.array([r.score for r in df.collect()])
    thr = quantile_threshold(df, "score", 0.3, relative_error=0.001)
    rank = (scores < thr).mean()
    assert abs(rank - 0.7) < 0.005
    # deterministic
    assert kept.count() == filter_top_quantile(df, "score", 0.3).count()


def test_filter_top_quantile_tied_scores_keep_whole_groups(spark):
    from connect_server_spark.operators.sampling import filter_top_quantile

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).alias("score")  # 4 tie groups
    )
    # asking for the top 20% lands the cutoff INSIDE the score==3 tie
    # group (25% of rows): the gate keeps the whole group — 250 rows,
    # not a split 200 (a fraction on an exact group boundary is
    # rank-ambiguous within sketch error, by design).
    kept = filter_top_quantile(df, "score", 0.2)
    assert kept.count() == 250
    assert kept.agg(F.min("score")).first()[0] == 3


def test_quantile_threshold_validates_fraction(spark):
    from connect_server_spark.operators.sampling import quantile_threshold

    df = spark.range(10).select(F.col("id").cast("double").alias("s"))
    with pytest.raises(ValueError, match="keep_top_fraction"):
        quantile_threshold(df, "s", 0.0)
    with pytest.raises(ValueError, match="keep_top_fraction"):
        quantile_threshold(df, "s", 1.5)


def test_discover_domains_matches_numpy_reference(spark, sf_dir):
    """Cluster assignment + per-domain stats + mixing rates recomputed in
    numpy/python over the same parquet and the same trained centroids."""
    import pandas as pd

    from connect_server_spark.operators.sampling import discover_domains
    from connect_server_spark.operators.similarity import (
        train_ivf_centroids,
    )

    docs_df = load_table(spark, "documents", sf_dir)
    emb_df = load_table(spark, "embeddings", sf_dir)
    got = {
        r.domain: (r.n_rows, r.n_tokens, r.avg_chars, r.mix_weight, r.keep_rate)
        for r in discover_domains(
            docs_df, emb_df, nlist=8, alpha=0.5, target_total=300
        ).collect()
    }

    cents = np.asarray(
        train_ivf_centroids(emb_df, 8, seed=17), dtype=np.float64
    )
    cents = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    vecs = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
    )
    domain_of = dict(
        zip(emb["vec_id"].tolist(), np.argmax(vecs @ cents.T, axis=1).tolist())
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    stats = {}
    for _, row in docs.iterrows():
        d = domain_of.get(row["doc_id"])
        if d is None:
            continue
        n, toks, chars = stats.get(d, (0, 0, 0))
        stats[d] = (n + 1, toks + len(row["text"].split()), chars + len(row["text"]))
    total_w = sum(n ** 0.5 for n, _, _ in stats.values())
    want = {}
    for d, (n, toks, chars) in stats.items():
        w = n ** 0.5 / total_w
        want[d] = (
            n,
            toks,
            round(chars / n, 6),
            round(w, 9),
            round(min(1.0, 300 * w / n), 9),
        )
    assert got == want


def test_discover_domains_invariants(spark, sf_dir):
    from connect_server_spark.operators.sampling import discover_domains

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    rows = discover_domains(
        docs, emb, nlist=4, alpha=0.5, target_total=100
    ).collect()
    assert {r.domain for r in rows} <= set(range(4))
    assert sum(r.n_rows for r in rows) == docs.count()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-6
    assert all(0.0 < r.keep_rate <= 1.0 for r in rows)


def _py_hash_uniform(key, seed=""):
    bits = int(hashlib.md5((seed + str(key)).encode()).hexdigest()[:8], 16)
    return (bits + 0.5) / 4294967296.0


def test_token_budget_sample_matches_python_prefix_mirror(spark, sf_dir):
    """token_budget_sample ≡ the python reference: per source, sort docs
    by (hash_uniform, id) and keep the maximal prefix whose token sum
    stays ≤ budget — the bucket classification is an optimization, never
    a semantics change (n_buckets small enough here that every class —
    whole-kept, boundary, whole-dropped — actually occurs)."""
    from connect_server_spark.operators.sampling import token_budget_sample
    from connect_server_spark.operators.text import token_count

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    budget = 800
    kept = token_budget_sample(
        docs, "doc_id", "n_tokens", budget, source_col="source", n_buckets=16
    ).collect()
    got = {r.doc_id for r in kept}
    assert sorted(kept[0].asDict()) == ["doc_id", "n_tokens", "source"]

    rows = docs.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    want = set()
    for src, members in by_src.items():
        members.sort(key=lambda r: (_py_hash_uniform(r.doc_id, "budget"), r.doc_id))
        run = 0
        for r in members:
            if run + r.n_tokens > budget:
                break
            run += r.n_tokens
            want.add(r.doc_id)
    assert got == want

    # per-source cap + maximality: adding the next hash-ordered doc
    # would exceed the budget for every source that was actually cut
    kept_by_src = {}
    for r in kept:
        kept_by_src[r.source] = kept_by_src.get(r.source, 0) + r.n_tokens
    assert all(v <= budget for v in kept_by_src.values())
    n_cut = 0
    for src, members in by_src.items():
        kept_toks = kept_by_src.get(src, 0)
        nxt = next((r for r in members if r.doc_id not in want), None)
        if nxt is not None:
            n_cut += 1
            assert kept_toks + nxt.n_tokens > budget, src
    assert n_cut > 0  # the budget actually cuts at this sf


def test_token_budget_sample_global_and_degenerate(spark):
    """source_col=None caps the whole frame; a budget below the smallest
    document keeps nothing; a budget above the total keeps everything;
    zero-token docs never break the prefix (monotone running sum)."""
    from connect_server_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(i, 10 * (1 + i % 3)) for i in range(30)] + [(100, 0)],
        ["doc_id", "n_tokens"],
    )
    total = sum(r.n_tokens for r in df.collect())
    assert token_budget_sample(df, "doc_id", "n_tokens", total).count() == 31
    assert token_budget_sample(df, "doc_id", "n_tokens", 5).count() <= 1
    some = token_budget_sample(df, "doc_id", "n_tokens", 100, n_buckets=4)
    got = some.collect()
    assert 0 < len(got) < 31
    assert sum(r.n_tokens for r in got) <= 100


def test_domain_keywords_planted_vocabulary_and_ctfidf_mirror(spark):
    """Three planted clusters with disjoint characteristic vocabularies:
    each discovered domain's top keyword must be its own planted word —
    strictly outranking the equally-per-doc-frequent but ubiquitous
    'common' (large corpus frequency sinks it under the smoothed idf) —
    and every score must equal the python c-TF-IDF recompute from the
    same assignment."""
    import math

    from connect_server_spark.operators.sampling import (
        assign_domains,
        domain_keywords,
    )

    words = ["alpha", "bravo", "charlie"]
    rows, vecs = [], []
    for i in range(30):
        c = i % 3
        rows.append(
            (i, f"common {words[c]} {words[c]} filler{i % 5} common")
        )
        base = [0.0, 0.0, 0.0, 1.0]
        base[c] = 10.0
        vecs.append((i, [v + 0.01 * (i % 7) for v in base]))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])

    kws = domain_keywords(docs, emb, nlist=3, m=4).collect()
    by_domain = {}
    for r in kws:
        by_domain.setdefault(r.domain, []).append(r)
    assert len(by_domain) == 3
    terms_seen = set()
    for d, krows in by_domain.items():
        krows.sort(key=lambda r: r.kw_rank)
        assert krows[0].term in words, (d, krows)
        terms_seen.add(krows[0].term)
        planted = next(r.ctfidf for r in krows if r.term in words)
        common = next((r.ctfidf for r in krows if r.term == "common"), None)
        if common is not None:
            assert planted > common, (d, krows)
    assert terms_seen == set(words)  # one planted word per domain

    # exact c-TF-IDF recompute from the same assignment:
    # tf(t, d) * ln(1 + A / f_t), A = avg tokens per domain
    labeled = assign_domains(docs, emb, nlist=3).collect()
    tf = {}
    for r in labeled:
        for t in r.text.split():
            tf[(r.domain, t)] = tf.get((r.domain, t), 0) + 1
    freq, mass = {}, {}
    for (d, t), n in tf.items():
        freq[t] = freq.get(t, 0) + n
        mass[d] = mass.get(d, 0) + n
    a = sum(mass.values()) / len(mass)
    for r in kws:
        want = round(
            tf[(r.domain, r.term)] * math.log(1.0 + a / freq[r.term]), 6
        )
        assert abs(r.ctfidf - want) < 1e-9, (r.domain, r.term)


def test_corpus_budget_and_keyword_queries_run(spark, sf_dir):
    from connect_server_spark.queries.sampling_queries import (
        TOKEN_BUDGET_PER_SOURCE,
        corpus_domain_keywords,
        corpus_token_budget,
    )

    kb = corpus_token_budget(spark, sf_dir).collect()
    assert 0 < len(kb) <= 20
    assert all(r.n_tokens_kept <= TOKEN_BUDGET_PER_SOURCE for r in kb)
    kw = corpus_domain_keywords(spark, sf_dir).collect()
    assert {r.domain for r in kw} <= set(range(4))
    assert all(1 <= r.kw_rank <= 3 for r in kw)
    assert all(r.ctfidf > 0 for r in kw)
