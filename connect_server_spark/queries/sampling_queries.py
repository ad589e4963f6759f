"""Driver queries for the corpus-sampling family (temperature mixing,
DSIR importance resampling, cluster-balanced diversity sampling).

``corpus_mixing`` is driver-gated since r9 with a full DuckDB oracle
(the md5 Bernoulli gate is engine-portable by construction; the pytest
mirror imports the same SQL). The rest register rows-only with
oracle-grade gates in ``tests/test_sampling.py``: ``dsir_resample``'s
score is DuckDB-mirrored and its Gumbel selection recomputed by a
pure-Python reference, ``diversity_sample`` is re-ranked by a NumPy
reference on the same centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_server_spark.operators.sampling import (
    diversity_sample,
    importance_resample,
    mix_corpus,
)
from connect_server_spark.registry import register
from connect_server_spark.tables import load_table

# Mixing temperature and corpus-fraction target for the gated query:
# alpha=0.5 (square-root temperature — the Pile-style up-weighting of
# small sources) aiming at ~40% of the corpus.
MIX_ALPHA = 0.5
MIX_FRACTION = 0.4

DSIR_K = 100
DSIR_TEMPERATURE = 1.0

DIVERSITY_NLIST = 16
DIVERSITY_QUOTA = 10


def corpus_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixed corpus: per-source keep rates from n^alpha
    weights, applied as the deterministic md5 gate. The corpus never
    shuffles; the per-source rate table broadcasts back."""
    docs = load_table(spark, "documents", sf_dir)
    # Parquet count-star is metadata-only; the scalar parameterizes the
    # rate table exactly like unigram_lm's corpus total.
    target_total = int(docs.count() * MIX_FRACTION)
    out = mix_corpus(
        docs, "doc_id", "source", MIX_ALPHA, target_total, seed="mix"
    )
    return out.select(
        "doc_id", "source", "lang", "n_chars", "mix_weight", "keep_rate"
    )


# Oracle: n^alpha rate table + the md5 keep gate, all in SQL — the
# Python-side target scalar becomes a floor()'d count(*) CTE (int()
# truncates, CAST rounds — floor matches for non-negative counts).
# Promoted into the gated-50 window in r9 (r8 verdict ask #4); shared
# with the pytest mirror in tests/test_sampling.py.
CORPUS_MIXING_ORACLE_SQL = f"""
    WITH tgt AS (
      SELECT CAST(floor(count(*) * {MIX_FRACTION}) AS BIGINT) AS target
      FROM documents
    ),
    counts AS (
      SELECT source, count(*) AS n_rows FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n_rows,
             round(pow(n_rows, {MIX_ALPHA})
                   / sum(pow(n_rows, {MIX_ALPHA})) OVER (), 9)
               AS mix_weight,
             round(least(1.0,
                   (SELECT target FROM tgt)
                     * (pow(n_rows, {MIX_ALPHA})
                        / sum(pow(n_rows, {MIX_ALPHA})) OVER ())
                     / n_rows), 9) AS keep_rate
      FROM counts
    )
    SELECT d.doc_id, d.source, d.lang, d.n_chars,
           r.mix_weight, r.keep_rate
    FROM documents d JOIN rates r USING (source)
    WHERE r.keep_rate >= 1
       OR substring(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', CAST(floor(r.keep_rate * 65536) AS INT))
    """

register("corpus_mixing", corpus_mixing, sql=CORPUS_MIXING_ORACLE_SQL)


def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling toward the English subset: unigram
    log-likelihood-ratio scores (target = lang='en' docs, raw = whole
    corpus) and a deterministic Gumbel-top-k draw of the winners."""
    docs = load_table(spark, "documents", sf_dir)
    # r12 (guide §2.4): the target is a predicate subset of the same
    # corpus, so declaring it as a predicate lets importance_resample
    # build BOTH unigram LMs from one tokenization pass (one build-time
    # action instead of two sequential chains) — value-identical, still
    # gated by the DuckDB oracle below.
    return importance_resample(
        docs,
        "doc_id",
        "text",
        None,
        k=DSIR_K,
        temperature=DSIR_TEMPERATURE,
        seed="dsir",
        target_predicate=F.col("lang") == "en",
    )


# Full DuckDB oracle, promoted in the r11 rotation: the unigram-LLR
# score CTE is the pytest mirror that has matched EXACTLY (round-6
# grid) since r6, and the Gumbel-top-k draw is recomputed from the md5
# hash itself — hex→int via DuckDB's '0x' cast, the same
# (int(md5[:8],16)+0.5)/2^32 lattice as operators.sampling.hash_uniform,
# so the oracle re-derives the EXACT selection, not a proxy.
# temperature=1.0 keys on score + gumbel directly.
_DSIR_TOK = (
    "unnest(string_split(trim("
    "regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))"
)
DSIR_RESAMPLE_ORACLE_SQL = f"""
    WITH tok_all AS (
      SELECT doc_id, {_DSIR_TOK} AS token FROM documents
    ),
    tok AS (SELECT * FROM tok_all WHERE token <> ''),
    tok_t_all AS (
      SELECT doc_id, {_DSIR_TOK} AS token FROM documents WHERE lang = 'en'
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
    ),
    scores AS (
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
    ),
    keyed AS (
      SELECT doc_id, dsir_score, n_scored_tokens,
             round(dsir_score + (-ln(-ln(
               (CAST(concat('0x', substr(
                  md5(concat('dsir', CAST(doc_id AS VARCHAR))), 1, 8))
                 AS UBIGINT) + 0.5) / 4294967296.0
             ))), 6) AS gumbel_key
      FROM scores
    )
    SELECT doc_id, dsir_score, n_scored_tokens, gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id ASC
    LIMIT {DSIR_K}
"""

register("dsir_resample", dsir_resample, sql=DSIR_RESAMPLE_ORACLE_SQL)


def embeddings_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced selection over the embedding table: ≤ quota
    vectors per IVF cell, nearest-centroid first — balanced coverage of
    embedding space no quality top-k can give."""
    emb = load_table(spark, "embeddings", sf_dir)
    return diversity_sample(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        nlist=DIVERSITY_NLIST,
        quota=DIVERSITY_QUOTA,
    )


register("diversity_sample", embeddings_diversity_sample, defer=True)


def corpus_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised domain discovery + mixing recipe: spherical-k-means
    clusters over the embedding table label the documents table
    (doc_id/vec_id share the id space), and each discovered domain gets
    telemetry + n^alpha temperature-mixing rates. Rows-only
    (corpus-trained quantizer state); numpy-reference equivalence and
    invariant gates run in ``tests/test_sampling.py``."""
    from connect_server_spark.operators.sampling import discover_domains

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    return discover_domains(
        docs, emb, nlist=8, alpha=0.5, target_total=300
    )


register("corpus_domains", corpus_domains, defer=True)


def corpus_domain_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-TF-IDF labels for the discovered domains: each cluster's top-3
    characteristic terms under the smoothed class-based scheme
    (tf·ln(1 + A/f_t) — corpus-ubiquitous terms sink, and a fully
    shared vocabulary still yields labels). Rows-only (corpus-trained
    quantizer state); exact python c-TF-IDF recompute from the same
    assignment + planted-vocabulary gates run in
    ``tests/test_sampling.py``."""
    from connect_server_spark.operators.sampling import domain_keywords

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    return domain_keywords(docs, emb, nlist=4, m=3).orderBy(
        "domain", "kw_rank"
    )


register("corpus_domain_keywords", corpus_domain_keywords, defer=True)


TOKEN_BUDGET_PER_SOURCE = 800
TOKEN_BUDGET_BUCKETS = 16


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token caps: every source is cut to the maximal
    hash-ordered prefix of documents whose token sum stays ≤ 800 —
    the "N tokens of each source" recipe step, as a deterministic
    filter. Returns per-source kept telemetry. Rows-only (md5 hash
    order); the exact python prefix mirror, per-source cap + maximality
    invariants, and the bucket-classification plan shape are pinned in
    ``tests/test_sampling.py``."""
    from connect_server_spark.operators.sampling import token_budget_sample
    from connect_server_spark.operators.text import token_count

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    kept = token_budget_sample(
        docs,
        "doc_id",
        "n_tokens",
        budget=TOKEN_BUDGET_PER_SOURCE,
        source_col="source",
        n_buckets=TOKEN_BUDGET_BUCKETS,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("n_tokens_kept"),
        )
        .orderBy("source")
    )


register("corpus_token_budget", corpus_token_budget, defer=True)
