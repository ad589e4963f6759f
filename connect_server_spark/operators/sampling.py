"""Corpus sampling operators for training-data assembly.

Three samplers a pretraining pipeline runs between dedup/curation and
packing, each deterministic (hash-derived randomness, never ``rand()``)
so retries and audits reproduce bit-identically:

* ``source_mixing_rates`` / ``mix_corpus`` — temperature-based domain
  mixing (the Pile / Gopher recipe): per-source keep rates from
  ``n_s^alpha`` weights, applied scan-stage via the md5 Bernoulli gate
  (:func:`connect_server_spark.operators.curation.deterministic_keep`).
  alpha=1 preserves natural proportions, alpha=0 equalizes sources,
  0<alpha<1 up-weights small domains exactly like temperature-scaled
  multinomial sampling — but as a reproducible per-row filter.
* ``importance_weights`` / ``importance_resample`` — DSIR-flavored
  importance resampling (Xie et al., NeurIPS 2023): score every
  document by its log-likelihood ratio under a TARGET unigram LM (built
  from an in-domain subset) vs the RAW corpus LM, then draw a
  Gumbel-top-k sample with the hash-uniform trick — equivalent to
  sampling k docs without replacement with probability ∝ exp(score),
  computed as one TakeOrdered, no global sort materialized.
* ``diversity_sample`` — cluster-balanced selection over the embedding
  table: assign docs to IVF cells (the same coarse quantizer the ANN
  index uses), keep a per-cell quota nearest each centroid. Caps any
  one mode of the distribution at quota rows, which a plain top-k by
  quality score cannot do.

Scale notes: mixing is a broadcast of one row per source + a scan-stage
filter (no corpus shuffle). DSIR is two bounded-vocab broadcasts + one
map-side-combined per-doc agg + a TakeOrdered merge. Diversity is one
Arrow-batched matmul assign + a per-cell window whose partitions are
balanced by construction (cells ≈ corpus/nlist).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from connect_server_spark.execution import stage_boundary
from connect_server_spark.operators.curation import deterministic_keep
from connect_server_spark.operators.text import tokens, unigram_lm

__all__ = [
    "source_mixing_rates",
    "mix_corpus",
    "hash_uniform",
    "importance_weights",
    "importance_resample",
    "diversity_sample",
    "quantile_threshold",
    "filter_top_quantile",
    "assign_domains",
    "discover_domains",
    "domain_keywords",
    "token_budget_sample",
]


def source_mixing_rates(
    df: DataFrame,
    source_col: str,
    alpha: float,
    target_total: int,
    extra_aggs: dict | None = None,
) -> DataFrame:
    """Per-source keep rates for temperature mixing: source s with n_s
    rows gets weight ``n_s**alpha / Σ n**alpha`` and keep rate
    ``min(1, target_total * weight / n_s)``. One narrow aggregation; the
    result is one row per source (broadcast-sized by nature — a corpus
    has thousands of sources, not billions).

    Rates are rounded to the 1e-9 grid so the downstream 16-bit md5 gate
    compares engines identically (the DuckDB mirror recomputes the same
    formula; an unrounded double's last bit could straddle the
    ``floor(rate * 65536)`` boundary).
    """
    extra = extra_aggs or {}
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[expr.alias(name) for name, expr in extra.items()],
    )
    w = Window.partitionBy()  # one-row-per-source frame: total is cheap
    weight = F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
    total_weight = F.sum(weight).over(w)
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_total)) * (weight / total_weight) / F.col("n_rows"),
    )
    return counts.select(
        source_col,
        "n_rows",
        *extra.keys(),
        F.round(weight / total_weight, 9).alias("mix_weight"),
        F.round(rate, 9).alias("keep_rate"),
    )


def mix_corpus(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alpha: float,
    target_total: int,
    seed: str = "mix",
) -> DataFrame:
    """Apply temperature mixing: broadcast the per-source rate table
    back and keep each row via the deterministic md5 Bernoulli gate.
    The corpus never shuffles — the only Exchange is the per-source
    count; expected output size is ``≈ target_total`` (binomial per
    source, exact in expectation)."""
    rates = source_mixing_rates(df, source_col, alpha, target_total)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(
            deterministic_keep(F.col(id_col), F.col("keep_rate"), seed)
        )
    )


def hash_uniform(key: Column, seed: str = "") -> Column:
    """Deterministic U(0,1) from a key: the first 8 md5 hex chars as a
    32-bit integer, centered on the lattice (+0.5) so 0 and 1 are never
    produced (safe for log / log(-log))."""
    bits = F.conv(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8), 16, 10).cast("double")
    return (bits + F.lit(0.5)) / F.lit(4294967296.0)


def _dual_unigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_predicate,
    vocab_size: int,
):
    """Both DSIR unigram LMs — target (rows where ``target_predicate``)
    and raw (all rows) — from ONE corpus tokenization pass (r12, guide
    §2.4: the separate ``unigram_lm(target)`` + ``unigram_lm(df)``
    chains each exploded the corpus and each ran a build-time total
    action, sequentially; when the target is a predicate SUBSET of the
    same frame, one explode with a conditional count produces both
    frequency tables, one checkpoint replaces two, and one totals
    action replaces two). Value-identical to the two-chain form by
    construction: per-token target counts are the conditional sums of
    the same per-(token, doc) counts (a NULL predicate excludes the row,
    exactly like ``df.filter(pred)``), the vocab cuts order by the same
    (count desc, token asc) keys, and the totals/rounding match
    :func:`~connect_server_spark.operators.text.unigram_lm` digit for
    digit — pinned against the unfused path in ``tests/test_sampling.py``
    and by the dsir_resample DuckDB oracle.

    Returns ``(t_vocab, t_oov, r_vocab, r_oov)``."""
    import math

    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
        target_predicate.alias("_t"),
    ).filter(F.col("token") != "")
    # (token, doc) partial counts — _t is functionally dependent on _id,
    # so adding it to the key changes no group
    per_doc = exploded.groupBy("token", "_id", "_t").agg(
        F.count(F.lit(1)).alias("_occ")
    )
    freqs = per_doc.groupBy("token").agg(
        F.sum("_occ").alias("_n_r"),
        F.sum(F.when(F.col("_t"), F.col("_occ"))).alias("_n_t"),
    ).transform(stage_boundary)
    row = freqs.agg(F.sum("_n_r"), F.sum("_n_t")).first()
    total_r = row[0] or 1
    total_t = row[1] or 1
    r_vocab = (
        freqs.orderBy(F.col("_n_r").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select(
            "token",
            F.round(
                F.log(F.col("_n_r") / F.lit(float(total_r))), 6
            ).alias("logp"),
        )
    )
    t_vocab = (
        freqs.filter(F.col("_n_t").isNotNull())
        .orderBy(F.col("_n_t").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select(
            "token",
            F.round(
                F.log(F.col("_n_t") / F.lit(float(total_t))), 6
            ).alias("logp"),
        )
    )
    return (
        t_vocab,
        round(math.log(0.5 / total_t), 6),
        r_vocab,
        round(math.log(0.5 / total_r), 6),
    )


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame | None,
    vocab_size: int = 20000,
    target_predicate=None,
) -> DataFrame:
    """Per-document DSIR importance score: the summed per-token
    log-likelihood ratio ``Σ log p_target(tok) - log p_raw(tok)`` under
    two unigram LMs — target built from the in-domain frame, raw from
    the full corpus. Positive = looks more like the target domain.

    Plan: both vocabs are bounded (top-``vocab_size``) and broadcast;
    the corpus explodes to tokens ONCE, joins both vocabs
    broadcast-side, and folds back with one map-side-combined per-doc
    aggregation. Document bodies never shuffle; the wide rows are
    (id, two 8-byte logps). Scores are rounded to the 1e-6 grid for
    hash-stable output.

    ``target_predicate`` (a boolean Column over ``df``'s rows) declares
    the target as a subset of ``df`` itself — the common DSIR shape —
    and routes LM building through :func:`_dual_unigram_lm`: one corpus
    tokenization pass and one build-time action instead of two of each,
    value-identical. ``target`` may then be None; it remains the generic
    path for a target frame that is not a subset of ``df``."""
    if target_predicate is not None:
        t_vocab, t_oov, r_vocab, r_oov = _dual_unigram_lm(
            df, id_col, text_col, target_predicate, vocab_size
        )
    else:
        t_vocab, t_oov = unigram_lm(target, id_col, text_col, vocab_size)
        r_vocab, r_oov = unigram_lm(df, id_col, text_col, vocab_size)
    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    scored = (
        exploded.join(
            F.broadcast(t_vocab.withColumnRenamed("logp", "logp_t")), "token", "left"
        )
        .join(
            F.broadcast(r_vocab.withColumnRenamed("logp", "logp_r")), "token", "left"
        )
        .select(
            F.col(id_col),
            (
                F.coalesce(F.col("logp_t"), F.lit(t_oov))
                - F.coalesce(F.col("logp_r"), F.lit(r_oov))
            ).alias("_llr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("_llr"), 6).alias("dsir_score"),
        F.count(F.lit(1)).alias("n_scored_tokens"),
    )


def importance_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame | None,
    k: int,
    temperature: float = 1.0,
    seed: str = "dsir",
    vocab_size: int = 20000,
    target_predicate=None,
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the k documents with the
    largest ``score/T + Gumbel(hash(id))`` — a without-replacement
    sample with P(doc) ∝ exp(score/T), fully deterministic in (seed,
    corpus). T→0 approaches hard top-k by score; larger T preserves more
    of the raw distribution. The selection is a TakeOrdered merge (k
    rows per partition then k global), never a full sort.
    ``target_predicate`` — see :func:`importance_weights`."""
    w = importance_weights(
        df, id_col, text_col, target, vocab_size,
        target_predicate=target_predicate,
    )
    gumbel = -F.log(-F.log(hash_uniform(F.col(id_col), seed)))
    key = F.col("dsir_score") / F.lit(float(temperature)) + gumbel
    return (
        w.withColumn("gumbel_key", F.round(key, 6))
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def diversity_sample(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    quota: int = 10,
    centroids=None,
    sample_size: int = 4096,
    seed: int = 17,
) -> DataFrame:
    """Cluster-balanced selection: assign every vector to its nearest
    IVF centroid (Arrow-batched matmul — the ANN index's coarse
    quantizer reused as a diversity grid), then keep the ``quota``
    vectors nearest each centroid (deterministic tie-break by id).

    Guarantees no region of embedding space contributes more than
    ``quota`` rows — the balanced-coverage property quality-ranked
    selection lacks. Output ≤ nlist × quota rows, each tagged with its
    cell and rank. The per-cell window partitions are ≈ corpus/nlist —
    balanced by construction, no hot key (k-means cells are bounded;
    a degenerate all-identical-vectors corpus collapses to one cell,
    which is the correct answer for 'how diverse is this corpus')."""
    import numpy as np

    from connect_server_spark.operators.similarity import (
        ivf_assign_udf,
        train_ivf_centroids,
    )

    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else train_ivf_centroids(
            emb_df, nlist, corpus_id=id_col, corpus_vec=vec_col,
            sample_size=sample_size, seed=seed,
        )
    )
    assign = ivf_assign_udf(cents, nprobe=1)
    assigned = emb_df.select(
        F.col(id_col),
        F.col(vec_col),
        assign(F.col(vec_col)).getItem(0).alias("cell"),
    )
    # cosine to own centroid, computed JVM-side against the broadcast
    # centroid weights (small: nlist × dim literals via a map lookup).
    cent_rows = [
        (int(c), [float(x) for x in row]) for c, row in enumerate(cents)
    ]
    cent_df = assigned.sparkSession.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    )
    joined = assigned.join(F.broadcast(cent_df), "cell")
    # the similarity module's canonical fold — its order is part of the
    # cross-engine contract; an inline copy risks last-ulp divergence
    from connect_server_spark.operators.similarity import dot_product, l2_norm

    cos = dot_product(F.col(vec_col), F.col("centroid")) / (
        l2_norm(F.col(vec_col)) * l2_norm(F.col("centroid"))
    )
    ranked = joined.withColumn("centroid_cos", F.round(cos, 6)).withColumn(
        "cell_rank",
        F.row_number().over(
            Window.partitionBy("cell").orderBy(
                F.col("centroid_cos").desc(), F.col(id_col).asc()
            )
        ),
    )
    return ranked.filter(F.col("cell_rank") <= quota).select(
        id_col, "cell", "cell_rank", "centroid_cos"
    )


def quantile_threshold(
    df: DataFrame,
    col: str,
    keep_top_fraction: float,
    relative_error: float = 0.001,
) -> float:
    """The score cutoff that keeps the top ``keep_top_fraction`` of
    rows, from ONE Greenwald-Khanna sketch pass (``approxQuantile`` —
    bounded memory per partition, merged on the driver; rank error ≤
    ``relative_error``). The standard way to turn 'keep the best 30%'
    into a scan-stage filter without a global sort."""
    if not 0 < keep_top_fraction <= 1:
        raise ValueError("keep_top_fraction must be in (0, 1]")
    [thr] = df.approxQuantile(col, [1.0 - keep_top_fraction], relative_error)
    return thr


def filter_top_quantile(
    df: DataFrame,
    col: str,
    keep_top_fraction: float,
    relative_error: float = 0.001,
) -> DataFrame:
    """Keep rows at-or-above the sketched top-fraction cutoff. Two
    passes over the column (sketch, then filter), zero shuffles, no
    sort; kept mass lands within ``relative_error`` rank error of the
    target (plus the tie mass at the cutoff — quantile gates on
    heavily-tied scores keep whole tie groups, by design: a
    deterministic gate must not split equal scores)."""
    thr = quantile_threshold(df, col, keep_top_fraction, relative_error)
    return df.filter(F.col(col) >= thr)


def assign_domains(
    docs: DataFrame,
    emb: DataFrame,
    nlist: int = 8,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
) -> DataFrame:
    """Label every document with its discovered domain: train the same
    bounded spherical-k-means coarse quantizer IVF uses (sample-bounded,
    driver-side Lloyd's — the corpus never feeds training), assign each
    embedding to its nearest centroid in one Arrow-batched matmul, and
    join the label back on the id. Returns ``docs``'s columns plus
    ``domain`` — the shared front half of :func:`discover_domains` and
    :func:`domain_keywords`."""
    from connect_server_spark.operators.similarity import (
        ivf_assign_udf,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(
        emb, nlist, corpus_id=vec_id, corpus_vec=vec_col, seed=seed
    )
    assigned = emb.select(
        F.col(vec_id).alias("_vid"),
        F.explode(ivf_assign_udf(cents, 1)(F.col(vec_col))).alias("domain"),
    )
    return docs.join(assigned, docs[doc_id] == assigned["_vid"]).drop("_vid")


def discover_domains(
    docs: DataFrame,
    emb: DataFrame,
    nlist: int = 8,
    alpha: float = 0.5,
    target_total: int = 10_000,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
) -> DataFrame:
    """Unsupervised domain discovery feeding the mixing recipe: cluster
    the embedding space (spherical k-means, trained on a bounded
    deterministic sample — the same quantizer IVF uses), label every
    document with its cluster, and emit per-domain telemetry plus the
    n^alpha temperature-mixing rates AS IF each discovered cluster were
    a source. This is the "what's in my crawl, and how should I weight
    it" loop a pretraining pipeline runs when source labels are missing
    or too coarse (one 'web' label hiding code, news, and boilerplate).

    Scale shape: training never touches the full corpus (sample-bounded,
    driver-side Lloyd's); assignment is one Arrow-batched matmul with
    the (nlist, dim) centroid matrix closure-captured; the doc↔vector
    join is an equi-join on the id; per-domain stats are one narrow
    aggregation (nlist rows out). Returns one row per discovered domain:
    (domain, n_rows, n_tokens, avg_chars, mix_weight, keep_rate).
    """
    from connect_server_spark.operators.text import token_count

    labeled = assign_domains(
        docs, emb, nlist, doc_id=doc_id, vec_id=vec_id, vec_col=vec_col,
        seed=seed,
    ).select("domain", F.col(text_col).alias("_text"))
    return source_mixing_rates(
        labeled,
        "domain",
        alpha,
        target_total,
        extra_aggs={
            "n_tokens": F.sum(token_count(F.col("_text"))),
            "avg_chars": F.round(F.avg(F.length("_text")), 6),
        },
    )


def domain_keywords(
    docs: DataFrame,
    emb: DataFrame,
    nlist: int = 8,
    m: int = 5,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
) -> DataFrame:
    """Label discovered domains with their top-``m`` characteristic
    terms — class-based TF-IDF (the BERTopic labeling scheme,
    Grootendorst 2022): each domain is one pseudo-document, a term's tf
    is its count across the whole domain, and the idf is the SMOOTHED
    corpus-frequency form

        ctfidf(t, d) = tf(t, d) · ln(1 + A / f_t)

    with ``f_t`` the term's total corpus count and ``A`` the average
    token count per domain — so corpus-ubiquitous terms sink (large
    ``f_t``) without the hard zero the domain-count idf produces on a
    fully-shared vocabulary (a real failure mode: a narrow-vocab corpus
    would label every domain with NOTHING under ln(n/df)). This is the
    "what IS cluster 3" answer the mixing recipe needs before anyone
    trusts discovered-domain weights.

    Scale shape: assignment rides :func:`assign_domains` (bounded
    training, Arrow matmul, id equi-join); the only shuffles after it
    carry (domain, term) rows — term-vocabulary-sized, never document
    bodies; the corpus-frequency table is one row per term and joins
    back broadcast-style under AQE; the final top-``m`` window
    partitions by domain over vocab-sized input. Scores round to 1e-6,
    ties break lexicographically. Returns
    (domain, term, ctfidf, kw_rank), kw_rank 1..≤m.
    """
    labeled = assign_domains(
        docs, emb, nlist, doc_id=doc_id, vec_id=vec_id, vec_col=vec_col,
        seed=seed,
    )
    terms = labeled.select(
        "domain", F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("domain", "term").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    # per-term corpus frequency and per-domain token mass: both narrow
    # vocab-/nlist-sized aggregates over the (domain, term, tf) frame
    freq = tf.groupBy("term").agg(F.sum("_tf").alias("_f"))
    # A = average tokens per domain — a bounded two-row read of the
    # nlist-sized frame, the same class as corpus_term_stats' N
    dom_mass = tf.groupBy("domain").agg(F.sum("_tf").alias("_mass"))
    # keep A in-plan as a broadcast 1-row frame: a driver collect here
    # would run the whole assignment+explode lineage as an eager job at
    # build time and then recompute it uncached when the result executes
    avg_mass = dom_mass.agg(F.avg("_mass").alias("_a"))
    scored = (
        tf.join(freq, "term")
        .crossJoin(F.broadcast(avg_mass))
        .select(
            "domain",
            "term",
            F.round(
                F.col("_tf")
                * F.log(
                    F.lit(1.0)
                    + F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_f")
                ),
                6,
            ).alias("ctfidf"),
        )
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("ctfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= m)
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    source_col: str | None = None,
    n_buckets: int = 4096,
    seed: str = "budget",
) -> DataFrame:
    """Cut the corpus to an exact token budget: keep the maximal prefix
    of documents, in deterministic hash order, whose running token sum
    stays ≤ ``budget`` — per source when ``source_col`` is given (cap
    any one source's contribution), else globally. The "give me exactly
    N tokens of X" operation every pretraining data recipe ends with,
    as a reproducible filter: hash order is retry-stable and
    independent of ingestion order, so the same corpus always yields
    the same cut.

    Scale shape — the naive form is a per-source global sort + running
    window (one task per source: skew-fatal at 100 TB). Instead, the
    two-pass bucket design quantile_threshold uses: docs land in
    ``n_buckets`` hash buckets; one narrow (source, bucket, Σtokens)
    aggregation + a prefix sum over that TINY frame classifies every
    bucket as kept / dropped / boundary; whole buckets resolve with
    zero per-doc work, and only the boundary bucket — 1/n_buckets of
    each source — pays the exact within-bucket running-sum window.
    Token counts must be ≥ 0 (the running sum's monotonicity is what
    makes the kept set a prefix). Returns ``df``'s columns, filtered.
    """
    src = (F.col(source_col) if source_col else F.lit("_all")).alias("_src")
    h = hash_uniform(F.col(id_col), seed)
    bucket = F.least(
        F.floor(h * n_buckets).cast("int"), F.lit(n_buckets - 1)
    )
    tagged = df.select(
        "*", src, h.alias("_h"), bucket.alias("_bkt")
    )
    per_bucket = tagged.groupBy("_src", "_bkt").agg(
        F.sum(token_col).alias("_bt")
    )
    wcum = (
        Window.partitionBy("_src")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    classified = per_bucket.select(
        "_src",
        "_bkt",
        F.coalesce(F.sum("_bt").over(wcum), F.lit(0)).alias("_start"),
        "_bt",
    ).select(
        "_src",
        "_bkt",
        "_start",
        F.when(F.col("_start") + F.col("_bt") <= budget, F.lit("all"))
        .when(F.col("_start") >= budget, F.lit("none"))
        .otherwise(F.lit("boundary"))
        .alias("_cls"),
    )
    joined = tagged.join(F.broadcast(classified), ["_src", "_bkt"])
    keep_whole = joined.filter(F.col("_cls") == "all")
    wrun = (
        Window.partitionBy("_src", "_bkt")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep_boundary = (
        joined.filter(F.col("_cls") == "boundary")
        .withColumn(
            "_run", F.coalesce(F.sum(token_col).over(wrun), F.lit(0))
        )
        .filter(
            F.col("_start") + F.col("_run") + F.col(token_col) <= budget
        )
        .drop("_run")
    )
    helper = ["_src", "_h", "_bkt", "_start", "_cls"]
    return keep_whole.unionByName(keep_boundary).drop(*helper)
