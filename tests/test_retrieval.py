"""BM25 lexical retrieval: exact DuckDB score mirror plus behavioral
pins (idf rarity, length normalization, determinism)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from connect_server_spark.operators.retrieval import bm25_topk
from connect_server_spark.queries.retrieval_queries import (
    BM25_K,
    BM25_QUERY,
    corpus_bm25,
)


def test_corpus_bm25_matches_duckdb_mirror(spark, sf_dir):
    """Score-for-score BM25 recomputation in SQL, same two-stage 1e-6
    rounding (idf first, then the summed score)."""
    got = [(r.doc_id, r.bm25) for r in corpus_bm25(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    terms = sorted({t for t in BM25_QUERY.lower().split() if t})
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    want = con.execute(f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
          FROM documents
        ),
        tc AS (
          SELECT doc_id, term, count(*) AS tf FROM tok
          WHERE term <> '' GROUP BY 1, 2
        ),
        dl AS (
          -- one row per document, zero-token docs included with dl=0,
          -- so N and avgdl come from the same frame (matches
          -- corpus_term_stats' contract)
          SELECT d.doc_id, coalesce(t.dl, 0) AS dl
          FROM documents d
          LEFT JOIN (SELECT doc_id, sum(tf) AS dl FROM tc GROUP BY doc_id) t
            USING (doc_id)
        ),
        stats AS (
          SELECT (SELECT count(*) FROM dl) AS n,
                 (SELECT avg(dl) FROM dl) AS avgdl
        ),
        idf AS (
          SELECT term,
                 round(ln(1.0 + ((SELECT n FROM stats) - count(*) + 0.5)
                          / (count(*) + 0.5)), 6) AS idf
          FROM tc WHERE term IN ({terms_sql}) GROUP BY term
        )
        SELECT tc.doc_id,
               round(sum(idf.idf * (tc.tf * 2.2)
                   / (tc.tf + 1.2 * (1 - 0.75
                       + 0.75 * dl.dl / (SELECT avgdl FROM stats)))), 6)
                 AS bm25
        FROM tc
        JOIN idf USING (term)
        JOIN dl USING (doc_id)
        WHERE tc.term IN ({terms_sql})
        GROUP BY tc.doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {BM25_K}
    """).fetchall()
    assert len(got) > 0
    assert got == [(d, s) for (d, s) in want]


def test_bm25_rare_term_outranks_common(spark):
    """A document matching the RARE query term must outscore one
    matching only the ubiquitous term (idf does its job)."""
    docs = [Row(doc_id=0, text="zebra apple pie")]
    docs += [Row(doc_id=i, text="apple sauce and apple pie") for i in range(1, 20)]
    df = spark.createDataFrame(docs)
    out = bm25_topk(df, "doc_id", "text", "zebra apple", k=3).collect()
    assert out[0].doc_id == 0


def test_bm25_length_normalization(spark):
    """Same tf, shorter document wins (the b·dl/avgdl term)."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="cat dog"),
        Row(doc_id=2, text="cat dog " + "filler " * 30),
    ])
    out = bm25_topk(df, "doc_id", "text", "cat", k=2).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].bm25 > out[1].bm25


def test_bm25_tf_saturation(spark):
    """Doubling tf helps, but sub-linearly (k1 saturation)."""
    df = spark.createDataFrame([
        Row(doc_id=1, text="cat " * 1 + "x " * 9),
        Row(doc_id=2, text="cat " * 2 + "x " * 8),
        Row(doc_id=3, text="cat " * 8 + "x " * 2),
    ])
    out = {r.doc_id: r.bm25 for r in
           bm25_topk(df, "doc_id", "text", "cat", k=3).collect()}
    gain_1_2 = out[2] - out[1]
    gain_2_8 = out[3] - out[2]
    assert out[3] > out[2] > out[1]
    assert gain_2_8 < 6 * gain_1_2  # 4x the tf gain buys far less than 4x


def test_bm25_deterministic_and_empty_query_rejected(spark, sf_dir):
    a = [(r.doc_id, r.bm25) for r in corpus_bm25(spark, sf_dir).collect()]
    b = [(r.doc_id, r.bm25) for r in corpus_bm25(spark, sf_dir).collect()]
    assert a == b
    from connect_server_spark.tables import load_table

    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(load_table(spark, "documents", sf_dir),
                  "doc_id", "text", "   ")


# ----------------------------------------------------------------- RRF


def test_rrf_fuse_matches_python_reference(spark, sf_dir):
    """Fusion recomputed in pure python from the two collected lists."""
    from connect_server_spark.queries.retrieval_queries import (
        HYBRID_K,
        HYBRID_PROBE_VEC_ID,
        corpus_hybrid_retrieval,
    )
    from connect_server_spark.operators.similarity import cosine_topk
    from connect_server_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    lex = sorted(
        ((r.doc_id, r.bm25) for r in
         bm25_topk(docs, "doc_id", "text", BM25_QUERY, k=50).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    probe = emb.filter(F.col("vec_id") == HYBRID_PROBE_VEC_ID).select(
        F.lit(0).alias("probe_id"), F.col("embedding").alias("probe_vec"))
    sem = {r.vec_id: r.rank for r in cosine_topk(probe, emb, k=50).collect()}

    scores = {}
    for i, (d, _) in enumerate(lex, start=1):
        scores[d] = scores.get(d, 0.0) + 1.0 / (60 + i)
    for d, rank in sem.items():
        scores[d] = scores.get(d, 0.0) + 1.0 / (60 + rank)
    want = sorted(
        ((d, round(s, 6)) for d, s in scores.items()),
        key=lambda t: (-t[1], t[0]),
    )[:HYBRID_K]

    got = [(r.doc_id, r.rrf_score)
           for r in corpus_hybrid_retrieval(spark, sf_dir).collect()]
    assert got == want


def test_rrf_fuse_semantics(spark):
    """A doc ranked #1 in both lists beats #1-in-one/absent-in-other;
    absence contributes zero, not a penalty below other entries."""
    from connect_server_spark.operators.retrieval import rrf_fuse
    from pyspark.sql import Row

    a = spark.createDataFrame([Row(doc_id=1, rank=1), Row(doc_id=2, rank=2)])
    b = spark.createDataFrame([Row(doc_id=1, rank=1), Row(doc_id=3, rank=2)])
    out = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b], "doc_id", k=3).collect()}
    assert out[1] == round(2 / 61, 6)
    assert out[2] == out[3] == round(1 / 62, 6)
    assert max(out, key=out.get) == 1


def test_doc_keywords_matches_duckdb_mirror(spark, sf_dir):
    """Score-for-score TF-IDF recomputation in SQL: raw idf ln(N/df),
    1e-6 rounding, per-doc top-5 with (score desc, term asc) ties."""
    from connect_server_spark.queries.retrieval_queries import (
        KEYWORDS_M,
        corpus_doc_keywords,
    )

    got = sorted(
        (r.doc_id, r.kw_rank, r.term, r.tfidf)
        for r in corpus_doc_keywords(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(
            trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
          FROM documents
        ),
        tc AS (
          SELECT doc_id, term, count(*) AS tf FROM tok
          WHERE term <> '' GROUP BY 1, 2
        ),
        idf AS (
          SELECT term,
                 ln((SELECT count(*) FROM documents) * 1.0 / count(*)) AS idf
          FROM tc GROUP BY term
        ),
        ranked AS (
          SELECT tc.doc_id, tc.term,
                 round(tc.tf * idf.idf, 6) AS tfidf,
                 row_number() OVER (
                   PARTITION BY tc.doc_id
                   ORDER BY round(tc.tf * idf.idf, 6) DESC, tc.term ASC
                 ) AS kw_rank
          FROM tc JOIN idf USING (term)
          WHERE round(tc.tf * idf.idf, 6) > 0
        )
        SELECT doc_id, kw_rank, term, tfidf FROM ranked
        WHERE kw_rank <= {KEYWORDS_M} AND doc_id % 20 = 0
        ORDER BY doc_id, kw_rank
    """).fetchall()
    assert len(got) > 0
    assert got == sorted(tuple(w) for w in want)


def test_doc_keywords_semantics(spark):
    """A term present in every document has idf ln(N/N)=0 and never
    surfaces; ranks are contiguous from 1; ties break on the term."""
    from connect_server_spark.operators.retrieval import doc_keywords

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common alpha alpha beta"),
            Row(doc_id=2, text="common beta"),
            Row(doc_id=3, text="common gamma gamma gamma"),
        ]
    )
    rows = doc_keywords(df, "doc_id", "text", m=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        ranks = sorted(x.kw_rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert all(x.term != "common" for x in rs), "zero-idf term surfaced"
    # doc 1: alpha (tf 2, df 2) beats beta (tf 1, df 2): same idf, higher tf.
    d1 = sorted(by_doc[1], key=lambda x: x.kw_rank)
    assert [x.term for x in d1] == ["alpha", "beta"]


def test_bm25_indexed_matches_in_memory_and_appends(spark, sf_dir, tmp_path):
    """The persisted-index path is score-identical to the in-memory
    path, and the append leg equals a full rebuild of the union."""
    from pyspark.sql import functions as F

    from connect_server_spark.operators.retrieval import (
        bm25_topk_indexed,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = "spark merge window"

    idx = str(tmp_path / "bm25_full")
    write_bm25_index(docs, "doc_id", "text", idx)
    got = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx, q, k=25).collect()
    ]
    want = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(docs, "doc_id", "text", q, k=25).collect()
    ]
    assert got == want

    # Daily-ingest leg: base + appended batch == rebuild of the union.
    base = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx2 = str(tmp_path / "bm25_incr")
    write_bm25_index(base, "doc_id", "text", idx2)
    write_bm25_index(batch, "doc_id", "text", idx2, mode="append", batch_id=1)
    got2 = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx2, q, k=25).collect()
    ]
    assert got2 == want

    # REPLAY of batch 1 (crash-recovery re-delivery): identical rows
    # re-append, the meta partial overwrites itself — scores unchanged.
    write_bm25_index(batch, "doc_id", "text", idx2, mode="append", batch_id=1)
    got3 = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx2, q, k=25).collect()
    ]
    assert got3 == want

    # append without a batch id is a refused footgun
    with pytest.raises(ValueError, match="unique batch_id"):
        write_bm25_index(batch, "doc_id", "text", idx2, mode="append")


def test_maintain_bm25_index_merges_ledgers_and_serves_identically(
    spark, sf_dir, tmp_path
):
    """The BM25 maintenance loop (r9): many daily appends accrete
    per-batch ledger partials and per-bucket small files; maintenance
    must merge/compact them behind generation pointers WITHOUT moving a
    single score — and a healthy index must cost a listing and do
    nothing."""
    import glob

    from pyspark.sql import functions as F

    from connect_server_spark.fsutil import resolve_store
    from connect_server_spark.operators.retrieval import (
        bm25_topk_indexed,
        maintain_bm25_index,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = "spark merge window"
    idx = str(tmp_path / "bm25_maint")
    write_bm25_index(docs.filter(F.col("doc_id") % 5 == 0), "doc_id", "text", idx)
    for day in range(1, 5):  # four daily appends → 5 ledger partials
        write_bm25_index(
            docs.filter(F.col("doc_id") % 5 == day),
            "doc_id", "text", idx, mode="append", batch_id=day,
        )
    want = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx, q, k=25).collect()
    ]

    # healthy thresholds: nothing fires, nothing changes
    assert maintain_bm25_index(spark, idx, max_ledger_batches=64) == {}

    # hair-trigger thresholds: both actions fire
    actions = maintain_bm25_index(
        spark, idx, max_files_per_bucket=0, max_ledger_batches=2
    )
    assert "terms" in actions and "ledgers" in actions

    ts_live = resolve_store(spark, f"{idx}/termstats")
    assert ts_live != f"{idx}/termstats"  # ledger swapped generations
    batch_dirs = glob.glob(f"{ts_live}/batch=*")
    assert len(batch_dirs) == 2  # merged partial + the newest kept one

    got = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx, q, k=25).collect()
    ]
    assert got == want  # pure re-layout: not one score moved

    # a post-maintenance append (fresh ids — the uniqueness contract)
    # lands in the LIVE ledger generation and serves — the daily loop
    # continues unbroken across the swap
    late = docs.filter(F.col("doc_id") % 50 == 7).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    write_bm25_index(late, "doc_id", "text", idx, mode="append", batch_id=9)
    want2 = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx, q, k=25).collect()
    ]
    ts_live2 = resolve_store(spark, f"{idx}/termstats")
    assert glob.glob(f"{ts_live2}/batch=9")  # partial in the live gen

    # idempotent: re-running maintenance converges (merged + kept + the
    # new partial → one more merge, scores unchanged)
    maintain_bm25_index(spark, idx, max_ledger_batches=2)
    assert [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx, q, k=25).collect()
    ] == want2


def test_bm25_indexed_plan_prunes_and_never_retokenizes(spark, sf_dir, tmp_path):
    """The serving plan reads ONLY the index stores (never the corpus
    parquet), pushes the term predicate into the scan, prunes buckets,
    and is Exchange-free on the doclens store side (1 Exchange for the
    candidate re-bucket + 1 for the score rollup)."""
    from connect_server_spark.operators.retrieval import (
        bm25_topk_indexed,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "bm25_plan")
    write_bm25_index(docs, "doc_id", "text", idx)
    df = bm25_topk_indexed(spark, idx, "spark merge window", k=10)
    files = df.inputFiles()
    assert files and all("bm25_plan" in f for f in files), (
        "serving plan read outside the index store"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert " IN (merge,spark,window)" in plan, (
        "term predicate not pushed into the index scan"
    )
    assert "SelectedBucketsCount" in plan, "no bucket pruning on terms store"
    shuffles = (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )
    # candidate re-bucket for the doclens join (absorbed by a broadcast
    # at small store sizes) + the per-doc score rollup.
    assert shuffles <= 2, f"expected <=2 shuffle exchanges, saw {shuffles}"


def test_bm25_indexed_hot_term_idf_floor(spark, tmp_path):
    """The hot-term bound: a corpus-universal query term is resolved
    against the tiny termstats ledger and dropped BEFORE the posting
    scan — its corpus-sized posting list is never read (absent from the
    scan's pushed IN-predicate), the result equals dropping the term
    from the query, and normal queries are bit-identical to the
    unfloored path."""
    from connect_server_spark.operators.retrieval import (
        bm25_topk_indexed,
        query_term_stats,
        write_bm25_index,
    )

    # 40 docs; "the" appears in EVERY doc (idf ~ log(1+0.5/40.5) ~ 0.012),
    # topic words appear in 4 docs each (idf ~ 2.2).
    rows = [
        (i, "the " + " ".join(f"t{i % 10}w{j}" for j in range(6)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "bm25_hot")
    write_bm25_index(docs, "doc_id", "text", idx)

    kept, pruned = query_term_stats(spark, idx, ["the", "t3w1"], 0.1)
    assert [t for t, _ in kept] == ["t3w1"]
    assert [t for t, _ in pruned] == ["the"]

    hot = bm25_topk_indexed(spark, idx, "the t3w1", k=5)
    plan = hot._jdf.queryExecution().executedPlan().toString()
    # the kept term is pushed into the posting scan as an equality
    # (Catalyst folds a 1-element IN); the hot term appears in NO
    # predicate literal — its posting list is never read.
    assert "= t3w1)" in plan, "pruned predicate not pushed"
    for lit in ("= the)", "(the,", ", the)", "(the)"):
        assert lit not in plan, "hot term reached the posting scan"
    got = [(r.doc_id, r.bm25) for r in hot.collect()]
    want = [
        (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, idx, "t3w1", k=5).collect()
    ]
    assert got == want  # pruning == dropping the stop word

    # normal query: floored path bit-identical to idf_floor=0.0
    a = [(r.doc_id, r.bm25) for r in
         bm25_topk_indexed(spark, idx, "t3w1 t7w2", k=10).collect()]
    b = [(r.doc_id, r.bm25) for r in
         bm25_topk_indexed(spark, idx, "t3w1 t7w2", k=10,
                           idf_floor=0.0).collect()]
    assert a == b

    # all-stop-word query: the single least-hot term is kept — one
    # bounded posting list, non-empty answer
    kept2, _ = query_term_stats(spark, idx, ["the"], 0.1)
    assert [t for t, _ in kept2] == ["the"]
    assert bm25_topk_indexed(spark, idx, "the", k=3).count() == 3

    # absent-term-only query: empty result, no posting scan
    assert bm25_topk_indexed(spark, idx, "zzz_absent", k=3).count() == 0


def test_bm25_serving_refuses_partial_termstats_coverage(spark, tmp_path):
    """Upgrade trap: an index whose termstats ledger covers fewer
    batches than meta (e.g. written before the ledger existed, then
    appended to) must refuse to serve instead of silently undercounting
    df and losing pre-upgrade-only terms."""
    import shutil

    from connect_server_spark.operators.retrieval import (
        bm25_topk_indexed,
        write_bm25_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha delta epsilon")],
        ["doc_id", "text"],
    )
    ix = str(tmp_path / "bm25_partial")
    write_bm25_index(docs, "doc_id", "text", ix)
    # simulate the pre-ledger index: drop batch 0's termstats partial
    shutil.rmtree(f"{ix}/termstats")
    batch = spark.createDataFrame([(3, "zeta eta theta")], ["doc_id", "text"])
    write_bm25_index(batch, "doc_id", "text", ix, mode="append", batch_id=1)

    with pytest.raises(ValueError, match="termstats ledger covers"):
        bm25_topk_indexed(spark, ix, "alpha beta", k=5).collect()
