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
    # hybrid retrieval's semantic leg scores ONE broadcast probe against
    # the corpus — a bounded 1×N pass by construction, same shape as the
    # exact baseline; the scale path swaps in ivf_topk_indexed.
    "corpus_hybrid_retrieval",
    # hard-negative mining's EXACT searcher (broadcast probes × corpus):
    # baseline-only since r7 — the registered scale form is
    # mining_hard_negatives_indexed (IVF-indexed searcher, equi-join end
    # to end), pinned output-identical at nprobe=nlist in
    # tests/test_similarity.py.
    "mining_hard_negatives",
    # heavy_hitters attaches the ONE-ROW grand total to the (key, count)
    # aggregate via a single-row broadcast build side — a bounded 1×N
    # scalar attach, not an all-pairs risk (Catalyst folds any literal
    # equi-key join back to this node shape).
    "events_heavy_hitters",
    # c-TF-IDF attaches the ONE-ROW average domain mass to the vocab-
    # sized (domain, term, tf, f) frame the same way — the in-plan
    # replacement for a mid-build driver collect that ran the whole
    # assignment+explode lineage eagerly and then recomputed it.
    "corpus_domain_keywords",
}

# Queries whose operators legitimately cross the Python boundary — all
# Arrow-batched (pandas UDF / mapInPandas / applyInPandas), never per-row.
ARROW_BOUNDARY_OK = {
    "similarity_topk_ann",
    "similarity_topk_ivf",
    "similarity_topk_ivf_indexed",
    # SQ8 store: dequantize is scan-stage Catalyst; the one Arrow node
    # is still just the probe assignment
    "similarity_topk_ivf_sq8",
    # PQ store: probe assignment + the codebook-gather decode — exactly
    # two Arrow nodes, pinned in test_similarity.py
    "similarity_topk_ivf_pq",
    # IVFPQ+refine composition (r11): same two Arrow nodes (assign +
    # decode; the DPP subquery may embed them textually twice), pinned
    # by name-set in test_similarity.py
    "similarity_topk_pq_refine",
    "dedup_neardup_embedding_lsh",
    "dedup_semantic",
    "dedup_incremental_embedding",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_gif_frames",
    "multimodal_audio_features",
    "training_pack",
    "training_pack_chunked",
    "tokenize_bpe",
    "training_pack_bpe",
    "extract_grouped",
    "diversity_sample",
    "corpus_domains",
    # IVF probe assignment (Arrow-batched matmul) inside the indexed
    # mining searcher
    "mining_hard_negatives_indexed",
    # compressed-text ingest: the codec round-trip is two
    # partition-preserving Arrow stages (encode fixture + REAL stdlib
    # decode); payloads never shuffle
    "corpus_ingest_compressed",
    # WARC front end: shard synthesis (applyInPandas fixture), record
    # parsing (mapInPandas), HTML extraction (pandas UDF) — all Arrow
    "corpus_ingest_warc",
    # the on-disk leg: binaryFile scan → the same mapInPandas parse +
    # pandas-UDF extract as the in-plan leg
    "corpus_ingest_files",
    # the crawl-head composite rides the same Arrow stages — audited in
    # FULL_PLAN_AUDIT form (checkpoints off), so the Arrow nodes are
    # deterministically visible and this declaration binds
    "corpus_from_crawl",
    # c-TF-IDF domain labels ride the IVF probe assignment (Arrow
    # matmul) inside assign_domains
    "corpus_domain_keywords",
}


# Shuffle budget per query: the number of Exchange nodes (excluding
# ReusedExchange) each plan is ALLOWED — pinned at the current audited
# counts so any change that adds a shuffle fails loudly and has to be
# justified here. Scans/pure projections are 0 by design; versioned
# reads pay their agg + final ordering; the dedup/curation composites
# document their multi-stage pipelines. (Queries absent from the map
# default to 0.)
SHUFFLE_BUDGET = {
    "latest_version_probes": 2,
    "latest_status_join": 2,
    "version_existence_probe": 2,
    "submissions_read_path": 1,
    "events_grouping_sets": 2,
    "org_resolve": 3,
    "org_parent_rules": 2,
    "status_insert_guard": 2,
    # r5: both queries fold their incremental (new-batch-vs-corpus)
    # family in so the daily-ingest path sits inside the driver's oracle
    # gate window — the union roughly doubles the stage count; every
    # added Exchange carries narrow keys (16-byte digests / band hashes),
    # never document bodies.
    "dedup_exact": 5,
    "dedup_neardup_minhash": 10,
    # r5: +1 — cluster sizes moved off Window.partitionBy(component) (a
    # mega-component single-task hot key) onto a graph-node-only count
    # whose one-row-per-component result broadcasts back; the extra
    # Exchange is narrow (labels only) and the corpus is no longer
    # partitioned by component at all.
    "dedup_clusters": 4,
    # r5: 10 → 13 — exact-copy collapse composed in (digest agg + member
    # expansion + intra-group join). Every added Exchange carries narrow
    # (id, 16-byte digest) rows, and the prefix-filter pipeline now runs
    # on the DISTINCT-text corpus, so total shuffled bytes went down.
    "dedup_ngram_jaccard": 13,
    "dedup_neardup_embedding": 1,
    "similarity_topk_exact": 2,
    "corpus_curation": 6,
    "submit_pipeline": 5,
    "validator_dataset_size": 1,
    "validator_feedstock": 1,
    "validator_submitters": 3,
    "extract_grouped": 1,
    "status_poll": 1,
    "events_time_windows": 2,
    "events_session_windows": 1,
    "transfer_manifest": 1,
    "version_reset_rule": 2,
    "submission_rollup": 3,
    "dedup_neardup_simhash": 3,
    "dedup_incremental_minhash": 5,
    # r6: 5 → 6, but every Exchange is now BATCH-sized: the stores became
    # bucketed tables (band index by band_hash, shingles by id) so the
    # store-side scans feed shuffled-hash joins with zero Exchange — the
    # O(corpus) index/shingle rows never move. The +1 is the cands⋈batch
    # sort-merge pair (two batch-sized exchanges where the old plan
    # broadcast one side); the two exchanges the old plan spent shuffling
    # the FULL index and shingle store are gone (layout pin:
    # tests/test_dedup.py indexed-path plan test).
    "dedup_incremental_minhash_indexed": 6,
    "dedup_incremental_exact": 4,
    # r6 substring-span dedup: the repeated-window count (narrow
    # (pos, md5) rows, map-side combined), the semi-join back, and the
    # shared id-partition Exchange under the lag window + span group-by
    # (the group-by reuses the window's partitioning — one Exchange, not
    # two). Document bodies never shuffle.
    "dedup_substring_spans": 5,  # +2 r12: the conditional spread_scan round-robin, textually duplicated per consumer of the spread scan in the static plan (ReusedExchange at runtime)
    # r7 winnowing fingerprints: the fingerprint computation itself is
    # scan-stage (0 Exchange, pinned in test_dedup.py); the pair stage
    # pays the posting df agg + the max_df semi-join, the posting
    # self-join on 16-byte fingerprint keys, the pair rollup, the two
    # full-set joins for the exact score, and the final ordering — all
    # narrow (id, fp) / (id_a, id_b) rows; document bodies never shuffle.
    "dedup_winnow": 9,
    # incremental winnow: batch fingerprint explode/distinct, the
    # probe-time df-cap agg, the candidate distinct, and the batch-side
    # verify joins — all batch-sized; both store scans are bucketed, so
    # the O(corpus) posting/fps rows never move (plan pin in
    # test_dedup.py's store-side-exchange-free test).
    "dedup_incremental_winnow": 7,
    # winnow fuzzy decon: the per-doc fingerprint-hit agg + final
    # ordering (the bench fingerprint set dedups then broadcasts) —
    # narrow (id, 16-byte fp) rows only, same shape as
    # corpus_decon_fraction; the one-row-per-doc contract needs no join
    # (every document fingerprints, pinned by the NULL-text parity test).
    "corpus_decon_winnow": 6,  # +2 r12: conditional spread_scan round-robin ×2 consumers (ReusedExchange at runtime)
    # WARC ingest drill: the synthesis groupBy (fixture cost), the
    # doc_id join back for the self-verify, and the per-shard telemetry
    # agg + ordering — payloads cross the one synthesis Exchange only;
    # the parse/extract path itself is shuffle-free (pinned in
    # test_sources.py).
    "corpus_ingest_warc": 4,
    # on-disk ingest leg: telemetry agg + ordering + the broadcast
    # join-back, PLUS the conditional round-robin spread of shard rows
    # across the file count when files < cores (the one-split lesson —
    # absent at production scale where every ~1 GB shard is its own
    # split, so payloads never shuffle on the 100 TB path)
    "corpus_ingest_files": 4,
    # URL curation: the canonical-digest dedup window, the salted cap
    # window (NULL domains scatter over pseudo-keys and are exempted in
    # the filter — no union, no hot partition), the telemetry agg pair,
    # and the final ordering — narrow (id, url, domain) rows; the
    # blocklist broadcasts.
    "corpus_url_filter": 6,
    # crawl-head composite, audited in FULL_PLAN_AUDIT (no-checkpoint)
    # form: the WARC synthesis groupBy, the canonical-dedup and
    # per-domain-cap windows, three per-domain stage aggs, the two
    # funnel joins (+ blocklist broadcasts), and the final ordering —
    # with the parsed/url-ok subtrees DUPLICATED once per funnel
    # consumer, which is what the no-checkpoint form prints (the
    # executed checkpointed plan runs each stage once; pinned at 12
    # before r8). Every Exchange carries (domain, count) or (id, url)
    # rows; payload bytes cross only the synthesis groupBy.
    "corpus_from_crawl": 17,
    # r6 incremental twin: batch windows shuffle to the bucketed store
    # (store side Exchange-free), the intra-batch repeat count, the
    # flagged-position distinct, and the shared id-partition Exchange
    # under the span merge — all batch-sized.
    "dedup_incremental_spans": 5,
    "dedup_neardup_embedding_lsh": 4,
    # r6 SemDeDup: the audited plan covers the post-components stages
    # (the pointer-jumping loop executes eagerly at build, off
    # checkpointed labels — its per-round shuffles are pinned by
    # dedup_clusters' budget instead): graph-node size agg + label
    # join-back; the corpus side joins the broadcast sizes.
    "dedup_semantic": 4,
    # unigram-LM scoring: the model-build side (token frequency double
    # agg + the bounded vocab TakeOrdered) executes at build; the scored
    # plan pays the exploded-token broadcast join + one per-doc agg.
    "lm_quality": 4,
    # groupBy(source) over map-side-merged sketches + the orderBy range
    # exchange — the rows crossing both are one sketch row per source
    "corpus_stats": 2,
    # (token, doc) partial-count exchange + per-token rollup exchange;
    # the top-k itself is a TakeOrderedAndProject merge, no extra shuffle
    "vocab_top_tokens": 2,
    "similarity_topk_ann": 3,
    "similarity_topk_ivf": 2,
    # indexed serving path: rank shuffle + candidate distinct + the
    # duplicate-tolerance distinct over (probe, vec, cosine) triples —
    # narrow rows; the third Exchange buys correctness under an
    # at-least-once retried index append
    "similarity_topk_ivf_indexed": 3,
    "similarity_topk_ivf_sq8": 3,
    # PQ serving: plan-identical to the sq8 path (rank + two distincts);
    # the decode gather adds a Python boundary, not a shuffle
    "similarity_topk_ivf_pq": 3,
    # IVFPQ+refine (r11): two serving tiers = twice the PQ path's
    # candidate-sized shuffles (distinct + rank per tier, two broadcast
    # sides), plus the DPP subquery textually re-embedding the
    # shortlist's exchanges (reused at runtime, counted by this textual
    # census) — every shuffled row is candidate-sized, never the store
    "similarity_topk_pq_refine": 9,
    # r9 z-order demo: the scan is shuffle-free; the one Exchange is the
    # global orderBy presentation sort over the ~tens of matched rows
    "events_zorder_scan": 1,
    # r9 sketch ledger: one narrow (group, sketch-buffer) agg over
    # KB-sized ledger rows + the presentation sort — data rows never
    # entered these Exchanges (partials were aggregated at write time)
    "events_distinct_sketch": 2,
    # r9 JSONL ingest: one (lang, counts) agg over the shard scan + the
    # presentation sort — same shape as corpus_ingest_compressed
    "corpus_ingest_jsonl": 2,
    # r12 arrow-native datasource scan: the (lang, counts) agg + the
    # presentation sort; both predicates are consumed by the source
    # (no post-scan Filter), so only aggregate rows enter an Exchange
    "corpus_arrow_scan": 2,
    # r10 epoch shuffle: assignment is scan-stage md5/conv; the ONE
    # Exchange is the hash-partition-by-shard the per-shard rank needs
    # — rows move once, straight to their output shard
    "training_epoch_shuffle": 1,
    # batch-vs-index candidate distinct + the threshold-filtered scoring
    # join back — same shape as the indexed IVF top-k minus the rank
    "dedup_incremental_embedding": 2,
    # r6 temporal family. asof: ONE hash partition by key for the
    # last-value window over the union, plus the right-side (user, ts)
    # dedupe agg — no join node at all, so no per-key blowup is possible.
    "events_asof_join": 2,
    # bucketized range join: an equi-join on (user, bucket) — broadcast
    # (1 Exchange) when the interval side is small, a sort-merge pair
    # (2) otherwise; never an inequality cross-join.
    "events_interval_join": 2,
    # cascade: the visible plan carries only the final coarsen Exchange —
    # the finer levels are lazily checkpointed (exactly so the raw scan
    # and each level run ONCE instead of once per union branch); their
    # one-narrow-shuffle-per-level cost is pinned by
    # tests/test_temporal.py's lossless-vs-direct and mirror gates.
    "events_rollup_cascade": 1,
    # r6 sampling family. mixing: the per-source count agg + the
    # one-row-per-source window total (SinglePartition over ~#sources
    # rows) + the rate-table broadcast back — the corpus itself never
    # shuffles (pinned: no SortMergeJoin in tests/test_sampling.py).
    "corpus_mixing": 3,
    # DSIR: two unigram-LM builds (each: (token,doc) partial + per-token
    # rollup, map-side combined, narrow rows) + their two bounded-vocab
    # broadcasts + the per-doc score agg; the Gumbel top-k itself is a
    # TakeOrdered merge, no extra Exchange. Document bodies never
    # shuffle.
    "dsir_resample": 7,
    # diversity: Arrow-batched cell assign (declared below) + the
    # broadcast centroid join + ONE per-cell window Exchange whose
    # partitions are ≈ corpus/nlist, balanced by construction.
    "diversity_sample": 2,
    # r6 events analytics. funnel: ONE hash partition by user (the
    # collect_list groupBy); the step fold is scan-stage, no join at all
    # (pinned join-free in tests/test_events_analytics.py).
    "events_funnel": 1,
    # retention: distinct (user, bucket) + per-user min-bucket + the
    # user equi-join back + the (cohort, offset) rollup — all narrow
    # (user, bucket) rows; the rollup is a plain count (triples are
    # unique by construction — count_distinct's Expand would add a 5th
    # Exchange for nothing).
    "events_retention": 4,
    # hourly partial agg + the per-type ordered window over the rollup's
    # one-row-per-bucket output — both narrow.
    "events_rollup_anomalies": 2,
    # interval-overlap join: the same bucketized equi-join shape as
    # events_interval_join — broadcast (1) under the threshold, a
    # sort-merge pair (2) above it; dedup-free by the home-bucket
    # filter, so no distinct shuffle over the output.
    "events_overlap_join": 2,
    # embeddings_quantize / quality_gates / text_analysis are pure
    # scan-stage expression projections; their ONE Exchange is the
    # conditional spread_scan round-robin of the one-split local scan
    # (r12; absent at production split counts).
    "embeddings_quantize": 1,
    "quality_gates": 1,
    "text_analysis": 1,
    # BM25: the (doc, term) count feeding three consumers is lazily
    # checkpointed (its explode+count runs once, off-plan); the visible
    # shuffles are df/dl aggregations, the scoring sort-merge pair on
    # _id, and the per-doc score rollup — all narrow (id, term, count)
    # rows; the query-term idf table broadcasts; top-k is a TakeOrdered.
    "corpus_bm25": 5,
    # hybrid = the BM25 plan (5) + the lexical-rank single-partition
    # window over 50 rows + the RRF outer join on top-k-sized lists —
    # every added Exchange carries ≤ 50 (id, rank) rows.
    "corpus_hybrid_retrieval": 8,
    # TF-IDF keywords: term-count agg, the vocab-sized df table agg, the
    # scoring join on term, and the per-doc window — all narrow
    # (id, term, count) rows; text tokenizes once behind the shared
    # lazily-checkpointed term_counts.
    "corpus_doc_keywords": 3,
    # hard-negative mining: the exact-searcher rank window (vectors
    # never shuffle — broadcast probes), the corpus (id, label) join,
    # and the candidate-sized re-rank window.
    "mining_hard_negatives": 4,
    # the registered scale form: the IVF serving path's budget (rank
    # shuffle + candidate distinct + duplicate-tolerance distinct, all
    # candidate-sized — the cell store never moves) + the corpus
    # (id, label) join + the re-rank window.
    "mining_hard_negatives_indexed": 6,
    # CCNet line dedup: distinct (line_key, id) + docfreq agg (8-byte
    # hashes only), the anti-join on line_key (AQE broadcasts the
    # boilerplate set), the per-doc rebuild agg — the single time line
    # TEXT moves — and the totals agg + final id join.
    "corpus_line_dedup": 6,
    # domain discovery: the doc↔vector id equi-join (sort-merge pair)
    # + the nlist-row per-domain aggregation; training cost is bounded
    # sample-side and off-plan.
    "corpus_domains": 3,
    # release diff: each side reduces to (id, digest) at the scan; the
    # full-outer equi-join pays one Exchange per side.
    "corpus_release_diff": 2,
    # the end-to-end curation composite: stage boundaries are lazily
    # checkpointed (each multi-consumer stage computes once), so the
    # visible plan carries only the post-dedup stages — the mixing-rate
    # aggregation, its broadcast join back, and the final projection;
    # the per-stage shuffles are pinned by the stage operators' own
    # suites (same precedent as events_rollup_cascade).
    "curation_full": 3,
    # BM25 serving path: the terms store is bucketed by term (df agg
    # Exchange-free, bucket-pruned scan); the budget covers the idf
    # broadcast, the doclens-store join (broadcast at this sf; one
    # candidate-side hash Exchange at scale — the store side never
    # moves), and the per-doc score rollup.
    "corpus_bm25_indexed": 4,
    # skew report: the (key, count) agg pair + the one-row total agg
    # pair; top-k is TakeOrdered (no sort Exchange), data rows never
    # shuffle
    "events_heavy_hitters": 4,
    # drift report: per release side, one (bucket, count) agg Exchange +
    # the single-partition window over the bucket-sized count frame +
    # its broadcast into the bounds join; final bucket ordering. The
    # corpus sides scan once each.
    "corpus_drift": 7,
    # content-hash split summary: the per-split count_distinct pair +
    # the 3-row ordering; the split itself is scan-stage.
    "corpus_eval_split": 3,
    # leakage audit = the minhash pair pipeline (banded candidates +
    # verify, all narrow) + two id-equi-joins that attach split labels
    # to the candidate-sized pair set + final ordering.
    "corpus_split_leakage": 11,  # +4 r12: conditional spread_scan round-robin ×4 consumers (ReusedExchange at runtime)
    # IVF maintenance stats: (cell, count) agg + the broadcast into the
    # full-cell-set left join + the cell-count-sized ordering.
    "similarity_index_stats": 3,
    # graded decontamination: bench gram-set distinct + its broadcast,
    # the per-doc (id, hits) agg, final id ordering — gram rows carry
    # 8-byte hashes, corpus text never shuffles.
    "corpus_decon_fraction": 6,  # +2 r12: conditional spread_scan round-robin ×2 consumers (ReusedExchange at runtime)
    # compressed ingest telemetry: the (codec, count) agg + the 3-row
    # codec ordering; decode itself is partition-preserving, payloads
    # never shuffle.
    "corpus_ingest_compressed": 3,  # +1 r12: conditional spread_scan round-robin before the CPU-bound codec stage
    # the synthetic-payload drills fan the 8-byte/row id frame across
    # every core BEFORE the CPU-bound Python stage: the tiny parquet is
    # ONE input split, so without this round-robin Exchange the whole
    # encode/decode pipeline ran on a single task (measured 13.4 s →
    # 2.1 s at sf0.1 for the GIF row). Ids shuffle; payloads never do.
    "multimodal_gif_frames": 1,
    "multimodal_features": 1,
    "multimodal_resize": 1,
    "multimodal_audio_features": 1,
    # c-TF-IDF labels: the docs⋈assignment id-join pair + the
    # (domain, term) tf agg, vocab-sized df agg + its join back, and
    # the per-domain top-m window + ordering — every post-assignment
    # Exchange carries (domain, term) rows, never document bodies.
    # r7: 8 → 13 when the mid-build driver collect became the in-plan
    # broadcast average: the (domain, term, tf) aggregate subtree now
    # appears under each of its three consumers (freq, domain mass,
    # scored) in the STATIC plan this audit counts — at runtime AQE
    # folds the duplicates into ReusedExchange nodes, and every one of
    # these Exchanges carries vocab-sized (domain, term) rows, never
    # document bodies. The trade removes an eager corpus-wide job at
    # query-build time (and its uncached recompute at execution).
    "corpus_domain_keywords": 13,
    # data card: the per-source agg pair around the count-distinct
    # rewrite (digest keys are 16 bytes, text never shuffles) + the
    # source ordering; every per-doc metric is scan-stage off ONE split.
    "corpus_datacard": 4,  # +1 r12: conditional spread_scan round-robin
    # token-budget cut: the (src, bucket) agg is map-side-combined to a
    # bucket-table-sized Exchange; the classification window/broadcast
    # move ≤ sources×n_buckets rows; the boundary window shuffles only
    # the boundary buckets (1/n_buckets of the corpus); + the kept-side
    # telemetry agg pair and final ordering. Whole-kept buckets pay
    # zero per-doc work.
    "corpus_token_budget": 9,
}


# Composed end-to-end DRILLS whose query function executes a whole
# multi-store job as a side effect and returns only a ledger read-back —
# building their "plan" here would re-run the job. Every member plan
# (gate, probes, index appends, rollup) is audited via its own
# registered query above; the composition's semantics are pinned in
# tests/test_streaming.py (end-to-end + crash-replay convergence).
COMPOSED_DRILLS = {
    "daily_ingest_composed",
    "daily_ingest_crawl",
    "training_release",
    "corpus_quality_monitor",
    "corpus_ingest_arrow_stream",
}


# Queries audited with stage-boundary checkpoints DISABLED (mode
# "none"): a lazily-checkpointed composite prints a plan whose depth
# depends on what happened to materialize earlier in the session, so
# its assertions would bind only sometimes. Mode "none" makes the FULL
# lineage print deterministically. The cost: Spark duplicates every
# multi-consumer subtree per consumer in that form, so the Exchange
# budget counts duplicated stages — higher than the executed
# checkpointed plan, but stable, and any new shuffle stage still
# raises it.
FULL_PLAN_AUDIT = {
    "corpus_from_crawl",
}


def _plan(spark, sf_dir, name: str) -> str:
    from connect_server_spark.execution import CHECKPOINT_MODE_KEY

    if name in FULL_PLAN_AUDIT:
        spark.conf.set(CHECKPOINT_MODE_KEY, "none")
    try:
        df = _QUERIES[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if name in FULL_PLAN_AUDIT:
            spark.conf.set(CHECKPOINT_MODE_KEY, "local")


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - COMPOSED_DRILLS))
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
    # Shuffle-count ceiling: a new Exchange is a scale regression unless
    # the budget is consciously raised alongside the plan change.
    n_exchange = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
    budget = SHUFFLE_BUDGET.get(name, 0)
    assert n_exchange <= budget, (
        f"{name}: {n_exchange} shuffles > budget {budget} — if intended, "
        "raise SHUFFLE_BUDGET with a justification"
    )
