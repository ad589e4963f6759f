"""Flow-DAG executor: the reference's Globus Flow state machine
(``automate/minimus_mdf_flow.py:53-499``, SURVEY §3.2) re-expressed as a
set-oriented staged fold over a submissions DataFrame.

Semantics carried over:

* **Choice states** (P14) — per-row run predicates (``when``-based); a
  skipped stage leaves its status char untouched.
* **Catch blocks** — a failing stage flips the row's ``flow_state`` to
  ``failed``; downstream stages see the row as not-runnable (the
  ExceptionState route, ``minimus_mdf_flow.py:101-111,128-138``).
* **ResultPath accumulation** (F12) — each stage writes a result struct
  column ``{name}_result``, so the document grows stage-by-stage exactly
  like the reference's JSONPath writes.
* **12-step status code** (T3) — one char per STATUS_STEPS entry
  (``aws/dynamo_manager.py:30-43``): ``z`` untouched, ``S`` success,
  ``F`` failure, ``H`` hibernated; updated via substring surgery.
* **Lifecycle flags** (T5) — ``active`` / ``failed`` / ``hibernating`` /
  ``cancelled`` state column (defaults ``aws/dynamo_manager.py:347-353``).
* **Human curation gate** (T2) — modeled as a decisions *input column*
  (accept/reject/pending): pending hibernates the run, reject fails it
  (``minimus_mdf_flow.py:241-298``). In streaming this becomes a join
  against a decisions stream (see streaming module).
* **Curation-failure classifier** (P15) — any failure char, or a final
  char outside the success set (``tests/run_deploy_suite.py:155-169``).

Everything is one linear chain of projections — no shuffle at all; the
whole DAG executes in the scan stage per partition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["STATUS_STEPS", "FlowStage", "run_flow", "curation_failure_classifier"]

# The 12 pipeline steps (aws/dynamo_manager.py:30-43).
STATUS_STEPS = (
    "sub_start",
    "old_cancel",
    "data_download",
    "data_transfer",
    "extracting",
    "curation",
    "ingest_search",
    "ingest_backup",
    "ingest_publish",
    "ingest_citrine",
    "ingest_mrr",
    "ingest_cleanup",
)

_N = len(STATUS_STEPS)
SUCCESS_CHARS = ("S", "M", "L")
FAILURE_CHARS = ("F", "R", "H", "X")


@dataclass
class FlowStage:
    """One Action/Choice state.

    ``choice``: run predicate (None = always run while active).
    ``fail``: failure predicate, evaluated only when run (Catch route).
    ``hibernate``: parks the run awaiting external input (curation).
    ``result``: ResultPath payload columns, written as a struct column
    ``{name}_result`` for rows that ran.
    """

    name: str
    step: str | None = None
    choice: Column | None = None
    fail: Column | None = None
    hibernate: Column | None = None
    result: dict[str, Column] = field(default_factory=dict)


def run_flow(
    df: DataFrame,
    stages: list[FlowStage],
    cancelled_col: str | None = None,
) -> DataFrame:
    """Execute the staged DAG. Adds ``status_code`` (12 chars),
    ``flow_state`` (active/failed/hibernating/cancelled) and one
    ``{stage}_result`` struct per result-bearing stage."""
    # r12 (guide §7.3 "very large plans" / §1.2): the fold is built as
    # TWO projections instead of 2-3 ``withColumn`` calls per stage —
    # the old shape re-analyzed a widening plan ~36 times and chained 12
    # rounds of substring surgery through 12 intermediate projections,
    # pure driver-side plan-construction cost (measured 3.2 s of
    # flow_execute's 3.6 s wall at sf0.1). The closed form uses what the
    # sequential fold guarantees anyway: a row's flow_state flips at
    # most ONCE — every flip (fail or hibernate) requires the row to
    # still be active, so the FIRST stage whose raw flip condition holds
    # is the one that actually fired. Projection 1 materializes those
    # RAW flip predicates (choice∧fail / choice∧¬fail∧hibernate,
    # null-coalesced to false — each a small input-only expression) as
    # flag columns; projection 2 derives everything from flag ATTRIBUTE
    # REFERENCES: ``blocked before stage k`` = OR of the 2(k-1) flags,
    # each status_code position is a reverse-order CASE over its
    # writers (last runnable writer wins), and the final state is a
    # first-match CASE over the flags in stage order. Keeping the flags
    # as a projection boundary is load-bearing: inlining them (the
    # first cut of this rewrite) nests each stage's predicate inside
    # every later stage's — the tree grows exponentially and analysis
    # OOMs/crawls. NULL semantics are preserved: a NULL flip predicate
    # coalesces to false — the row stays active — exactly as the old
    # ``when(flip, ...).otherwise(keep)`` fell through, and the NULL
    # ``ran``/char cases reproduce via the same when-chains.
    init_state = (
        F.when(F.col(cancelled_col), F.lit("cancelled")).otherwise(F.lit("active"))
        if cancelled_col
        else F.lit("active")
    )
    init_blocked = (
        F.when(F.col(cancelled_col), F.lit(True)).otherwise(F.lit(False))
        if cancelled_col
        else F.lit(False)
    )
    flag_cols: list[Column] = []
    for i, st in enumerate(stages):
        choice = st.choice if st.choice is not None else F.lit(True)
        fail = st.fail if st.fail is not None else F.lit(False)
        hib = st.hibernate if st.hibernate is not None else F.lit(False)
        flag_cols.append(
            F.coalesce(choice & fail, F.lit(False)).alias(f"_flow_ff{i}")
        )
        flag_cols.append(
            F.coalesce(choice & ~(choice & fail) & hib, F.lit(False)).alias(
                f"_flow_fh{i}"
            )
        )
    flagged = df.select("*", init_blocked.alias("_flow_blocked0"), *flag_cols)

    blocked = F.col("_flow_blocked0")
    writes: dict[int, list[tuple[Column, Column]]] = {}
    result_cols: list[Column] = []
    state_chain: list[tuple[Column, Column]] = []  # (flag, state) in stage order
    for i, st in enumerate(stages):
        choice = st.choice if st.choice is not None else F.lit(True)
        ff, fh = F.col(f"_flow_ff{i}"), F.col(f"_flow_fh{i}")
        runnable = ~blocked & choice
        # failed_now/hib_now via the flags: inside when()-conditions the
        # coalesced flags are indistinguishable from the originals (NULL
        # and false both fall through)
        failed_now = runnable & ff
        hib_now = runnable & fh
        if st.step is not None:
            idx = STATUS_STEPS.index(st.step)
            char = (
                F.when(failed_now, F.lit("F"))
                .when(hib_now, F.lit("H"))
                .when(runnable, F.lit("S"))
            )
            writes.setdefault(idx, []).append((runnable, char))
        if st.result:
            result_cols.append(
                F.struct(
                    *[c.alias(k) for k, c in st.result.items()],
                    runnable.alias("ran"),
                ).alias(f"{st.name}_result")
            )
        state_chain.append((ff, F.lit("failed")))
        state_chain.append((fh, F.lit("hibernating")))
        blocked = blocked | ff | fh

    def pos_char(idx: int) -> Column:
        c = F.lit("z")
        # last runnable writer wins == first match over reversed writes
        for runnable, char in reversed(writes.get(idx, [])):
            c = F.when(F.coalesce(runnable, F.lit(False)), char).otherwise(c)
        return c

    status_code = F.concat(*[pos_char(i) for i in range(_N)])
    flow_state = init_state
    for flip, state in reversed(state_chain):
        flow_state = F.when(flip, state).otherwise(flow_state)
    if cancelled_col:
        # cancelled rows never run a stage, so no flip may outrank the
        # cancelled verdict — the outermost branch restores that
        flow_state = F.when(
            F.coalesce(F.col(cancelled_col), F.lit(False)), F.lit("cancelled")
        ).otherwise(flow_state)
    return flagged.select(
        *df.columns,
        status_code.alias("status_code"),
        flow_state.alias("flow_state"),
        *result_cols,
    )


def curation_failure_classifier(code: Column) -> Column:
    """P15: true when the run counts as failed — any failure char in the
    code, or the last *progressed* char is not a success char
    (``tests/run_deploy_suite.py:155-169``; ``z`` suffix = steps never
    started, ignored for the final-char rule)."""
    failure_set = F.array(*[F.lit(c) for c in FAILURE_CHARS])
    any_failure = F.exists(
        F.split(code, ""), lambda c: F.array_contains(failure_set, c)
    )
    progressed = F.rtrim(F.regexp_replace(code, "z+$", ""))
    last = F.substring(progressed, -1, 1)
    bad_tail = (F.length(progressed) > 0) & ~last.isin(*SUCCESS_CHARS)
    return any_failure | bad_tail
