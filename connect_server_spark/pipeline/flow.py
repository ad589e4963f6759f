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


def _set_char(code: Column, idx: int, char: Column) -> Column:
    return F.concat(
        F.substring(code, 1, idx),
        char,
        F.substring(code, idx + 2, _N - idx - 1),
    )


def run_flow(
    df: DataFrame,
    stages: list[FlowStage],
    cancelled_col: str | None = None,
) -> DataFrame:
    """Execute the staged DAG. Adds ``status_code`` (12 chars),
    ``flow_state`` (active/failed/hibernating/cancelled) and one
    ``{stage}_result`` struct per result-bearing stage."""
    state = (
        F.when(F.col(cancelled_col), F.lit("cancelled")).otherwise(F.lit("active"))
        if cancelled_col
        else F.lit("active")
    )
    out = df.withColumn("status_code", F.lit("z" * _N)).withColumn(
        "flow_state", state
    )
    for st in stages:
        active = F.col("flow_state") == "active"
        runnable = active & (st.choice if st.choice is not None else F.lit(True))
        failed_now = runnable & (st.fail if st.fail is not None else F.lit(False))
        hib_now = (
            runnable
            & ~failed_now
            & (st.hibernate if st.hibernate is not None else F.lit(False))
        )
        if st.step is not None:
            idx = STATUS_STEPS.index(st.step)
            char = (
                F.when(failed_now, F.lit("F"))
                .when(hib_now, F.lit("H"))
                .when(runnable, F.lit("S"))
            )
            new_code = F.when(
                runnable, _set_char(F.col("status_code"), idx, char)
            ).otherwise(F.col("status_code"))
            out = out.withColumn("status_code", new_code)
        if st.result:
            payload = F.struct(
                *[c.alias(k) for k, c in st.result.items()],
                runnable.alias("ran"),
            )
            out = out.withColumn(f"{st.name}_result", payload)
        new_state = (
            F.when(failed_now, F.lit("failed"))
            .when(hib_now, F.lit("hibernating"))
            .otherwise(F.col("flow_state"))
        )
        out = out.withColumn("flow_state", new_state)
    return out


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
