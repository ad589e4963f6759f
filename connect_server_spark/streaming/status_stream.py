"""Stateful per-key status tracking over an event stream (SURVEY §2.9
T1-T5): the streaming embodiment of the status table.

``track_status`` keeps one state entry per key via
``applyInPandasWithState`` — the Spark-native shape for the reference's
long-running waits (T1: processing-time timeouts), curation gates (T2:
a decision event updates the pending entry), status-step progression
(T3) and lifecycle flags (T5). State is bounded: one small row per live
key, and a timeout moves silent keys to ``hibernating``.

The update function is also usable in batch tests by feeding grouped
pandas frames directly — the logic is deterministic and side-effect
free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["track_status", "OUTPUT_SCHEMA", "STATE_SCHEMA"]

OUTPUT_SCHEMA = (
    "user_id long, n_events long, n_errors long, last_event_type string, "
    "lifecycle string"
)
STATE_SCHEMA = "n_events long, n_errors long, last_event_type string"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        n, errs, last = state.get if state.exists else (0, 0, "")
        yield pd.DataFrame(
            [(key[0], n, errs, last, "hibernating")],
            columns=["user_id", "n_events", "n_errors", "last_event_type", "lifecycle"],
        )
        state.remove()
        return

    n, errs, last = state.get if state.exists else (0, 0, "")
    for pdf in pdfs:
        ordered = pdf.sort_values("ts")
        n += len(ordered)
        errs += int((ordered["event_type"] == "error").sum())
        if len(ordered):
            last = str(ordered["event_type"].iloc[-1])
    state.update((n, errs, last))
    state.setTimeoutDuration(86400 * 1000)  # T1: day-long wait ceiling
    lifecycle = "failed" if last == "error" else "active"
    yield pd.DataFrame(
        [(key[0], n, errs, last, lifecycle)],
        columns=["user_id", "n_events", "n_errors", "last_event_type", "lifecycle"],
    )


def track_status(events: DataFrame) -> DataFrame:
    """Per-user rolling status: event/error counts, last event type, and
    lifecycle flag, maintained incrementally with bounded state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def join_curation_decisions(
    pending: DataFrame,
    decisions: DataFrame,
    wait: str = "10 minutes",
) -> DataFrame:
    """T2, streaming form: the human-curation gate as a watermarked
    stream-stream LEFT OUTER join (``automate/minimus_mdf_flow.py:241-298``
    — a run parks until a decision arrives or the wait ceiling passes).

    ``pending``: streaming (source_id, submitted_at, ...) rows awaiting
    curation. ``decisions``: streaming (source_id, decided_at, decision)
    human verdicts. A decision within ``wait`` of submission resolves the
    row (``curation_state`` = accept/reject); when both watermarks pass
    the window with no decision the row emits unmatched with
    ``curation_state`` = 'hibernating' — exactly the reference's
    WaitTime-expiry route. State is bounded by the watermark: each side
    holds at most ``wait`` of data per key.
    """
    from pyspark.sql import functions as F

    p = pending.withWatermark("submitted_at", wait)
    d = (
        decisions.withWatermark("decided_at", wait)
        .withColumnRenamed("source_id", "_dec_source_id")
    )
    joined = p.join(
        d,
        F.expr(
            f"""
            source_id = _dec_source_id AND
            decided_at >= submitted_at AND
            decided_at <= submitted_at + interval {wait}
            """
        ),
        "leftOuter",
    )
    return joined.select(
        "source_id",
        "submitted_at",
        F.coalesce(F.col("decision"), F.lit("hibernating")).alias(
            "curation_state"
        ),
    )
