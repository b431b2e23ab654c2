"""Custom stateful streaming operator via ``applyInPandasWithState`` —
arbitrary per-key state the built-in windowed aggregates can't express
(SURVEY §7 extension; the task's 'custom stateful operators' slot).

Example operator: per-user running profile — cumulative event count,
running sum, and max gap between consecutive events — maintained across
micro-batches in GroupState, emitted as updates each batch. The state
survives batch boundaries (checkpointed); a processing-time timeout
would expire idle users in production (left NoTimeout here so the
AvailableNow backfill drains deterministically).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, max_gap_seconds double"
)
STATE_SCHEMA = "n long, s double, last_ts double, max_gap double"


def _update_user_profile(
    key: Tuple[int],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, last_ts, max_gap = state.get
    else:
        n, s, last_ts, max_gap = 0, 0.0, None, 0.0
    # Concatenate BEFORE sorting: a group bigger than one Arrow chunk
    # (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k)
    # arrives as several DataFrames in arbitrary order — chunk-local
    # sorts would process them out of event-time order and corrupt the
    # gap chain. Memory is bounded by the group's per-batch volume,
    # which the operator buffers either way.
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        ts_sec = pdf["ts"].astype("int64") / 1e9
        for t in ts_sec:
            # gaps only ever measure FORWARD progress: a late event
            # older than last_ts (at-least-once replay, late file) must
            # not drag last_ts backward and inflate the next gap
            if last_ts is not None and t >= last_ts:
                max_gap = max(max_gap, t - last_ts)
            if last_ts is None or t > last_ts:
                last_ts = t
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s, last_ts, max_gap))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(s, 2)],
            "max_gap_seconds": [round(max_gap, 1)],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Stateful per-user profile over a stream: groupBy(user).
    applyInPandasWithState, update-mode output (one row per user per
    batch with the latest running values)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PATTERN_OUT_SCHEMA = (
    "user_id long, t_view timestamp, t_click timestamp, t_purchase timestamp, "
    "duration_sec double"
)
_PATTERN_STATE_SCHEMA = "t_view long, t_click long, t_purchase long, emitted boolean"


def _make_pattern_detector(within_sec: float):
    def _detect_pattern(key, batches, state):
        return _detect_pattern_impl(key, batches, state, within_sec)

    return _detect_pattern


def _detect_pattern_impl(key, batches, state, within_sec):
    """First-completion CEP: per user, the FIRST view, the first click
    AFTER that view, the first purchase AFTER that click — emitted once
    when the chain completes within the duration cap. min-based chain =
    deterministic and exactly reproducible in batch (the reconcile
    test's contract)."""
    import pandas as pd

    (user_id,) = key
    if state.exists:
        t_view, t_click, t_purchase, emitted = state.get
    else:
        t_view, t_click, t_purchase, emitted = None, None, None, False
    out = []
    chunks = [pdf for pdf in batches if len(pdf)]
    # one concat + one sort: chunk-local sorts would replay a >10k-event
    # group's chunks out of event-time order (see _update_user_profile)
    for pdf in ([pd.concat(chunks, ignore_index=True).sort_values("ts")] if chunks else []):
        for _, row in pdf.iterrows():
            # .value (epoch ns, exact int64) — NOT .timestamp(), which
            # interprets a naive Timestamp in the SYSTEM timezone, and
            # NOT float seconds, whose ns residue Arrow refuses to cast
            ts = int(row["ts"].value)
            et = row["event_type"]
            if t_view is None:
                if et == "view":
                    t_view = ts
            elif t_click is None:
                if et == "click" and ts > t_view:
                    t_click = ts
            elif t_purchase is None:
                if et == "purchase" and ts > t_click:
                    t_purchase = ts
    if (not emitted and t_purchase is not None
            and t_purchase - t_view <= within_sec * 1e9):
        emitted = True
        out.append(
            {
                "user_id": user_id,
                "t_view": pd.Timestamp(t_view),
                "t_click": pd.Timestamp(t_click),
                "t_purchase": pd.Timestamp(t_purchase),
                "duration_sec": round((t_purchase - t_view) / 1e9, 1),
            }
        )
    state.update((t_view, t_click, t_purchase, emitted))
    if out:
        yield pd.DataFrame(out)


def funnel_pattern_stream(events: DataFrame, within_sec: float = 3600.0) -> DataFrame:
    """Ordered-sequence (CEP) detection over a stream: per user, emit
    ONE row when view → click → purchase completes within the duration
    cap — state carries the partial match across micro-batches. The
    pattern chain is min-based (first qualifying event per stage), so
    the batch twin is three conditional aggregates and the reconcile is
    exact."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_pattern_detector(within_sec),
        outputStructType=PATTERN_OUT_SCHEMA,
        stateStructType=_PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
