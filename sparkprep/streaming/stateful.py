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
    for pdf in batches:
        pdf = pdf.sort_values("ts")
        ts_sec = pdf["ts"].astype("int64") / 1e9
        for t in ts_sec:
            if last_ts is not None:
                max_gap = max(max_gap, t - last_ts)
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
