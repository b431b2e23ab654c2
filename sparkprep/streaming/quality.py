"""Streaming data-quality monitoring: per-micro-batch PSI drift and
constraint-suite gating against fixed references.

The monitoring shape that scales: the reference distribution is reduced
ONCE to a K-row share table (operators/expect.reference_shares) at
monitor setup; every micro-batch then costs one map-combined groupBy on
the bin id. Nothing corpus-sized is ever held as stream state — this is
deliberately ``foreachBatch``, not a stateful operator: drift scores
are per-batch observations to be sinked/alerted on, not an aggregate
the stream must maintain exactly-once.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def drift_monitor_sink(
    col: str,
    breakpoints: list[float],
    ref_shares: dict[int, float],
    record: Callable[[int, int, float], None],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: score each micro-batch's ``col`` distribution
    against the precomputed reference and hand
    ``(batch_id, rows, psi)`` to ``record`` (append to a metrics table,
    page an alert channel, ...). ONE job per batch — the row count
    rides inside the PSI aggregate (NULL values count via a sentinel
    bin), so the monitor never scans a batch twice. Empty/all-NULL
    batches record their row count with psi=None — a throughput
    signal, not maximal drift."""
    from sparkprep.operators.expect import psi_against_reference

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        row = psi_against_reference(
            batch_df, col, breakpoints, ref_shares
        ).collect()[0]
        record(batch_id, row["rows"], row["psi"])

    return hook


def suite_gate_sink(
    suite,
    on_result: Callable[[int, dict], None],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook running a declarative expect.Suite per
    micro-batch (ONE aggregate pass over the batch) and reporting the
    pass/fail dict — the streaming twin of the batch quality gate, with
    identical check expressions."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_result(batch_id, suite.run(batch_df))

    return hook
