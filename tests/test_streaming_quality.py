"""Streaming quality monitoring: per-micro-batch PSI drift + constraint
gate must equal the batch computation on the same data (unified-API
reconcile, like every other streaming test here)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkprep import streaming as st
from sparkprep.operators import expect as ex
from sparkprep.queries import t as load_table
from sparkprep.streaming import quality as sq

EDGES = [0.0, 10.0, 25.0, 50.0, 80.0, 350.0]


@pytest.fixture(scope="module")
def ckpt():
    d = tempfile.mkdtemp(prefix="sparkprep-qckpt-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_drift_monitor_flags_shift_not_identity(spark, sf_dir, ckpt):
    batch = load_table(spark, sf_dir, "events")
    ref_same = ex.reference_shares(batch, "value", EDGES)
    # a deliberately shifted reference: low-value events only
    ref_shifted = ex.reference_shares(
        batch.filter(F.col("value") < 25), "value", EDGES
    )

    recorded = {}

    def record_same(batch_id, rows, psi):
        recorded.setdefault("same", []).append((rows, psi))

    def record_shifted(batch_id, rows, psi):
        recorded.setdefault("shifted", []).append((rows, psi))

    stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
    st.run_available_now(
        stream,
        foreach_batch=sq.drift_monitor_sink("value", EDGES, ref_same, record_same),
        checkpoint=f"{ckpt}/same",
        output_mode="append",
    )
    stream2 = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
    st.run_available_now(
        stream2,
        foreach_batch=sq.drift_monitor_sink("value", EDGES, ref_shifted, record_shifted),
        checkpoint=f"{ckpt}/shifted",
        output_mode="append",
    )

    total = batch.count()
    assert sum(r for r, _ in recorded["same"]) == total
    assert sum(r for r, _ in recorded["shifted"]) == total
    # single-batch drain vs its own distribution: exact zero; vs the
    # truncated reference: unambiguous drift
    same_psis = [p for _, p in recorded["same"] if p is not None]
    shifted_psis = [p for _, p in recorded["shifted"] if p is not None]
    assert max(same_psis) < 0.01
    assert max(shifted_psis) > 0.25

    # batch twin: the stream's single micro-batch must equal the batch call
    if len(same_psis) == 1:
        want = ex.psi_against_reference(batch, "value", EDGES, ref_same).collect()[0]["psi"]
        assert same_psis[0] == want


def test_suite_gate_stream_matches_batch(spark, sf_dir, ckpt):
    suite = ex.Suite(
        checks=[
            ex.completeness("value", 1.0),
            ex.in_range("value", 0.0, 200.0, min_ratio=0.9),
            ex.in_set("event_type", ["view", "click", "purchase", "signup", "error"]),
        ]
    )
    results = []
    stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
    st.run_available_now(
        stream,
        foreach_batch=sq.suite_gate_sink(suite, lambda bid, res: results.append(res)),
        checkpoint=f"{ckpt}/gate",
        output_mode="append",
    )
    assert results
    batch_res = suite.run(load_table(spark, sf_dir, "events"))
    if len(results) == 1:
        assert results[0] == batch_res
    # every batch must agree on set-membership (it holds row-wise)
    assert all(r["checks"]["in_set(event_type)"]["passed"] for r in results)
