"""Structured Streaming path: drain the events table through
Trigger.AvailableNow and reconcile against the equivalent batch
aggregation — the unified-API property the module exists for."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkprep import streaming as st
from sparkprep.queries import t as load_table


@pytest.fixture(scope="module")
def ckpt():
    d = tempfile.mkdtemp(prefix="sparkprep-ckpt-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_stream_matches_batch(spark, sf_dir, ckpt):
    stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = st.windowed_agg_stream(stream, window="1 hour", watermark="2 hours")
    st.run_available_now(
        agg, query_name="win_agg", output_mode="append", checkpoint=f"{ckpt}/win_agg"
    )
    got = spark.sql("SELECT * FROM win_agg")

    batch = load_table(spark, sf_dir, "events")
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )
    # append mode only emits windows FINALIZED by the watermark: windows
    # with end > (max event time - watermark) stay in state when the
    # AvailableNow drain stops — that bounded-state behavior is the
    # semantics under test, so reconcile against the finalized subset.
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    finalized = expected.filter(
        F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    got_rows, exp_rows = key(got), key(finalized)
    assert got_rows == exp_rows
    assert len(key(expected)) - len(exp_rows) <= 4  # only the tail horizon held back


def test_streaming_dedup(spark, sf_dir, ckpt):
    stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
    doubled = stream.union(stream)  # duplicate every event
    dd = st.dedup_stream(doubled, keys=["event_id"], watermark="2 hours")
    st.run_available_now(
        dd, query_name="dedup_stream", output_mode="append",
        checkpoint=f"{ckpt}/dedup",
    )
    got = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0].n
    total = load_table(spark, sf_dir, "events").count()
    assert got == total


def test_sessionize_stream_runs(spark, sf_dir, ckpt):
    stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
    sess = st.sessionize_stream(stream, gap="10 minutes", watermark="2 hours")
    st.run_available_now(
        sess, query_name="sessions", output_mode="append", checkpoint=f"{ckpt}/sess"
    )
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows, "expected at least one closed session"
    # sessions are per-user, start <= end, with positive event counts
    assert all(r.session_start <= r.session_end and r.n_events > 0 for r in rows)


def test_foreach_batch_parquet_roundtrip(spark, sf_dir, ckpt):
    out_dir = tempfile.mkdtemp(prefix="sparkprep-stream-out-")
    try:
        stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
        captured = []

        def sink(batch_df, batch_id):
            captured.append(batch_id)
            batch_df.write.mode("append").parquet(out_dir)

        st.run_available_now(
            stream, foreach_batch=sink, checkpoint=f"{ckpt}/feb", output_mode="append"
        )
        written = spark.read.parquet(out_dir).count()
        assert written == load_table(spark, sf_dir, "events").count()
        assert captured
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

def test_enrich_stream_matches_batch_join(spark, sf_dir, ckpt):
    stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = st.enrich_stream(stream, cust, "user_id").select(
        "event_id", "user_id", "c_mktsegment"
    )
    st.run_available_now(
        enriched, query_name="enriched", output_mode="append",
        checkpoint=f"{ckpt}/enrich",
    )
    got = spark.sql("SELECT * FROM enriched")

    batch = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    expected = batch.join(cust, "user_id", "left").select(
        "event_id", "user_id", "c_mktsegment"
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(got) == key(expected)
