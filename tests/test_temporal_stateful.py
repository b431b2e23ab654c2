"""Temporal joins (unit-level semantics) + custom stateful streaming
operator (applyInPandasWithState) reconciliation."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkprep.operators import temporal


@pytest.fixture(scope="module")
def ticks(spark):
    # left: trades; right: quotes (market-data asof classic)
    trades = spark.createDataFrame(
        [
            ("A", 5.0, 100),
            ("A", 10.0, 200),
            ("A", 3.0, 300),   # before any quote for A at t=3? quote at 2
            ("B", 4.0, 400),
            ("B", 1.0, 500),   # before first B quote (t=2) -> null
        ],
        ["sym", "t", "qty"],
    )
    quotes = spark.createDataFrame(
        [("A", 2.0, 9.9), ("A", 5.0, 10.1), ("A", 9.0, 10.5), ("B", 2.0, 20.0)],
        ["sym", "t", "px"],
    )
    return trades, quotes


def test_asof_backward_with_ties_and_nulls(ticks):
    trades, quotes = ticks
    out = temporal.asof_join(trades, quotes, on="t", by="sym", value_cols=["px"])
    got = {(r.sym, r.t): r.px for r in out.collect()}
    assert got[("A", 5.0)] == 10.1   # tie: equal timestamp visible
    assert got[("A", 10.0)] == 10.5
    assert got[("A", 3.0)] == 9.9
    assert got[("B", 4.0)] == 20.0
    assert got[("B", 1.0)] is None   # no quote yet -> null


def test_asof_forward(ticks):
    trades, quotes = ticks
    out = temporal.asof_join(
        trades, quotes, on="t", by="sym", value_cols=["px"], direction="forward"
    )
    got = {(r.sym, r.t): r.px for r in out.collect()}
    assert got[("A", 3.0)] == 10.1   # next quote at t=5
    assert got[("A", 10.0)] is None  # nothing after t=9


def test_range_join_binning_matches_naive(spark, sf_dir):
    from sparkprep.queries import t as load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = (
        ev.limit(50)
        .select(F.col("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 3 HOURS"))
        .withColumn("iv_id", F.monotonically_increasing_id())
    )
    binned = temporal.range_join(ev, iv, "ts", "start_ts", "end_ts", bucket="1 hour")
    naive = ev.join(
        iv, (ev.ts >= iv.start_ts) & (ev.ts < iv.end_ts)
    )
    assert binned.count() == naive.count()
    b = {(r.event_id, r.iv_id) for r in binned.select("event_id", "iv_id").collect()}
    n = {(r.event_id, r.iv_id) for r in naive.select("event_id", "iv_id").collect()}
    assert b == n


def test_stateful_running_profile_matches_batch(spark, sf_dir):
    from sparkprep import streaming as st
    from sparkprep.streaming.stateful import running_user_profile

    ckpt = tempfile.mkdtemp(prefix="sparkprep-state-")
    try:
        stream = st.read_events_stream(spark, f"{sf_dir}/events.parquet")
        prof = running_user_profile(stream)
        st.run_available_now(
            prof, query_name="user_prof", output_mode="update",
            checkpoint=f"{ckpt}/p",
        )
        got = {
            r.user_id: (r.n_events, r.sum_value)
            for r in spark.sql(
                # update mode: keep the LAST row per user (monotone n)
                """SELECT user_id, max_by(n_events, n_events) AS n_events,
                          max_by(sum_value, n_events) AS sum_value
                   FROM user_prof GROUP BY user_id"""
            ).collect()
        }
        from sparkprep.queries import t as load_table

        batch = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("s"),
            )
        )
        expected = {r.user_id: (r.n, r.s) for r in batch.collect()}
        assert got == expected
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

def test_asof_unkeyed_refused(ticks):
    # by=None would build Window.partitionBy() — the empty-frame
    # single-partition landmine; the API must refuse it loudly
    trades, quotes = ticks
    with pytest.raises(ValueError, match="single partition"):
        temporal.asof_join(trades, quotes, on="t", by=None, value_cols=["px"])


def test_merge_upsert_null_overwrites(spark):
    # SQL MERGE semantics: a matched update row wins WHOLESALE — its
    # nulls overwrite target values (not per-column coalesce)
    from sparkprep.operators import transform

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["k", "name", "val"]
    )
    updates = spark.createDataFrame(
        [(2, None, 99.0), (3, "c", 30.0)], ["k", "name", "val"]
    )
    out = {r.k: (r.name, r.val) for r in
           transform.merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: (None, 99.0), 3: ("c", 30.0)}


def test_resample_ffill_gaps(spark):
    # 3-hour gap -> two filled rows carrying the last observed value
    from sparkprep.operators import temporal

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:10:00", 1.0), ("u", "2024-01-01 03:20:00", 4.0)],
        ["k", "ts_s", "v"],
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "v")
    rows = sorted(
        temporal.resample_ffill(df, "ts", "k", "v").collect(),
        key=lambda r: r.ts,
    )
    assert len(rows) == 4
    assert [r.value_ff for r in rows] == [1.0, 1.0, 1.0, 4.0]
    assert [r.is_gap for r in rows] == [False, True, True, False]


def test_funnel_pattern_stream_matches_batch(spark, sf_dir, tmp_path):
    # CEP first-completion chain == the batch min-based conditional-agg
    # twin, exactly (same chain, same 24h duration cap — 1h has zero
    # completions at sf0.001, which would make the reconcile vacuous)
    from pyspark.sql import functions as F

    from sparkprep.queries import t as load_table
    from sparkprep.streaming import events as stv
    from sparkprep.streaming.stateful import funnel_pattern_stream

    stream = stv.read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = funnel_pattern_stream(stream, within_sec=86400.0)
    stv.run_available_now(
        out, query_name="cep", output_mode="append",
        checkpoint=str(tmp_path / "cep"),
    )
    got = {
        (r.user_id, r.t_view, r.t_click, r.t_purchase, r.duration_sec)
        for r in spark.sql("SELECT * FROM cep").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("cts"))
    c = (
        per_user.join(clicks, "user_id")
        .filter(F.col("cts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("t_view").alias("t_view"), F.min("cts").alias("t_click"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("pts"))
    full = (
        c.join(purch, "user_id")
        .filter(F.col("pts") > F.col("t_click"))
        .groupBy("user_id").agg(
            F.min("t_view").alias("t_view"), F.min("t_click").alias("t_click"),
            F.min("pts").alias("t_purchase"),
        )
        .withColumn(
            "duration_sec",
            F.round((F.unix_micros("t_purchase") - F.unix_micros("t_view")) / 1e6, 1),
        )
        .filter(F.col("duration_sec") <= 86400.0)
    )
    expected = {
        (r.user_id, r.t_view, r.t_click, r.t_purchase, r.duration_sec)
        for r in full.collect()
    }
    assert got == expected
    assert got, "expected at least one completed pattern at this SF"


def test_sessionize_ids_gap_boundaries(spark):
    import datetime

    from sparkprep.operators import temporal

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes, uid, eid):
        return (uid, eid, base + datetime.timedelta(minutes=minutes), "x")

    rows = [
        at(0, 1, 1), at(29, 1, 2),   # 29-min gap: same session (<= 30)
        at(59, 1, 3),                 # 30-min gap exactly: still same
        at(90, 1, 4),                 # 31-min gap: NEW session
        at(0, 2, 5),                  # other key: its own counter
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    out = temporal.sessionize_ids(
        df, ["user_id"], "ts", gap="30 minutes", order_cols=["ts", "event_id"]
    )
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}
    # every input column survives
    assert set(out.columns) == {"user_id", "event_id", "ts", "event_type", "session_id"}
