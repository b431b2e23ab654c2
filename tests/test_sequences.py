"""event_sequences semantics the oracle can't see: hot-key cap
behavior, order determinism under layout changes, one-exchange plan."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkprep.operators import temporal


def _events(spark, per_user):
    rows = [
        Row(u=u, i=i, ev=f"e{i % 7}")
        for u, n in per_user.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows).repartition(8)


class TestEventSequences:
    def test_cap_and_total_accounting(self, spark):
        df = _events(spark, {1: 3, 2: 50})
        out = {
            r["u"]: r
            for r in temporal.event_sequences(
                df, "u", ["i"], "ev", max_len=10
            ).collect()
        }
        # short user: full sequence, n_events == len
        assert out[1]["n_events"] == 3
        assert out[1]["seq"] == "e0,e1,e2"
        # hot user: seq capped at 10, total count preserved
        assert out[2]["n_events"] == 50
        assert out[2]["seq"].count(",") == 9
        assert out[2]["seq"] == ",".join(f"e{i % 7}" for i in range(10))

    def test_order_is_layout_independent(self, spark):
        df = _events(spark, {7: 30})
        a = temporal.event_sequences(df, "u", ["i"], "ev", max_len=30).collect()
        b = temporal.event_sequences(
            df.repartition(3), "u", ["i"], "ev", max_len=30
        ).collect()
        assert a[0]["seq"] == b[0]["seq"]

    def test_single_exchange_plan(self, spark):
        """Window (partitionBy key) and groupBy(key) hash on the same
        key: the agg must reuse the window's exchange — two shuffles
        of the event stream would double the op's scale cost."""
        df = _events(spark, {1: 5, 2: 5})
        out = temporal.event_sequences(df, "u", ["i"], "ev", max_len=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one keyed shuffle (the fixture's own round-robin
        # repartition is not the operator's doing)
        assert plan.count("Exchange hashpartitioning") == 1


class TestDebounce:
    def _events(self, spark, times):
        from pyspark.sql import Row

        rows = [
            Row(u=u, ts=__import__("datetime").datetime(2024, 1, 1)
                + __import__("datetime").timedelta(seconds=s), eid=i)
            for i, (u, s) in enumerate(times)
        ]
        return spark.createDataFrame(rows).repartition(4)

    def test_bursts_split_on_gap(self, spark):
        # user 1: events at 0,3,6s (one burst, gap=5s), then 60s (new)
        df = self._events(spark, [(1, 0), (1, 3), (1, 6), (1, 60), (2, 0)])
        out = temporal.debounce(
            df, ["u"], "ts", gap="5 seconds", order_cols=["ts", "eid"]
        )
        got = {(r["u"], r["burst_id"]): r["n_events"] for r in out.collect()}
        assert got == {(1, 1): 3, (1, 2): 1, (2, 1): 1}

    def test_exact_gap_stays_in_burst(self, spark):
        # boundary is STRICTLY greater-than: a gap of exactly 5s chains
        df = self._events(spark, [(1, 0), (1, 5), (1, 11)])
        out = temporal.debounce(
            df, ["u"], "ts", gap="5 seconds", order_cols=["ts", "eid"]
        ).collect()
        sizes = sorted(r["n_events"] for r in out)
        assert sizes == [1, 2]

    def test_single_exchange(self, spark):
        df = self._events(spark, [(1, 0), (1, 3)])
        plan = temporal.debounce(
            df, ["u"], "ts", gap="5 seconds", order_cols=["ts", "eid"]
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1


class TestDecayedAgg:
    def test_hand_computed(self, spark):
        import datetime as dt

        from pyspark.sql import Row

        base = dt.datetime(2024, 1, 8)
        rows = [
            Row(u=1, ts=base, v=10.0),                      # age 0 -> w=1
            Row(u=1, ts=base - dt.timedelta(days=7), v=10.0),  # w=0.5
            Row(u=2, ts=base, v=4.0),
        ]
        df = spark.createDataFrame(rows).repartition(3)
        out = {
            r["u"]: r
            for r in temporal.decayed_agg(
                df, "u", "ts", "v", half_life="7 days"
            ).collect()
        }
        assert out[1]["decayed_value"] == 15.0  # 10*1 + 10*0.5
        assert out[1]["n_events"] == 2
        assert out[2]["decayed_value"] == 4.0  # newest event never decays


class TestGroupedEwma:
    def test_recurrence_and_layout_independence(self, spark):
        import datetime as dt

        from pyspark.sql import Row

        from sparkprep.operators import grouped

        base = dt.datetime(2024, 1, 1)
        rows = [
            Row(k=1, i=j, ts=base + dt.timedelta(seconds=j), v=float(x))
            for j, x in enumerate([10.0, 20.0, 0.0, 40.0])
        ]
        df = spark.createDataFrame(rows)
        out = grouped.grouped_ewma(df, ["k"], ["ts", "i"], "v", alpha=0.5)
        got = {r["i"]: r["ewma"] for r in out.collect()}
        # y: 10, 15, 7.5, 23.75
        assert got == {0: 10.0, 1: 15.0, 2: 7.5, 3: 23.75}
        got2 = {
            r["i"]: r["ewma"]
            for r in grouped.grouped_ewma(
                df.repartition(7), ["k"], ["ts", "i"], "v", alpha=0.5
            ).collect()
        }
        assert got2 == got


class TestGroupedCusum:
    def test_recurrence_resets_at_zero_and_alarms(self, spark):
        import datetime as dt

        from pyspark.sql import Row

        from sparkprep.operators import grouped

        base = dt.datetime(2024, 1, 1)
        # target 10, slack 0: deviations +5, +5, -20 (clamps to 0), +12
        vals = [15.0, 15.0, -10.0, 22.0]
        rows = [
            Row(k=1, i=j, ts=base + dt.timedelta(seconds=j), v=v)
            for j, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows).repartition(3)
        out = {
            r["i"]: r
            for r in grouped.grouped_cusum(
                df, ["k"], ["ts", "i"], "v",
                target=10.0, threshold=11.0,
            ).collect()
        }
        assert [out[i]["cusum"] for i in range(4)] == [5.0, 10.0, 0.0, 12.0]
        assert [out[i]["alarm"] for i in range(4)] == [False, False, False, True]
