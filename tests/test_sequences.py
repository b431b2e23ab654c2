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
