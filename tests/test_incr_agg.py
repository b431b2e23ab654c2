"""merge_aggregates semantics the oracle can't isolate: absent keys on
either side, NULL-measure identities, and merged-equals-recompute on a
randomized frame."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkprep.operators.transform import merge_aggregates


def _agg(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )


MEASURES = {"n": "sum", "total": "sum", "vmin": "min", "vmax": "max"}


class TestMergeAggregates:
    def test_merge_equals_full_recompute(self, spark):
        rng = np.random.RandomState(11)
        rows = [
            Row(k=int(rng.randint(0, 20)), v=int(rng.randint(-50, 50)))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows).repartition(8)
        base = df.filter(F.col("v") % 3 != 0)
        delta = df.filter(F.col("v") % 3 == 0)
        merged = merge_aggregates(_agg(base), _agg(delta), ["k"], MEASURES)
        want = {r["k"]: r for r in _agg(df).collect()}
        got = {r["k"]: r for r in merged.collect()}
        assert set(got) == set(want)
        for k in want:
            for c in ("n", "total", "vmin", "vmax"):
                assert got[k][c] == want[k][c], (k, c)

    def test_absent_keys_pass_through_both_directions(self, spark):
        base = spark.createDataFrame(
            [Row(k=1, n=5, total=10, vmin=0, vmax=9)]
        )
        delta = spark.createDataFrame(
            [Row(k=2, n=3, total=7, vmin=1, vmax=4)]
        )
        got = {r["k"]: r for r in merge_aggregates(
            base, delta, ["k"], MEASURES).collect()}
        assert got[1]["n"] == 5 and got[1]["total"] == 10
        assert got[2]["n"] == 3 and got[2]["vmax"] == 4

    def test_null_measure_identities(self, spark):
        schema = "k: long, n: long, total: long, vmin: long, vmax: long"
        base = spark.createDataFrame(
            [Row(k=1, n=2, total=None, vmin=None, vmax=7)], schema
        )
        delta = spark.createDataFrame(
            [Row(k=1, n=1, total=None, vmin=3, vmax=None)], schema
        )
        r = merge_aggregates(base, delta, ["k"], MEASURES).collect()[0]
        # both-NULL sum stays NULL (an all-NULL group recomputes to NULL)
        assert r["total"] is None
        # min/max: NULL side is absent-side identity, not poison
        assert r["vmin"] == 3 and r["vmax"] == 7
        assert r["n"] == 3

    def test_unknown_kind_raises(self, spark):
        df = spark.createDataFrame([Row(k=1, n=1)])
        with pytest.raises(ValueError, match="unknown measure kinds"):
            merge_aggregates(df, df, ["k"], {"n": "avg"})
