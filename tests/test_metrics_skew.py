"""Semantics the oracles can't see for binned_auc and key_skew_report:
exact-AUC parity on grid scores, binning-approximation direction,
degenerate classes, and skew-factor math on a hand-built table."""

import math

import numpy as np
from pyspark.sql import Row

from sparkprep.operators.features import binned_auc
from sparkprep.operators.skew import key_skew_report


def _exact_auc(scores, labels):
    """Mann-Whitney with mid-rank ties, brute force."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    if not pos or not neg:
        return None
    wins = 0.0
    for p in pos:
        for n in neg:
            wins += 1.0 if p > n else (0.5 if p == n else 0.0)
    return wins / (len(pos) * len(neg))


class TestBinnedAuc:
    def test_exact_on_grid_scores(self, spark):
        # scores on the 1/1000 grid -> binning is lossless -> exact AUC
        rng = np.random.RandomState(3)
        scores = [round(float(x), 3) for x in rng.uniform(size=200)]
        labels = [bool(rng.uniform() < s) for s in scores]  # informative
        df = spark.createDataFrame(
            [Row(score=s, label=y) for s, y in zip(scores, labels)]
        ).repartition(8)
        row = binned_auc(df, "score", "label", bins=1000).collect()[0]
        want = _exact_auc(scores, labels)
        assert math.isclose(row["auc"], round(want, 6), abs_tol=1e-9)
        assert row["n_pos"] == sum(labels)
        assert row["n_neg"] == len(labels) - sum(labels)

    def test_perfect_and_random_separation(self, spark):
        rows = [Row(score=0.9, label=True)] * 10 + [
            Row(score=0.1, label=False)
        ] * 10
        df = spark.createDataFrame(rows)
        assert binned_auc(df, "score", "label").collect()[0]["auc"] == 1.0
        # all scores identical -> every pair ties -> 0.5
        same = spark.createDataFrame(
            [Row(score=0.5, label=i % 2 == 0) for i in range(20)]
        )
        assert binned_auc(same, "score", "label").collect()[0]["auc"] == 0.5

    def test_single_class_is_null(self, spark):
        df = spark.createDataFrame([Row(score=0.5, label=True)] * 5)
        row = binned_auc(df, "score", "label").collect()[0]
        assert row["auc"] is None
        assert row["n_neg"] == 0

    def test_null_scores_excluded_and_clamping(self, spark):
        df = spark.createDataFrame(
            [
                Row(score=None, label=True),
                Row(score=1.5, label=True),   # clamps into top bin
                Row(score=-0.5, label=False),  # clamps into bottom bin
            ],
            "score: double, label: boolean",
        )
        row = binned_auc(df, "score", "label").collect()[0]
        assert row["n_pos"] == 1 and row["n_neg"] == 1
        assert row["auc"] == 1.0


class TestKeySkewReport:
    def test_counts_share_and_factor(self, spark):
        # 4 keys: 60, 20, 15, 5 rows -> total 100, mean load 25
        rows = (
            [Row(k="hot")] * 60
            + [Row(k="warm")] * 20
            + [Row(k="mild")] * 15
            + [Row(k="cold")] * 5
        )
        df = spark.createDataFrame(rows).repartition(8)
        out = {r["key"]: r for r in key_skew_report(df, "k", top=3).collect()}
        assert set(out) == {"hot", "warm", "mild"}  # top-3 only
        assert out["hot"]["n"] == 60
        assert math.isclose(out["hot"]["share"], 0.6, abs_tol=1e-9)
        # skew factor = 60 / (100/4) = 2.4
        assert math.isclose(out["hot"]["skew_factor"], 2.4, abs_tol=1e-9)
        assert math.isclose(out["mild"]["skew_factor"], 0.6, abs_tol=1e-9)

    def test_tie_break_is_deterministic(self, spark):
        rows = [Row(k=f"k{i}") for i in range(6) for _ in range(10)]
        df = spark.createDataFrame(rows)
        got = [r["key"] for r in key_skew_report(df, "k", top=4).collect()]
        assert got == ["k0", "k1", "k2", "k3"]  # equal counts -> key asc


class TestWinsorize:
    def test_clip_bounds_and_nulls(self, spark):
        from pyspark.sql import Row

        from sparkprep.functions.numeric import winsorize

        rows = [Row(g="a", v=float(i)) for i in range(101)] + [
            Row(g="a", v=None)
        ]
        df = spark.createDataFrame(rows, "g: string, v: double")
        out = winsorize(df, "v", group_col="g", lower=0.1, upper=0.9)
        vals = [(r["v"], r["v_wins"]) for r in out.collect()]
        # exact percentiles of 0..100 at 0.1/0.9 are 10 and 90
        for v, w in vals:
            if v is None:
                assert w is None  # NULL never clips to the lower bound
            else:
                assert w == min(max(v, 10.0), 90.0)

    def test_global_no_group(self, spark):
        from pyspark.sql import Row

        from sparkprep.functions.numeric import winsorize

        df = spark.createDataFrame([Row(v=float(i)) for i in range(11)])
        out = winsorize(df, "v", lower=0.0, upper=0.5)
        assert max(r["v_wins"] for r in out.collect()) == 5.0
