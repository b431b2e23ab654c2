"""Constraint-suite + PSI drift semantics the oracle can't see:
planted-value metric math, pass/fail wiring, approx-vs-exact
uniqueness, PSI vs a numpy brute force, zero-drift identity."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkprep.operators import expect as ex


@pytest.fixture()
def frame(spark):
    rows = [
        Row(x=float(i), cat="a" if i % 2 == 0 else "b", maybe=float(i) if i % 5 != 0 else None)
        for i in range(100)
    ]
    return spark.createDataFrame(rows)


class TestSuite:
    def test_metric_values_exact(self, spark, frame):
        suite = ex.Suite(
            checks=[
                ex.completeness("maybe"),          # 80/100
                ex.in_range("x", 0, 49),           # 50/100
                ex.in_set("cat", ["a"]),           # 50/100
                ex.matches("cat", "^a$"),          # 50/100
                ex.non_negative("x"),              # 0 violations
                ex.mean_between("x", 49.0, 50.0),  # mean = 49.5
                ex.size_between(100, 100),
            ]
        )
        got = {r["check"]: r for r in suite.report_df(frame).collect()}
        assert got["completeness(maybe)"]["metric"] == pytest.approx(0.8)
        assert got["in_range(x)"]["metric"] == pytest.approx(0.5)
        assert got["in_set(cat)"]["metric"] == pytest.approx(0.5)
        assert got["matches(cat)"]["metric"] == pytest.approx(0.5)
        assert got["non_negative(x)"]["metric"] == 0.0
        assert got["mean(x)"]["metric"] == pytest.approx(49.5)
        assert got["size"]["metric"] == 100.0

    def test_pass_fail_wiring(self, spark, frame):
        suite = ex.Suite(
            checks=[
                ex.completeness("maybe", 0.75),   # 0.8 >= 0.75 -> pass
                ex.completeness("x", 1.0),        # pass
                ex.in_range("x", 0, 49, 0.9),     # 0.5 < 0.9 -> fail
                ex.size_between(1000),            # fail
            ]
        )
        res = suite.run(frame)
        assert res["checks"]["completeness(maybe)"]["passed"]
        assert res["checks"]["completeness(x)"]["passed"]
        assert not res["checks"]["in_range(x)"]["passed"]
        assert not res["checks"]["size"]["passed"]
        assert not res["passed"]

    def test_empty_suite_raises(self, spark, frame):
        with pytest.raises(ValueError):
            ex.Suite(checks=[]).report_df(frame)

    def test_empty_frame_fails_not_throws(self, spark):
        """ANSI mode: the completeness denominator must be guarded or
        an empty slice crashes the gate with DIVIDE_BY_ZERO instead of
        failing the check."""
        empty = spark.createDataFrame([], "x double")
        res = ex.Suite(
            [ex.completeness("x"), ex.in_range("x", 0, 1), ex.size_between(1)]
        ).run(empty)
        assert not res["passed"]
        assert res["checks"]["completeness(x)"]["metric"] == 0.0

    def test_null_metric_is_failed_not_null(self, spark):
        """An unmeasurable metric (all-NULL column -> avg NULL) must
        read passed=False — passed==false filters drive alerting."""
        df = spark.createDataFrame([Row(x=None)], "x double")
        rows = ex.Suite([ex.mean_between("x", 0, 1)]).report_df(df).collect()
        assert rows[0]["metric"] is None
        assert rows[0]["passed"] is False

    def test_duplicate_check_names_raise_unless_overridden(self, spark, frame):
        with pytest.raises(ValueError, match="duplicate check names"):
            ex.Suite(
                [ex.matches("cat", "^a$"), ex.matches("cat", "^b$")]
            ).report_df(frame)
        # explicit name= overrides disambiguate
        res = ex.Suite(
            [
                ex.matches("cat", "^a$", name="matches(cat,a)"),
                ex.matches("cat", "^b$", name="matches(cat,b)"),
            ]
        ).run(frame)
        assert set(res["checks"]) == {"matches(cat,a)", "matches(cat,b)"}

    def test_uniqueness_exact_and_approx(self, spark):
        df = spark.createDataFrame([Row(k=i % 10) for i in range(100)])
        exact = ex.Suite([ex.uniqueness("k", exact=True)]).report_df(df).collect()[0]
        assert exact["metric"] == pytest.approx(0.1)
        approx = ex.Suite([ex.uniqueness("k")]).report_df(df).collect()[0]
        # HLL++ at default rsd is exact-ish at cardinality 10
        assert approx["metric"] == pytest.approx(0.1, rel=0.1)

    def test_single_pass_plan(self, spark, frame):
        """The whole suite is ONE aggregate over the data: at most the
        one final-agg exchange; no per-check re-execution of the scan."""
        suite = ex.Suite(
            checks=[ex.completeness("x"), ex.in_range("x", 0, 10), ex.mean_between("x", 0, 100)]
        )
        plan = suite.report_df(frame)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan") <= 1
        assert plan.count("Exchange") <= 1


class TestPsi:
    def _psi_numpy(self, before, after, edges, eps=1e-6):
        import numpy as np

        def shares(vals):
            b = np.zeros(len(edges) - 1)
            for v in vals:
                i = 0
                for j, e in enumerate(edges[1:-1], start=1):
                    if v >= e:
                        i = j
                b[i] += 1
            return b / b.sum()

        p, q = shares(after), shares(before)
        p, q = np.maximum(p, eps), np.maximum(q, eps)
        return float(((p - q) * np.log(p / q)).sum())

    def test_matches_numpy_bruteforce(self, spark):
        import random

        rng = random.Random(7)
        before = [rng.uniform(0, 100) for _ in range(500)]
        after = [rng.uniform(20, 120) for _ in range(500)]  # shifted
        edges = [0.0, 25.0, 50.0, 75.0, 100.0]
        bdf = spark.createDataFrame([Row(v=v) for v in before])
        adf = spark.createDataFrame([Row(v=v) for v in after])
        got = ex.psi_drift(bdf, adf, "v", edges).collect()[0]
        want = self._psi_numpy(before, after, edges)
        assert got["psi"] == pytest.approx(want, abs=5e-4)  # per-term round(4)
        assert got["n_bins"] == 4
        assert got["psi"] > 0.1  # shifted distribution reads as drift

    def test_cohort_variant_equals_two_frame_variant(self, spark):
        """psi_bins_cohorts (one scan, one keyed exchange) must produce
        bit-identical rows to psi_bins on the split frames."""
        rows = [Row(v=float(i % 97), grp=i % 3 == 0) for i in range(300)]
        df = spark.createDataFrame(rows)
        edges = [0.0, 20.0, 40.0, 60.0, 100.0]
        a = ex.psi_bins(
            df.filter(~F.col("grp")), df.filter(F.col("grp")), "v", edges
        ).collect()
        b = ex.psi_bins_cohorts(df, F.col("grp"), "v", edges).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_zero_drift_on_identical(self, spark):
        df = spark.createDataFrame([Row(v=float(i % 50)) for i in range(200)])
        got = ex.psi_drift(df, df, "v", [0.0, 10.0, 20.0, 30.0, 50.0]).collect()[0]
        assert got["psi"] == 0.0

    def test_empty_bin_smoothed_not_inf(self, spark):
        b = spark.createDataFrame([Row(v=5.0)] * 50)
        a = spark.createDataFrame([Row(v=35.0)] * 50)
        rows = ex.psi_bins(b, a, "v", [0.0, 10.0, 20.0, 30.0, 40.0]).collect()
        for r in rows:
            assert math.isfinite(r["psi_term"])
        # disjoint occupancy -> large but finite PSI
        total = sum(r["psi_term"] for r in rows)
        assert total > 1.0

    def test_nulls_excluded_and_tails_clamped(self, spark):
        b = spark.createDataFrame(
            [Row(v=None), Row(v=-100.0), Row(v=999.0), Row(v=15.0)]
        )
        rows = {r["bin_id"]: r for r in ex.psi_bins(b, b, "v", [0.0, 10.0, 20.0, 30.0]).collect()}
        # 3 non-null values: -100 -> bin 0, 15 -> bin 1, 999 -> bin 2
        assert rows[0]["share_before"] == pytest.approx(1 / 3, abs=1e-6)
        assert rows[1]["share_before"] == pytest.approx(1 / 3, abs=1e-6)
        assert rows[2]["share_before"] == pytest.approx(1 / 3, abs=1e-6)

    def test_bad_breakpoints_raise(self, spark):
        df = spark.createDataFrame([Row(v=1.0)])
        with pytest.raises(ValueError):
            ex.psi_bins(df, df, "v", [0.0, 10.0, 5.0])
        with pytest.raises(ValueError):
            ex.psi_bins(df, df, "v", [0.0, 10.0, 10.0])
        with pytest.raises(ValueError):  # degenerate: no bins at all
            ex.psi_bins(df, df, "v", [5.0])

    def test_reference_scoring_one_row_with_counts(self, spark):
        ref_src = spark.createDataFrame([Row(v=float(i % 40)) for i in range(200)])
        edges = [0.0, 10.0, 20.0, 30.0, 40.0]
        ref = ex.reference_shares(ref_src, "v", edges)
        batch = spark.createDataFrame(
            [Row(v=float(i % 40)) for i in range(120)] + [Row(v=None)] * 7
        )
        row = ex.psi_against_reference(batch, "v", edges, ref).collect()[0]
        assert row["rows"] == 127  # NULLs counted, one job
        assert row["psi"] == 0.0  # identical distribution
        # empty batch: rows=0 and psi None (NOT maximal drift)
        empty = spark.createDataFrame([], "v double")
        row = ex.psi_against_reference(empty, "v", edges, ref).collect()[0]
        assert row["rows"] == 0 and row["psi"] is None


def test_psi_multi_matches_single_feature_psi(spark):
    """The panel must agree feature-for-feature with psi_drift (whose
    math is numpy-pinned elsewhere in this file)."""
    from pyspark.sql import Row

    from sparkprep.operators import expect as ex

    before = spark.createDataFrame(
        [Row(x=float(i % 10), y=float(i % 7)) for i in range(200)],
        "x double, y double",
    )
    after = spark.createDataFrame(
        [Row(x=float((i % 10) + (i % 3)), y=float(i % 5)) for i in range(150)],
        "x double, y double",
    )
    specs = {"x": [0.0, 3.0, 6.0, 12.0], "y": [0.0, 2.0, 4.0, 8.0]}
    panel = {
        r.feature: (r.psi, r.n_bins)
        for r in ex.psi_multi(before, after, specs).collect()
    }
    for c, edges in specs.items():
        single = ex.psi_drift(before, after, c, edges).collect()[0]
        assert panel[c][1] == single.n_bins
        assert panel[c][0] == pytest.approx(single.psi, abs=2e-4)


def test_psi_multi_nulls_excluded_per_feature(spark):
    from pyspark.sql import Row

    from sparkprep.operators import expect as ex

    before = spark.createDataFrame(
        [Row(x=1.0), Row(x=5.0), Row(x=None)], "x double"
    )
    after = spark.createDataFrame(
        [Row(x=1.0), Row(x=5.0), Row(x=None), Row(x=None)], "x double"
    )
    r = ex.psi_multi(before, after, {"x": [0.0, 3.0, 9.0]}).collect()[0]
    # identical non-null distributions -> zero drift despite differing
    # NULL volumes
    assert r.psi == 0.0 and r.n_bins == 2
