"""RRF fusion semantics beyond the oracle: exact fusion math on
planted ranks, top-k boundedness/tie-breaks, n-leg generalization."""

import pytest
from pyspark.sql import Row

from sparkprep.operators import similarity as sim


class TestTopkRanked:
    def test_bounded_dense_and_tiebroken(self, spark):
        rows = [Row(id=i, s=float(i % 5)) for i in range(100)]
        out = sim.topk_ranked(spark.createDataFrame(rows), "s", "id", 10).collect()
        assert len(out) == 10
        assert sorted(r["rank"] for r in out) == list(range(1, 11))
        # score 4.0 rows are ids 4,9,14,... -> id-asc tie-break
        by_rank = {r["rank"]: r["id"] for r in out}
        assert by_rank[1] == 4 and by_rank[2] == 9

    def test_take_ordered_plan(self, spark):
        rows = [Row(id=i, s=float(i)) for i in range(100)]
        df = sim.topk_ranked(spark.createDataFrame(rows), "s", "id", 5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestRrfFuse:
    def _leg(self, spark, pairs):
        return spark.createDataFrame([Row(id=i, rank=r) for i, r in pairs])

    def test_exact_math_two_legs(self, spark):
        a = self._leg(spark, [(1, 1), (2, 2)])
        b = self._leg(spark, [(2, 1), (3, 2)])
        got = {r["id"]: r for r in sim.rrf_fuse([a, b], "id", k=60).collect()}
        assert got[2]["rrf"] == pytest.approx(round(1 / 61 + 1 / 62, 6))
        assert got[1]["rrf"] == pytest.approx(round(1 / 61, 6))
        assert got[3]["rrf"] == pytest.approx(round(1 / 62, 6))
        # consensus doc 2 outranks either single-leg rank-1/2 doc
        assert got[2]["rrf_rank"] == 1
        assert got[1]["rrf_rank"] == 2  # 1/61 > 1/62
        assert got[3]["rrf_rank"] == 3

    def test_three_legs_and_tiebreak(self, spark):
        a = self._leg(spark, [(1, 1)])
        b = self._leg(spark, [(2, 1)])
        c = self._leg(spark, [(3, 1)])
        out = sim.rrf_fuse([a, b, c], "id", k=60).collect()
        # identical scores -> id-asc final tie-break
        assert [(r["id"], r["rrf_rank"]) for r in sorted(out, key=lambda r: r["rrf_rank"])] == [
            (1, 1), (2, 2), (3, 3)
        ]

    def test_empty_legs_raise(self, spark):
        with pytest.raises(ValueError):
            sim.rrf_fuse([], "id")
