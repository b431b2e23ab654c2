"""bench.py fault isolation (VERDICT r2 #3): a deliberately broken query
must not erase the other queries' timings — round 2 lost its entire
sf0.1 evidence to one AnalysisException."""

import bench
from pyspark.sql import functions as F


def test_broken_query_does_not_erase_timings(spark, sf_dir):
    def ok(s, d):
        return s.read.parquet(f"{d}/region.parquet").groupBy("r_name").count()

    def broken(s, d):
        return s.read.parquet(f"{d}/region.parquet").select(
            F.col("no_such_column")
        )

    def explodes_late(s, d):
        # ANSI divide-by-zero only surfaces at execution, not analysis
        return s.read.parquet(f"{d}/region.parquet").select(
            (F.lit(1) / F.lit(0)).alias("boom")
        )

    timings, errors = bench.run_queries(
        spark,
        {"q_ok": ok, "q_broken": broken, "q_late": explodes_late, "q_ok2": ok},
        sf_dir,
        passes=2,
    )
    assert set(timings) == {"q_ok", "q_ok2"}
    assert all(t > 0 for t in timings.values())
    assert set(errors) == {"q_broken", "q_late"}
    assert "AnalysisException" in errors["q_broken"] or "UNRESOLVED" in errors["q_broken"]
