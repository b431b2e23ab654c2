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


def test_shared_frames_reset_between_passes(spark, sf_dir):
    """VERDICT r10 item 1: session-shared frame builds must be billed
    inside some query's timing on EVERY pass — run_queries clears the
    shared_frames cache at the start of each pass so best-of-N minima
    cannot read a previous pass's checkpoint leaf for free."""
    from sparkprep.queries import shared_frames

    builds = []

    def uses_shared(s, d):
        def build():
            builds.append(1)
            return s.read.parquet(f"{d}/region.parquet").select("r_name")

        return shared_frames.session_frame(s, "__test_reset__", d, build)

    try:
        timings, errors = bench.run_queries(
            spark, {"q_a": uses_shared, "q_b": uses_shared}, sf_dir, passes=2
        )
        assert not errors
        # one build per pass (q_b reuses within the pass), never one total
        assert len(builds) == 2
    finally:
        shared_frames.reset()


def test_compact_line_fits_driver_tail():
    """VERDICT r9 #1: the driver keeps the LAST 2,000 chars of stdout;
    the full 340-query map (~8.4 KB) made every BENCH_r*.json
    parsed:null. The final stdout line must stay under the tail and
    still parse to the contract shape."""
    import json

    # 400 queries with long names — worse than the real registry
    out = {
        "metric": "total_query_wall_sec",
        "value": 271.93,
        "unit": "sec",
        "queries": {f"query_with_a_long_name_{i:03d}": i * 0.01 for i in range(400)},
        "sf": 0.1,
        "errors": {f"broken_query_{i}": "X" * 500 for i in range(10)},
    }
    line = bench.compact_line(out)
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed["metric"] == "total_query_wall_sec"
    assert parsed["value"] == 271.93
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 400
    assert parsed["n_errors"] == 10
    assert len(parsed["queries"]) == 12
    # slowest-first selection: the max-time query must be present
    assert "query_with_a_long_name_399" in parsed["queries"]

    # no errors key when clean
    clean = {k: v for k, v in out.items() if k != "errors"}
    parsed2 = json.loads(bench.compact_line(clean))
    assert "errors" not in parsed2 and "n_errors" not in parsed2
