"""Benchmark harness: runs every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Results are fully materialized through the JVM-side noop sink (so
projection pruning can't fake a fast run), not collect()'d to Python.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkprep.session import build_session  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_queries(
    spark, queries: dict, sf_dir: str, passes: int = 2
) -> tuple[dict, dict]:
    """Best-of-N timing loop with per-query fault isolation: one broken
    query must never erase the round's performance evidence (round 2
    lost ALL timings to a single AnalysisException). Failures land in
    the returned errors dict; the other timings survive. Tested by
    tests/test_bench_isolation.py."""
    from sparkprep.queries import shared_frames

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _pass in range(passes):
        # Bill each session-shared frame's build inside the FIRST
        # consumer's timing on EVERY pass: without this clear, pass-2
        # minima read the pass-1 checkpoint leaf and the build cost is
        # charged to no query at all (VERDICT r10 item 1).
        shared_frames.reset()
        for name, fn in queries.items():
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                materialize(fn(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench: query {name!r} FAILED: {errors[name]}", file=sys.stderr)
                continue
            dt = round(time.perf_counter() - t0, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
    return timings, errors


def compact_line(out: dict, max_len: int = 1800) -> str:
    """The ONE stdout JSON line, sized for the driver's 2,000-char tail.

    The full per-query map is ~8.4 KB, which left BENCH_r01..r09.json all
    parsed:null; here "queries" carries only the slowest entries (what a
    plan audit asks about first), n_queries records the registry size,
    and BENCH_LOCAL.json keeps the full map. Tested by
    tests/test_bench_isolation.py::test_compact_line_fits_driver_tail.
    """
    compact = dict(out)
    timings = out.get("queries", {})
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:12]
    compact["queries"] = dict(slowest)
    compact["n_queries"] = len(timings)
    errors = out.get("errors")
    if errors:
        compact["errors"] = {k: v[:80] for k, v in list(errors.items())[:5]}
        compact["n_errors"] = len(errors)
    line = json.dumps(compact)
    assert len(line) < max_len, f"compact bench line too long: {len(line)}"
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = build_session(app_name="sparkprep-bench")
    spark.sparkContext.setLogLevel("WARN")

    queries = entry_mod.queries()
    # warm-up (NON-FATAL — a warm-up failure must degrade to cold first
    # queries, never kill the run): JVM/codegen spin-up + parquet footer
    # caches, then the big payload columns (documents.text,
    # embeddings.vector, events ts/props). Whichever query the registry
    # rotation puts first otherwise absorbs the first-read/decode cost
    # and shows a phantom cross-round regression (token_modes
    # 0.41s->0.81s, log_parse 1.5s->4.5s observed after rotations).
    from pyspark.sql import functions as F

    from sparkprep.queries import t as load_table

    try:
        for tbl in ("region", "nation", "customer", "orders", "lineitem",
                    "events", "documents", "embeddings"):
            load_table(spark, sf_dir, tbl).count()
        # one throwaway materialized job so the first TIMED query doesn't
        # absorb scheduler/codegen/noop-sink spin-up (~0.6s measured)
        materialize(load_table(spark, sf_dir, "documents").groupBy("lang").count())
        materialize(
            load_table(spark, sf_dir, "documents").select(
                F.sum(F.length("text")).alias("b")
            )
        )
        materialize(
            load_table(spark, sf_dir, "embeddings").select(
                F.sum(F.size("embedding")).alias("n")
            )
        )
        materialize(
            load_table(spark, sf_dir, "events").select(
                # avg, not sum: summing epoch-µs over ~1e5 rows overflows
                # long under ANSI mode
                F.avg(F.unix_micros("ts")).alias("t"),
                F.sum(F.length("props")).alias("p"),
                F.sum("value").alias("v"),
            )
        )
        # fact-table payloads (counts above were metadata-only): the
        # rotation's first timed query otherwise pays the cold decode
        # (stratified_sample on orders: 0.75s first-position vs 0.36s warm)
        materialize(
            load_table(spark, sf_dir, "orders").select(
                F.sum("o_totalprice").alias("a"),
                F.sum(F.length("o_orderstatus")).alias("b"),
            )
        )
        materialize(
            load_table(spark, sf_dir, "lineitem").select(
                F.sum("l_extendedprice").alias("a"),
                F.sum("l_quantity").alias("b"),
            )
        )

        # Arrow/Python worker-daemon spin-up (~6s cold, measured):
        # whichever rotation-ordered query first touches
        # mapInPandas/pandas_udf otherwise absorbs it and shows a
        # phantom cross-round regression (media_features 0.40s→1.33s
        # after the round-9 rotation reshuffled the registry order)
        def _id_batches(it):
            yield from it

        materialize(spark.range(8).mapInPandas(_id_batches, "id bigint"))
    except Exception as exc:  # noqa: BLE001
        print(f"bench: warm-up failed (continuing cold): {exc}", file=sys.stderr)

    # Two passes, min per query: single-pass timings on local[32] showed
    # 2-5x run-to-run spread on sub-2s queries (scheduler/GC noise),
    # flagging phantom regressions; best-of-2 is stable and the second
    # pass runs against warmed page/footers caches like production would.
    timings, errors = run_queries(spark, queries, sf_dir, passes=2)
    total = sum(timings.values())

    out = {
        "metric": "total_query_wall_sec",  # sum of per-query best-of-2
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if errors:
        out["errors"] = errors
    # Lossless archival copy (VERDICT r5 #6): the full per-query map is
    # ~8.4 KB — far past the driver's 2,000-char stdout tail, which left
    # BENCH_r01..r09.json all with parsed:null (VERDICT r9 #1). The full
    # JSON lives ONLY here; the round snapshot (BENCH_LOCAL_r{N}.json)
    # is committed per round for cross-round bench_compare gating.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
            fh.write(json.dumps(out) + "\n")
    except OSError as exc:
        print(f"bench: BENCH_LOCAL.json write failed: {exc}", file=sys.stderr)
    print(compact_line(out))
    spark.stop()
    # Exit 0 even with per-query errors: a non-zero rc makes the driver
    # discard the whole JSON line (round 2 lost every timing that way).
    # The "errors" key is the loud signal; the timings must survive.


if __name__ == "__main__":
    main()
