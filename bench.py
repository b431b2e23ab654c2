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
    timings: dict[str, float] = {}
    # warm-up: JVM/codegen spin-up + parquet footer caches (counts are
    # metadata-only for parquet, so this reads no data); the loader
    # normalizes the events table's ts encoding (ns or µs) to TimestampType
    from sparkprep.queries import t as load_table

    for tbl in ("region", "nation", "customer", "orders", "lineitem",
                "events", "documents", "embeddings"):
        load_table(spark, sf_dir, tbl).count()
    # one throwaway materialized job so the first TIMED query doesn't
    # absorb scheduler/codegen/noop-sink spin-up (~0.6s measured)
    materialize(load_table(spark, sf_dir, "documents").groupBy("lang").count())
    # touch the big payload columns (documents.text, embeddings.vector):
    # whichever query the registry rotation puts first otherwise absorbs
    # the first-read/decode cost and shows a phantom cross-round
    # regression (token_modes 0.41s -> 0.81s observed after rotation)
    from pyspark.sql import functions as F

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

    # Per-query fault isolation: one broken query must never erase the
    # round's performance evidence (round 2 lost ALL timings to a single
    # AnalysisException). Failures land in "errors"; the other timings
    # survive and the process still exits non-zero so the failure is
    # loud, not silent.
    total = 0.0
    errors: dict[str, str] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            materialize(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — isolate per query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: query {name!r} FAILED: {errors[name]}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    out = {
        "metric": "total_query_wall_sec",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()
    # Exit 0 even with per-query errors: a non-zero rc makes the driver
    # discard the whole JSON line (round 2 lost every timing that way).
    # The "errors" key is the loud signal; the timings must survive.


if __name__ == "__main__":
    main()
