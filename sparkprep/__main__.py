"""CLI front-end: list and run registry queries against a testdata dir.

    python -m sparkprep list [pattern]
    python -m sparkprep run <query> [--sf-dir DIR] [--show N]
                                    [--metrics] [--explain]
    python -m sparkprep oracle <query>          # print the DuckDB mirror

Runs on a tuned local session (`sparkprep.session.build_session`); the
correctness driver uses its own vanilla session via ``__spark_entry__``
— this entry point is for humans poking at operators.
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m sparkprep")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("pattern", nargs="?", default="*")

    p_run = sub.add_parser("run", help="run a query")
    p_run.add_argument("query")
    p_run.add_argument(
        "--sf-dir", default=os.environ.get("SPARKPREP_SF_DIR", "/root/testdata/sf0.01")
    )
    p_run.add_argument("--show", type=int, default=10)
    p_run.add_argument("--metrics", action="store_true",
                       help="print plan_metrics cost attribution")
    p_run.add_argument("--explain", action="store_true",
                       help="print the formatted physical plan")

    p_or = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_or.add_argument("query")

    args = ap.parse_args(argv)
    from sparkprep.queries import registry

    queries, oracles = registry()

    if args.cmd == "list":
        for name in sorted(queries):
            tag = "" if name in oracles else "  (rows-only)"
            if fnmatch.fnmatch(name, args.pattern):
                print(f"{name}{tag}")
        return 0

    if args.query not in queries:
        near = [n for n in queries if args.query in n]
        print(f"unknown query {args.query!r}" + (f"; near: {near}" if near else ""),
              file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        if args.query not in oracles:
            print(f"{args.query} is rows-only (no SQL oracle)", file=sys.stderr)
            return 1
        print(oracles[args.query].strip())
        return 0

    from sparkprep.session import build_session

    spark = build_session(app_name=f"sparkprep-cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    rows = df.collect()
    wall = time.perf_counter() - t0
    for r in rows[: args.show]:
        print(r)
    if len(rows) > args.show:
        print(f"... ({len(rows) - args.show} more rows)")
    print(f"{args.query}: {len(rows)} rows in {wall:.2f}s @ {args.sf_dir}")
    if args.metrics:
        from sparkprep.operators.physical import plan_metrics

        for k, v in plan_metrics(df).items():
            print(f"  {k}: {v}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
