"""Per-query bench regression gate: compare two bench JSON outputs.

Usage:
    python scripts/bench_compare.py BENCH_r01.json /tmp/bench_now.json [--ratio 1.5]

Accepts either the raw one-line bench.py output or the driver's
BENCH_r{N}.json wrapper (which stores the line under "tail"). Exits 1
if any common query regressed by more than --ratio (queries faster
than 0.5s are ignored — scheduling noise dominates there), so a round
can gate on it.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return doc["queries"]
    if "tail" in doc:  # driver wrapper: tail is the (possibly clipped) line
        tail = doc["tail"].strip()
        if not tail.startswith("{"):
            tail = "{" + tail
        try:
            return json.loads(tail)["queries"]
        except (json.JSONDecodeError, KeyError):
            # the driver clips the FRONT of the line, so the fragment may
            # start mid-queries-object and carry trailing wrapper keys —
            # fall back to scraping the "name": float pairs, which is all
            # the comparison needs (sf/metric keys don't match the regex
            # because their values aren't bare numbers... except sf; drop
            # known wrapper keys explicitly)
            import re

            pairs = re.findall(r'"([^"]+)":\s*(-?\d+(?:\.\d+)?)', tail)
            return {
                k: float(v)
                for k, v in pairs
                if k not in {"sf", "value", "n", "rc", "cpus"}
            }
    raise SystemExit(f"{path}: no 'queries' or 'tail' field")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    args = ap.parse_args()

    base = load_queries(args.baseline)
    cur = load_queries(args.current)
    common = sorted(set(base) & set(cur))
    regressed = []
    for q in common:
        if cur[q] > args.ratio * base[q] and cur[q] > args.min_sec:
            regressed.append((q, base[q], cur[q], cur[q] / base[q]))
    total_b = sum(base[q] for q in common)
    total_c = sum(cur[q] for q in common)
    print(
        f"common queries: {len(common)}  baseline {total_b:.2f}s -> current "
        f"{total_c:.2f}s ({total_c / total_b:.2f}x)"
    )
    new = sorted(set(cur) - set(base))
    if new:
        print(f"new queries ({len(new)}): {', '.join(new)}")
    for q, b, c, r in sorted(regressed, key=lambda t: -t[3]):
        print(f"REGRESSED {q}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
    if regressed:
        return 1
    print("no regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
