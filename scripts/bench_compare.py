"""Per-query bench regression gate: compare bench JSON outputs.

Usage:
    python scripts/bench_compare.py BASELINE[,BASELINE2,...] CURRENT[,CURRENT2,...] [--ratio 1.5]

Each side accepts a comma-separated list of run records; the gate
compares per-query MIN over each side's runs. Accepts either the raw
one-line bench.py output or the driver's BENCH_r{N}.json wrapper
(which stores the line under "tail"). Exits 1 on any regression so a
round can gate on it.

Variance-aware (VERDICT r8 #4). This host's bench noise has two modes,
both observed in the r7→r8 records:

1. UNIFORM between-run swing (±30%, e.g. 325.9s vs 313.5s back to
   back, ~1.3x on every untouched query in the bad run) — cancelled by
   normalizing each query's ratio by the RUN-LEVEL MEDIAN ratio over
   carried queries.
2. LOCALIZED per-run clusters that SWAP between runs of identical code
   (t_closeness 0.84s in one r8 run, 2.83s in the other; gopher_rules
   the mirror image) — the median can't cancel these; only a second
   run can. Passing TWO current runs (and/or several baselines) takes
   the per-query min on each side: noise is fast in at least one run,
   a real regression is slow in all of them. With a single current run
   the gate is conservative — treat a flag as "re-run and pass both
   files" before chasing it.

An absolute floor (--min-delta seconds of normalized excess) keeps
sub-second scheduling jitter below the relative test.

The median normalization has a blind spot (ADVICE r9): a genuine
UNIFORM regression (e.g. a session-config change slowing every query
~1.3x) normalizes out exactly like environmental drift. Environmental
swings shouldn't reproduce in two runs' per-query MINIMA, so when the
current side folds >= 2 runs and the run-median ratio still exceeds
--max-median, the gate FAILS on the median itself; with a single
current run it warns to re-run instead (one run can't distinguish the
two causes).
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


def load_side(spec: str) -> dict:
    """Load one side of the comparison: comma-separated run files,
    folded to per-query MIN over the files that contain the query."""
    out: dict = {}
    for path in spec.split(","):
        for q, s in load_queries(path).items():
            if q not in out or s < out[q]:
                out[q] = s
    return out


def run_median_ratio(base: dict, cur: dict, min_sec: float) -> float:
    """Median cur/base ratio over carried queries big enough to carry
    signal (>= min_sec in EITHER side) — the run-level environmental
    factor. Falls back to 1.0 when too few queries qualify."""
    ratios = sorted(
        cur[q] / base[q]
        for q in set(base) & set(cur)
        if base[q] > 0 and (base[q] >= min_sec or cur[q] >= min_sec)
    )
    if len(ratios) < 5:
        return 1.0
    mid = len(ratios) // 2
    if len(ratios) % 2:
        return ratios[mid]
    return 0.5 * (ratios[mid - 1] + ratios[mid])


def compare(
    base: dict,
    cur: dict,
    ratio: float = 1.5,
    min_sec: float = 0.5,
    min_delta: float = 0.5,
) -> tuple[list, float]:
    """Return ([(name, base_s, cur_s, normalized_ratio), ...], median).

    A query regresses when its environment-normalized ratio exceeds
    ``ratio`` AND its normalized excess over baseline exceeds
    ``min_delta`` seconds AND the current time clears ``min_sec``.
    """
    common = sorted(set(base) & set(cur))
    med = run_median_ratio(base, cur, min_sec)
    regressed = []
    for q in common:
        if base[q] <= 0:
            continue
        norm_cur = cur[q] / med
        norm_ratio = norm_cur / base[q]
        if (
            norm_ratio > ratio
            and cur[q] > min_sec
            and (norm_cur - base[q]) > min_delta
        ):
            regressed.append((q, base[q], cur[q], norm_ratio))
    return regressed, med


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline", help="run file, or comma-separated list (per-query min)")
    ap.add_argument("current", help="run file, or comma-separated list (per-query min)")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument("--min-delta", type=float, default=0.5)
    ap.add_argument(
        "--max-median",
        type=float,
        default=1.25,
        help="fail when the run-median ratio itself exceeds this bound "
        "and the current side folds >=2 runs (a uniform slowdown that "
        "survives two runs' minima is a real regression, not noise)",
    )
    args = ap.parse_args()

    base = load_side(args.baseline)
    cur = load_side(args.current)
    common = sorted(set(base) & set(cur))
    regressed, med = compare(
        base, cur, ratio=args.ratio, min_sec=args.min_sec, min_delta=args.min_delta
    )
    total_b = sum(base[q] for q in common)
    total_c = sum(cur[q] for q in common)
    print(
        f"common queries: {len(common)}  baseline {total_b:.2f}s -> current "
        f"{total_c:.2f}s ({total_c / total_b:.2f}x)  run-median ratio {med:.3f}x"
        " (normalized out)"
    )
    new = sorted(set(cur) - set(base))
    if new:
        print(f"new queries ({len(new)}): {', '.join(new)}")
    for q, b, c, r in sorted(regressed, key=lambda t: -t[3]):
        print(f"REGRESSED {q}: {b:.2f}s -> {c:.2f}s ({r:.2f}x after normalization)")
    rc = 1 if regressed else 0
    if med > args.max_median:
        if len(args.current.split(",")) >= 2:
            print(
                f"MEDIAN REGRESSION: run-median ratio {med:.3f}x > "
                f"{args.max_median}x across the current runs' minima — a "
                "uniform slowdown (session config? codegen?) that two-run "
                "min-folding did not cancel"
            )
            rc = 1
        else:
            print(
                f"WARNING: run-median ratio {med:.3f}x > {args.max_median}x "
                "on a SINGLE current run — re-run bench and pass both files "
                "before reading this as either noise or regression"
            )
    if rc == 0:
        print("no regressions")
    return rc


if __name__ == "__main__":
    sys.exit(main())
