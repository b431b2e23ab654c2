"""Variance-aware bench regression gate (scripts/bench_compare.py).

Pure-Python: exercises the comparison math on synthetic run records
shaped like this host's two documented noise modes (CLAUDE.md) — a
uniform ±30% between-run swing, and localized per-run clusters that
swap between runs of identical code — plus a genuine regression that
must survive both filters.
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from bench_compare import compare, load_side, run_median_ratio  # noqa: E402

BASE = {f"q{i}": 1.0 + 0.1 * i for i in range(20)}  # 1.0..2.9s


def test_uniform_slowdown_not_flagged():
    # every query 1.3x slower — the documented environmental mode
    cur = {q: s * 1.3 for q, s in BASE.items()}
    regressed, med = compare(BASE, cur)
    assert regressed == []
    assert 1.25 < med < 1.35


def test_localized_regression_flagged_through_uniform_noise():
    # a real 3x regression on one query, riding a uniform 1.3x run
    cur = {q: s * 1.3 for q, s in BASE.items()}
    cur["q10"] = BASE["q10"] * 3.0 * 1.3
    regressed, _ = compare(BASE, cur)
    assert [r[0] for r in regressed] == ["q10"]
    # normalized ratio reads ~3x, not ~3.9x
    assert 2.5 < regressed[0][3] < 3.5


def test_subsecond_jitter_below_absolute_floor():
    # 0.2s -> 0.55s is 2.75x but only ~0.35s of excess: scheduling noise
    base = dict(BASE, q_small=0.2)
    cur = dict(BASE, q_small=0.55)
    regressed, _ = compare(base, cur)
    assert regressed == []


def test_swapping_cluster_cleared_by_two_run_min(tmp_path):
    # the r8 signature: identical code, two runs, each inflating a
    # DIFFERENT cluster — min over the two current runs clears both
    run_a = dict(BASE, t_close=0.8, gopher=2.6)  # gopher inflated here
    run_b = dict(BASE, t_close=2.8, gopher=0.6)  # t_close inflated here
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps({"queries": run_a}))
    pb.write_text(json.dumps({"queries": run_b}))
    cur = load_side(f"{pa},{pb}")
    assert cur["t_close"] == 0.8 and cur["gopher"] == 0.6
    base = dict(BASE, t_close=0.7, gopher=0.5)
    regressed, _ = compare(base, cur)
    assert regressed == []


def test_regression_in_both_runs_survives_min(tmp_path):
    run_a = dict(BASE, q_real=6.0)
    run_b = dict(BASE, q_real=6.4)
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps({"queries": run_a}))
    pb.write_text(json.dumps({"queries": run_b}))
    cur = load_side(f"{pa},{pb}")
    base = dict(BASE, q_real=2.0)
    regressed, _ = compare(base, cur)
    assert [r[0] for r in regressed] == ["q_real"]


def test_median_fallback_on_tiny_overlap():
    assert run_median_ratio({"a": 1.0}, {"a": 9.0}, 0.5) == 1.0


def _run_cli(tmp_path, base_runs, cur_runs, *extra):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def side(runs, tag):
        paths = []
        for i, r in enumerate(runs):
            p = tmp_path / f"{tag}{i}.json"
            p.write_text(json.dumps({"queries": r}))
            paths.append(str(p))
        return ",".join(paths)

    return subprocess.run(
        [
            sys.executable,
            os.path.join(root, "scripts", "bench_compare.py"),
            side(base_runs, "b"),
            side(cur_runs, "c"),
            *extra,
        ],
        capture_output=True,
        text=True,
    )


def test_uniform_regression_fails_with_two_current_runs(tmp_path):
    """ADVICE r9: a uniform 1.3x slowdown reproducing in BOTH current
    runs' minima is a real regression — the median gate must fail it
    instead of normalizing it away."""
    slow = {q: s * 1.3 for q, s in BASE.items()}
    proc = _run_cli(tmp_path, [BASE], [slow, slow])
    assert proc.returncode == 1, proc.stdout
    assert "MEDIAN REGRESSION" in proc.stdout


def test_uniform_swing_single_run_warns_not_fails(tmp_path):
    # one run can't distinguish environment from a config regression —
    # the gate says re-run, it doesn't fail
    slow = {q: s * 1.3 for q, s in BASE.items()}
    proc = _run_cli(tmp_path, [BASE], [slow])
    assert proc.returncode == 0, proc.stdout
    assert "WARNING" in proc.stdout and "re-run" in proc.stdout


def test_clean_two_run_pair_passes_median_gate(tmp_path):
    cur = {q: s * 1.05 for q, s in BASE.items()}
    proc = _run_cli(tmp_path, [BASE], [cur, cur])
    assert proc.returncode == 0, proc.stdout
    assert "no regressions" in proc.stdout


@pytest.mark.parametrize(
    "pair,rc",
    [
        # the REAL r7->r8 records must pass with both r8 runs supplied
        (("BENCH_LOCAL_r06.json,BENCH_LOCAL_r07.json",
          "BENCH_LOCAL_r08.json,BENCH_LOCAL.json"), 0),
    ],
)
def test_cli_on_recorded_rounds(pair, rc):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = [",".join(os.path.join(root, f) for f in side.split(",")) for side in pair]
    if not all(os.path.exists(p) for side in paths for p in side.split(",")):
        pytest.skip("round records not present")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "bench_compare.py"), *paths],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == rc, proc.stdout + proc.stderr
