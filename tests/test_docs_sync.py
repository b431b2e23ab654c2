"""Doc-totals drift gate: COVERAGE.md / README.md registry counts must
match the live registry (round-7 verdict item #2 — the totals went stale
twice when commits updated one doc but not the other)."""
import os
import re

from sparkprep.queries import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(ROOT, name)) as fh:
        return fh.read()


def test_coverage_totals_match_registry():
    q, o = registry()
    text = _read("COVERAGE.md")
    m = re.search(
        r"Totals: (\d+) registered queries \((\d+) oracle-checked, (\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md totals line missing or reworded"
    assert int(m.group(1)) == len(q), f"COVERAGE.md says {m.group(1)} queries, registry has {len(q)}"
    assert int(m.group(2)) == len(o), f"COVERAGE.md says {m.group(2)} oracled, registry has {len(o)}"
    assert int(m.group(3)) == len(q) - len(o)


def test_readme_totals_match_registry():
    q, o = registry()
    text = _read("README.md")
    m = re.search(r"(\d+)-query registry — (\d+) oracle-checked, (\d+) rows-only", text)
    assert m, "README.md registry-totals phrase missing or reworded"
    assert int(m.group(1)) == len(q)
    assert int(m.group(2)) == len(o)
    assert int(m.group(3)) == len(q) - len(o)


def test_scale_smoke_revenue_panel_names_registered():
    # the revenue overflow panel drives REGISTERED queries by name; a
    # rename in the registry must fail here, not silently skip the
    # overflow coverage (scripts/scale_smoke.py revenue)
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "scale_smoke", os.path.join(root, "scripts", "scale_smoke.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q, _ = registry()
    missing = sorted(set(mod._REVENUE_QUERIES) - set(q))
    assert not missing, f"scale_smoke revenue panel names not in registry: {missing}"
