"""Property-based tests for the round-6 rank statistics: hypothesis
drives random small integer samples through the distributed operators
and checks them against brute-force references (mid-rank ties, tie
corrections). Example counts kept low — every example is a Spark job.
"""

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkprep.operators.stats import (
    kruskal_wallis,
    mann_whitney,
    wilcoxon_signed_rank,
)

_vals = st.integers(min_value=0, max_value=8)  # tight range forces ties
_SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mid_ranks(values):
    cnt = Counter(values)
    less, cum = {}, 0
    for v in sorted(cnt):
        less[v] = cum
        cum += cnt[v]
    return {v: less[v] + (cnt[v] + 1) / 2 for v in cnt}


@_SET
@given(
    st.lists(_vals, min_size=2, max_size=15),
    st.lists(_vals, min_size=2, max_size=15),
)
def test_mann_whitney_matches_bruteforce(spark, a, b):
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    got = mann_whitney(df, "v", "g", "A", "B").collect()[0]
    pooled = a + b
    r = _mid_ranks(pooled)
    na, nb, n = len(a), len(b), len(pooled)
    u = sum(r[v] for v in a) - na * (na + 1) / 2
    assert got["u_a"] == round(u, 6)
    t = sum(c**3 - c for c in Counter(pooled).values())
    var = na * nb / 12 * ((n + 1) - t / (n * (n - 1)))
    if var <= 0:
        assert got["z"] is None
    else:
        z = (u - na * nb / 2) / math.sqrt(var)
        assert abs(got["z"] - z) < 1e-6


@_SET
@given(
    st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), _vals),
        min_size=4,
        max_size=30,
    ).filter(lambda rows: len({g for g, _ in rows}) >= 2)
)
def test_kruskal_wallis_matches_bruteforce(spark, rows):
    df = spark.createDataFrame([(v, g) for g, v in rows], ["v", "g"])
    got = kruskal_wallis(df, "v", "g").collect()[0]
    pooled = [v for _, v in rows]
    r = _mid_ranks(pooled)
    n = len(pooled)
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    assert got["df"] == len(groups) - 1 and got["n_rows"] == n
    h = 12 / (n * (n + 1)) * sum(
        sum(r[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    t = sum(c**3 - c for c in Counter(pooled).values())
    tie = 1 - t / (n**3 - n)
    if tie <= 0:
        assert got["h_stat"] is None
    else:
        assert abs(got["h_stat"] - h / tie) < 1e-5


@_SET
@given(
    st.lists(st.integers(min_value=-6, max_value=6), min_size=2, max_size=25)
)
def test_signed_rank_matches_bruteforce(spark, diffs):
    df = spark.createDataFrame([(d,) for d in diffs], ["d"])
    out = wilcoxon_signed_rank(df, "d").collect()
    nz = [d for d in diffs if d != 0]
    if not nz:
        assert out[0]["n_nonzero"] is None or out[0]["n_nonzero"] == 0
        return
    got = out[0]
    r = _mid_ranks([abs(d) for d in nz])
    n = len(nz)
    w_plus = sum(r[abs(d)] for d in nz if d > 0)
    assert got["n_nonzero"] == n
    assert got["w_plus"] == round(w_plus, 6)
    t = sum(c**3 - c for c in Counter(abs(d) for d in nz).values())
    var = n * (n + 1) * (2 * n + 1) / 24 - t / 48
    if var <= 0:
        assert got["z"] is None
    else:
        z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
        assert abs(got["z"] - z) < 1e-6
