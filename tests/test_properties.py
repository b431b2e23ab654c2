"""Property-based tests (hypothesis): operator invariants that a
single golden fixture can't pin down. Example counts are kept low
(10-20) because every example is a Spark job; lists of values are
batched into one DataFrame per example.
"""

import math

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkprep.functions import numeric, strings
from sparkprep.operators import text as tx

_texts = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    max_size=80,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e6, max_value=1e6),
                min_size=2, max_size=30))
def test_minmax_normalize_bounds(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], ["x"])
    out = numeric.minmax_normalize(df, "x").collect()
    lo, hi = min(xs), max(xs)
    for r in out:
        if lo == hi:
            assert r.x is None  # degenerate column -> null, documented
        else:
            assert -1e-9 <= r.x <= 1 + 1e-9


@settings(max_examples=15, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=10))
def test_token_count_matches_java_whitespace_contract(spark, texts):
    # the operator's contract is Java \s+ = [ \t\n\x0b\f\r] — NOT Python
    # str.split(), which also splits on \x1c-\x1f/\x85 (hypothesis found
    # exactly that divergence)
    import re

    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = [r.n for r in df.select(tx.token_count("t").alias("n")).collect()]
    expected = [
        len([x for x in re.split(r"[ \t\n\x0b\f\r]+", t) if x]) for t in texts
    ]
    assert got == expected


@settings(max_examples=15, deadline=None)
@given(_texts)
def test_strip_trailing_percent_is_rstrip(spark, s):
    df = spark.createDataFrame([(s,)], ["c"])
    got = df.select(strings.strip_trailing_percent("c").alias("o")).collect()[0].o
    assert got == s.rstrip("%")


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e4, max_value=1e4),
                min_size=4, max_size=40))
def test_quantile_bucket_monotone(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], ["x"])
    rows = numeric.quantile_bucket(df, "x", out_col="b").collect()
    by_x = sorted((r.x, r.b) for r in rows)
    buckets = [b for _, b in by_x]
    # bucket id must be monotone in x and span at most 0..len(probs)
    assert buckets == sorted(buckets)
    assert all(0 <= b <= 3 for b in buckets)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=1, max_size=8))
def test_normalize_text_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    once = df.select(tx.normalize_text("t").alias("t"))
    twice = once.select(tx.normalize_text("t").alias("t"))
    assert [r.t for r in once.collect()] == [r.t for r in twice.collect()]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e4, max_value=1e4),
            min_size=2, max_size=16,
        ),
        min_size=1, max_size=6,
    )
)
def test_quantize_error_bound_property(spark, vecs):
    from sparkprep.operators import quantize

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id int, v array<double>",
    )
    rows = quantize.reconstruction_stats(df, "v", levels=255).collect()
    for r, v in zip(sorted(rows, key=lambda r: r.id), vecs):
        span = max(v) - min(v)
        # per-element reconstruction error bound: span / (2 * levels)
        assert r.mean_abs_err <= span / (2 * 255) + 1e-9
        assert all(0 <= c <= 255 for c in r.codes)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1, max_size=12,
    )
)
def test_morton_key_deinterleaves_exactly(spark, pts):
    from sparkprep.functions import zorder

    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in pts], "x long, y long"
    )
    rows = zorder.add_zorder_key(df, ["x", "y"], bits=16).collect()
    for r in rows:
        # de-interleave: even bits -> x, odd bits -> y (bit-exact inverse)
        x = sum(((r.zkey >> (2 * i)) & 1) << i for i in range(16))
        y = sum(((r.zkey >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x, y) == (r.x, r.y)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_dedup_spans_invariants(spark, texts):
    """Global chunk conservation: kept chunks across the corpus ==
    distinct chunk contents; every doc's surviving text is an ordered
    subsequence of its original chunks."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = tx.dedup_spans(df, "text", "doc_id", width=3).collect()
    chunks_of = {}
    for i, t in enumerate(texts):
        tk = t.split()
        chunks_of[i] = [" ".join(tk[j : j + 3]) for j in range(0, len(tk), 3)]
    distinct = set(c for cs in chunks_of.values() for c in cs)
    assert sum(r["n_kept"] for r in out) == len(distinct)
    for r in out:
        kept = r["dedup_text"].split()
        orig = chunks_of[r["doc_id"]]
        # kept text = concatenation of a subsequence of original chunks
        rebuilt, idx = [], 0
        for c in orig:
            w = c.split()
            if rebuilt is not None and kept[idx : idx + len(w)] == w:
                idx += len(w)
        assert idx == len(kept)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.lists(
                st.floats(min_value=-100, max_value=100, allow_nan=False),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_grouped_centroids_match_numpy(spark, rows):
    import numpy as np

    from sparkprep.operators.similarity import grouped_centroids

    df = spark.createDataFrame(
        [(g, [float(x) for x in v]) for g, v in rows], ["label", "embedding"]
    )
    out = {r["label"]: r for r in grouped_centroids(df, "embedding", "label").collect()}
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        assert out[g]["n_vecs"] == len(vs)
        exp = np.mean(np.array(vs, dtype=float), axis=0)
        got = out[g]["centroid"]
        # 1.5e-6: 0.5e-6 legitimate rounding width + 1e-6 rounding-MODE
        # skew (Spark F.round is HALF_UP, Python round is banker's — an
        # exact .0000005 boundary value differs by exactly 1e-6;
        # hypothesis found mean([0,0,1,-0.96875]) = 0.0078125)
        assert all(abs(a - round(float(b), 6)) <= 1.5e-6 for a, b in zip(got, exp))


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),              # key
            st.integers(min_value=0, max_value=7200),           # seconds offset
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e3, max_value=1e3),
        ),
        min_size=1, max_size=25,
    )
)
def test_rolling_time_agg_matches_pandas(spark, rows):
    # independent recomputation: closed [t-1h, t] per key, via brute
    # pandas filtering (not pandas.rolling, whose boundary semantics
    # differ) — pins frame inclusivity and peer handling under ties
    import datetime

    from sparkprep.operators import temporal

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, k, base + datetime.timedelta(seconds=s), float(v))
        for i, (k, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["event_id", "user_id", "ts", "value"])
    out = {
        r.event_id: (r.value_roll_avg, r.n_in_window)
        for r in temporal.rolling_time_agg(df, "ts", "user_id", "value").collect()
    }
    for i, (k, s, v) in enumerate(rows):
        members = [
            v2 for (k2, s2, v2) in rows if k2 == k and s - 3600 <= s2 <= s
        ]
        assert out[i][1] == len(members)
        assert abs(out[i][0] - round(sum(members) / len(members), 4)) <= 1e-9


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),
                  st.floats(allow_nan=False, allow_infinity=False,
                            min_value=-1e6, max_value=1e6)),
        min_size=2, max_size=40,
    )
)
def test_iqr_report_matches_numpy(spark, rows):
    import numpy as np

    from sparkprep.functions import numeric as nm

    df = spark.createDataFrame([(f"k{k}", float(v)) for k, v in rows], ["k", "v"])
    got = {r.k: r for r in nm.iqr_outlier_report(df, "k", "v").collect()}
    from collections import defaultdict

    groups = defaultdict(list)
    for k, v in rows:
        groups[f"k{k}"].append(v)
    for k, vs in groups.items():
        q1, q3 = np.quantile(vs, 0.25), np.quantile(vs, 0.75)  # linear interp = Spark percentile
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = sum(1 for v in vs if v < lo or v > hi)
        assert got[k].n == len(vs)
        assert got[k].n_outliers == n_out
        assert abs(got[k].q1 - round(float(q1), 4)) <= 1e-6
        assert abs(got[k].q3 - round(float(q3), 4)) <= 1e-6


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 15), st.integers(0, 5)), max_size=20),
    st.lists(st.tuples(st.integers(0, 15), st.integers(0, 5)), max_size=20),
)
def test_cdc_closure_property(spark, old_rows, new_rows):
    # old ⊕ cdc_extract(old, new) == new, for ARBITRARY snapshots
    # (key-unique by construction; values include collisions + nulls)
    from sparkprep.operators import transform as tr

    def frame(rows):
        uniq = {k: (f"v{v}" if v else None) for k, v in rows}
        return spark.createDataFrame(
            [(k, v) for k, v in uniq.items()], "k long, v string"
        ), uniq

    old, old_d = frame(old_rows)
    new, new_d = frame(new_rows)
    feed = tr.cdc_extract(old, new, key_cols=["k"])
    upserts = feed.filter(F.col("op") != "D").drop("op")
    deletes = feed.filter(F.col("op") == "D").select("k")
    rebuilt = tr.merge_upsert(old, upserts, key_cols=["k"]).join(
        deletes, "k", "left_anti"
    )
    assert {r.k: r.v for r in rebuilt.collect()} == new_d
    # and the feed is minimal: no record for unchanged keys
    unchanged = {k for k in old_d if k in new_d and old_d[k] == new_d[k]}
    assert not [r for r in feed.collect() if r.k in unchanged]


_seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8)
_pkey = _seg.filter(lambda k: k not in ("fbclid", "gclid", "ref"))


@st.composite
def _url_variants(draw):
    """A canonical page plus two randomly-decorated spellings of it:
    scheme case, www., default port, trailing slash, /index.html,
    tracking params, param order, fragment — all things canonical_url
    must erase."""
    host = draw(_seg) + ".example.com"
    segs = draw(st.lists(_seg, max_size=3))
    params = draw(
        st.dictionaries(_pkey, _seg, max_size=3)
    )

    def variant():
        scheme = draw(st.sampled_from(["http://", "https://", "HTTP://", "HTTPS://", ""]))
        www = draw(st.sampled_from(["", "www."]))
        port = draw(st.sampled_from(["", ":80", ":443"]))
        path = "".join(f"/{s}" for s in segs)
        tail = draw(st.sampled_from(["", "/", "//", "/index.html"]))
        track = draw(
            st.lists(
                st.sampled_from(["utm_source=x", "utm_c=y", "fbclid=1", "gclid=2", "ref=rss"]),
                max_size=2,
            )
        )
        plist = [f"{k}={v}" for k, v in params.items()] + track
        order = draw(st.permutations(plist)) if plist else []
        query = "?" + "&".join(order) if order else ""
        frag = draw(st.sampled_from(["", "#top", "#a=b"]))
        return f"{scheme}{www}{host}{port}{path}{tail}{query}{frag}"

    return variant(), variant()


@settings(max_examples=15, deadline=None)
@given(st.lists(_url_variants(), min_size=1, max_size=8))
def test_canonical_url_variant_invariance_and_fixpoint(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    out = df.select(
        "i",
        strings.canonical_url("a").alias("ca"),
        strings.canonical_url("b").alias("cb"),
        strings.canonical_url(strings.canonical_url("a")).alias("caa"),
    ).collect()
    for r in out:
        # every decoration of the same page collapses to one key
        assert r["ca"] == r["cb"], (pairs[r["i"]], r["ca"], r["cb"])
        # and the key is a fixpoint of the canonicalizer
        assert r["caa"] == r["ca"]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 5)),
        min_size=3,
        max_size=25,
    )
)
def test_kendall_tau_matches_brute_force(spark, pairs):
    # the 2-D-prefix-sum tau-b must equal the O(n^2) pair enumeration
    # for ANY tie structure hypothesis can produce
    from itertools import combinations

    from sparkprep.operators.stats import kendall_tau

    df = spark.createDataFrame(pairs, ["x", "y"])
    got = kendall_tau(df, "x", "y").collect()[0]
    c = d = 0
    for (x1, y1), (x2, y2) in combinations(pairs, 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            c += 1
        elif s < 0:
            d += 1
    assert got["concordant"] == c and got["discordant"] == d
    n = len(pairs)
    n0 = n * (n - 1) / 2
    from collections import Counter

    n1 = sum(t * (t - 1) / 2 for t in Counter(p[0] for p in pairs).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(p[1] for p in pairs).values())
    den = math.sqrt((n0 - n1) * (n0 - n2))
    if den == 0:
        assert got["kendall_tau"] is None
    else:
        assert got["kendall_tau"] == pytest.approx((c - d) / den, abs=1e-4)
