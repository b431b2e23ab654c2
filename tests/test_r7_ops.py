"""Round-7 operator semantics the oracle can't see: Kendall tau-b vs a
brute-force all-pairs reference (with ties), deterministic Poisson
bootstrap, interval merging, and lead-lag cross-correlation edge cases."""

import math
from itertools import combinations

import pytest

from sparkprep.operators.stats import kendall_tau


def _ref_kendall(xs, ys):
    c = d = 0
    for (x1, y1), (x2, y2) in combinations(zip(xs, ys), 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            c += 1
        elif s < 0:
            d += 1
    n = len(xs)
    n0 = n * (n - 1) / 2
    from collections import Counter

    n1 = sum(t * (t - 1) / 2 for t in Counter(xs).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(ys).values())
    return c, d, (c - d) / math.sqrt((n0 - n1) * (n0 - n2))


def test_kendall_matches_brute_force_with_ties(spark):
    xs = [1, 1, 2, 2, 3, 3, 4, 5, 5, 6, 2, 4]
    ys = [2, 3, 3, 1, 4, 4, 5, 5, 2, 6, 2, 1]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    got = kendall_tau(df, "x", "y").collect()[0]
    c_ref, d_ref, tau_ref = _ref_kendall(xs, ys)
    assert got["concordant"] == c_ref
    assert got["discordant"] == d_ref
    assert got["n_rows"] == len(xs)
    assert got["kendall_tau"] == pytest.approx(tau_ref, abs=1e-4)


def test_kendall_perfect_and_reversed(spark):
    xs = list(range(1, 9))
    df = spark.createDataFrame([(x, x * 2) for x in xs], ["x", "y"])
    assert kendall_tau(df, "x", "y").collect()[0]["kendall_tau"] == 1.0
    rev = spark.createDataFrame([(x, -x) for x in xs], ["x", "y"])
    assert kendall_tau(rev, "x", "y").collect()[0]["kendall_tau"] == -1.0


def test_kendall_all_ties_null(spark):
    df = spark.createDataFrame([(7, 1), (7, 2), (7, 3)], ["x", "y"])
    got = kendall_tau(df, "x", "y").collect()[0]
    assert got["kendall_tau"] is None  # n0 == n1 -> try_divide NULL
    assert got["concordant"] == 0 and got["discordant"] == 0


def test_interval_merge_swallowing_interval(spark, tmp_path):
    # an early LONG interval swallows later short ones: a lag-based
    # sweep would wrongly split; the running-max sweep must not
    import datetime

    from sparkprep.queries.temporal_grouped import q_interval_merge

    base = datetime.datetime(2022, 1, 1, 12, 0, 0)
    rows = [
        # user 1: events at t, t+1min, t+4min -> one island (5-min spans
        # chain); then t+20min -> second island
        (1, 1, base),
        (1, 2, base + datetime.timedelta(minutes=1)),
        (1, 3, base + datetime.timedelta(minutes=4)),
        (1, 4, base + datetime.timedelta(minutes=20)),
        # user 2: single event -> one island of exactly 5 minutes
        (2, 5, base),
        # user 2... adjacent-at-boundary: t+5min touches [t, t+5) end
        # exclusively -> merges (start == prev end is NOT >)
        (2, 6, base + datetime.timedelta(minutes=5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    got = {
        r["user_id"]: r
        for r in q_interval_merge(spark, str(d)).collect()
    }
    assert got[1]["n_merged"] == 2 and got[1]["n_events"] == 4
    assert got[1]["covered_us"] == (9 * 60 + 5 * 60) * 1_000_000
    assert got[1]["longest_us"] == 9 * 60 * 1_000_000
    assert got[2]["n_merged"] == 1
    assert got[2]["covered_us"] == 10 * 60 * 1_000_000


def test_cross_corr_detects_known_lag(spark, tmp_path):
    # purchases = clicks shifted by +2 days -> xcorr peaks at lag 2
    import datetime

    from sparkprep.queries.temporal_grouped import q_cross_corr

    base = datetime.datetime(2022, 1, 1)
    counts = [3, 9, 1, 7, 5, 8, 2, 6, 4, 10]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, "click", base + datetime.timedelta(days=d)))
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, 1, "purchase", base + datetime.timedelta(days=d + 2))
            )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    got = {r["lag"]: r["xcorr"] for r in q_cross_corr(spark, str(d)).collect()}
    assert got[2] == pytest.approx(1.0)
    assert all(got[l] < 1.0 for l in got if l != 2)


def test_bootstrap_ci_contains_point_and_is_deterministic(spark, sf_dir):
    from sparkprep.queries.scale_ops import q_bootstrap_ci

    a = q_bootstrap_ci(spark, sf_dir).collect()[0]
    b = q_bootstrap_ci(spark, sf_dir).collect()[0]
    assert a == b  # md5-derived weights: bit-identical across runs
    assert a["boot_lo"] <= a["point_mean"] <= a["boot_hi"]
    assert a["boot_lo"] < a["boot_hi"]
    assert a["b_reps"] == 32


def test_poisson_weights_mean_near_one(spark, sf_dir):
    # the replicate weight distribution must be ~Poisson(1): mean ~1
    from pyspark.sql import functions as F

    from sparkprep.queries import t
    from sparkprep.queries.scale_ops import _boot_digest, _boot_weight

    orders = t(spark, sf_dir, "orders").select("o_orderkey")
    rep = orders.withColumn(
        "__md", _boot_digest(F.col("o_orderkey"))
    ).withColumn("__b", F.explode(F.sequence(F.lit(0), F.lit(31))))
    w = _boot_weight(F.col("__md"), F.col("__b"))
    stats = rep.agg(
        F.avg(w).alias("m"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert stats["m"] == pytest.approx(1.0, abs=0.05)


def test_changepoint_finds_step(spark, tmp_path):
    # level 2/day for 6 days then 10/day for 6 days -> split after day 5
    import datetime

    from sparkprep.queries.temporal_grouped import q_changepoint

    base = datetime.datetime(2022, 3, 1)
    rows = []
    eid = 0
    for d in range(12):
        n = 2 if d < 6 else 10
        for _ in range(n):
            eid += 1
            rows.append((eid, 1, "click", base + datetime.timedelta(days=d)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    dd = tmp_path / "sf"
    dd.mkdir()
    df.write.parquet(str(dd / "events.parquet"))
    got = q_changepoint(spark, str(dd)).collect()
    assert len(got) == 1
    r = got[0]
    first_day = r["split_day"] - 5  # split at the 6th day of the series
    assert r["n_days"] == 12
    assert r["mean_before"] == pytest.approx(2.0)
    assert r["mean_after"] == pytest.approx(10.0)
    assert first_day * 86400000000 <= r["split_day"] * 86400000000


def test_ngram_novelty_exact_dup_and_fresh(spark, tmp_path):
    from sparkprep.queries.corpus import q_ngram_novelty

    rows = [
        (1, "a b c d"),        # 2 shingles, all novel
        (2, "a b c d"),        # exact dup of doc 1 -> novelty 0
        (3, "a b c x y z"),    # 4 shingles: 'a b c' seen, 3 novel
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "documents.parquet"))
    got = {r["doc_id"]: r for r in q_ngram_novelty(spark, str(d)).collect()}
    assert got[1]["n_shingles"] == 2 and got[1]["novelty"] == 1.0
    assert got[2]["n_shingles"] == 2 and got[2]["novelty"] == 0.0
    assert got[3]["n_shingles"] == 4 and got[3]["n_novel"] == 3
    assert got[3]["novelty"] == pytest.approx(0.75)


def test_gains_table_invariants(spark, sf_dir):
    from sparkprep.queries.scale_ops import q_gains_table

    rows = q_gains_table(spark, sf_dir).orderBy("decile").collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # cumulative capture is monotone and ends at 1.0
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps) and caps[-1] == pytest.approx(1.0)
    # decile sizes differ by at most 1 (exact ntile)
    sizes = [r["n_orders"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # lift averages to ~1 weighted by volume: sum(nb) / tb == 1
    total_bad = sum(r["n_bad"] for r in rows)
    assert total_bad > 0


def test_woe_iv_hand_math(spark, tmp_path):
    import math

    from sparkprep.queries.relational_ext import q_woe_iv

    # bucket 0.0: 30 good / 10 bad; bucket 0.1: 10 good / 30 bad
    rows = (
        [(0.0, "N")] * 30 + [(0.0, "R")] * 10
        + [(0.1, "N")] * 10 + [(0.1, "R")] * 30
    )
    df = spark.createDataFrame(rows, "l_discount double, l_returnflag string")
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "lineitem.parquet"))
    got = {r["bucket"]: r for r in q_woe_iv(spark, str(d)).collect()}
    # pct_g = 30/40, pct_b = 10/40 -> woe = ln(3); symmetric bucket ln(1/3)
    assert got[0.0]["woe"] == pytest.approx(math.log(3), abs=1e-6)
    assert got[0.1]["woe"] == pytest.approx(-math.log(3), abs=1e-6)
    iv = 2 * (30 / 40 - 10 / 40) * math.log(3)
    assert got[0.0]["iv_total"] == pytest.approx(iv, abs=1e-6)
    assert got[0.0]["iv_term"] == pytest.approx(iv / 2, abs=1e-6)


def test_theil_decomposition_identity(spark, sf_dir):
    # Theil is additively decomposable: within = sum(s_g * T_g)
    from sparkprep.queries.relational_ext import q_theil_index

    rows = q_theil_index(spark, sf_dir).collect()
    assert rows
    within = rows[0]["theil_within"]
    between = rows[0]["theil_between"]
    recomposed = sum(r["rev_share"] * r["theil_g"] for r in rows)
    assert within == pytest.approx(recomposed, abs=1e-4)
    rebetween = sum(r["between_term"] for r in rows)
    assert between == pytest.approx(rebetween, abs=1e-4)
    assert within >= 0
    assert sum(r["rev_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_theil_equal_distribution_is_zero(spark, tmp_path):
    from sparkprep.queries.relational_ext import q_theil_index

    # 4 customers, 2 nations, identical revenue -> every index 0
    li = spark.createDataFrame(
        [(i, 100.0, 0.0) for i in range(1, 5)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [(i, i) for i in range(1, 5)], "o_orderkey long, o_custkey long"
    )
    cust = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20)],
        "c_custkey long, c_nationkey long",
    )
    nation = spark.createDataFrame(
        [(10, "A"), (20, "B")], "n_nationkey long, n_name string"
    )
    d = tmp_path / "sf"
    d.mkdir()
    for name, df in [
        ("lineitem", li), ("orders", orders),
        ("customer", cust), ("nation", nation),
    ]:
        df.write.parquet(str(d / f"{name}.parquet"))
    for r in q_theil_index(spark, str(d)).collect():
        assert r["theil_g"] == 0.0
        assert r["between_term"] == pytest.approx(0.0, abs=1e-6)
        assert r["theil_within"] == 0.0 and r["theil_between"] == pytest.approx(0.0, abs=1e-6)


def test_dp_counts_mechanism_replay(spark, sf_dir):
    import hashlib
    import math

    from sparkprep.queries.governance import q_dp_counts

    rows = {r["event_type"]: r for r in q_dp_counts(spark, sf_dir).collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    P = 2147483647
    for et, r in rows.items():
        h = int(hashlib.md5(et.encode()).hexdigest()[:15], 16) % P
        u = (h + 0.5) / P
        sign = 1.0 if u - 0.5 >= 0 else -1.0
        expected = -sign * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert r["noise"] == pytest.approx(expected, abs=1e-4)
        assert r["n_released"] == pytest.approx(
            r["n_true"] + expected, abs=1e-3
        )
        assert r["epsilon"] == 1.0


def test_burstiness_hand_math(spark, tmp_path):
    # hours [h, h+2], observed counts 4 and 2 with the MIDDLE hour
    # empty: S1=6, S2=20, H=3 -> fano = (3*20 - 36)/(3*6) = 4/3.
    # The zero hour must count WITHOUT densification.
    import datetime

    from sparkprep.queries.temporal_grouped import q_burstiness

    base = datetime.datetime(2022, 5, 1, 0, 0, 0)
    rows = []
    eid = 0
    for _ in range(4):
        eid += 1
        rows.append((eid, 1, "click", base))
    for _ in range(2):
        eid += 1
        rows.append((eid, 1, "click", base + datetime.timedelta(hours=2)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    got = q_burstiness(spark, str(d)).collect()[0]
    assert got["n_events"] == 6 and got["n_hours"] == 3
    assert got["fano"] == pytest.approx(4 / 3, abs=1e-6)
    assert got["cv2"] == pytest.approx((3 * 20 - 36) / 36, abs=1e-6)


def test_stump_split_separable_case(spark, tmp_path):
    from sparkprep.queries.relational_ext import q_stump_split

    # quantity <= 10 never returns, quantity > 10 always returns:
    # the stump must split at 10 with pure leaves
    rows = (
        [(5.0, "N")] * 20 + [(10.0, "N")] * 10
        + [(20.0, "R")] * 15 + [(30.0, "R")] * 5
    )
    df = spark.createDataFrame(rows, "l_quantity double, l_returnflag string")
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "lineitem.parquet"))
    got = q_stump_split(spark, str(d)).collect()[0]
    assert got["split_value"] == 10.0
    assert got["n_left"] == 30 and got["n_right"] == 20
    assert got["bad_rate_left"] == 0.0 and got["bad_rate_right"] == 1.0
    assert got["gini_after"] == 0.0
    assert got["gini_before"] == pytest.approx(2 * 0.6 * 0.4, abs=1e-6)


def test_ols_elasticity_recovers_exact_line(spark, tmp_path):
    import math

    from sparkprep.queries.relational_ext import q_ols_elasticity

    # engineer ln(qty) = 2*ln(unit) + 1 exactly: unit = e^t, qty = e^(2t+1)
    rows = []
    for i, tv in enumerate([0.0, 0.5, 1.0, 1.5]):
        unit = math.exp(tv)
        qty = math.exp(2 * tv + 1)
        rows.append((i, qty, unit * qty))
    li = spark.createDataFrame(
        rows, "l_partkey long, l_quantity double, l_extendedprice double"
    )
    part = spark.createDataFrame(
        [(i, "Brand#1") for i in range(4)], "p_partkey long, p_brand string"
    )
    d = tmp_path / "sf"
    d.mkdir()
    li.write.parquet(str(d / "lineitem.parquet"))
    part.write.parquet(str(d / "part.parquet"))
    got = q_ols_elasticity(spark, str(d)).collect()[0]
    assert got["slope"] == pytest.approx(2.0, abs=1e-5)
    assert got["intercept"] == pytest.approx(1.0, abs=1e-5)
    assert got["r2"] == pytest.approx(1.0, abs=1e-6)


def test_degree_dist_path_graph(spark, tmp_path):
    from sparkprep.queries.relational_ext import q_degree_dist

    # build lineitem so the support>=2 co-purchase graph is the path
    # a-b-c: orders {a,b}x2 and {b,c}x2 -> degrees a=1, b=2, c=1
    rows = []
    for ok, parts in [(1, (100, 200)), (2, (100, 200)),
                      (3, (200, 300)), (4, (200, 300))]:
        for pk in parts:
            rows.append((ok, pk))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "lineitem.parquet"))
    got = {r["log2_bucket"]: r for r in q_degree_dist(spark, str(d)).collect()}
    # bucket 0 = degree 1 (two leaf nodes), bucket 1 = degree 2-3 (hub)
    assert got[0]["n_nodes"] == 2 and got[0]["max_degree"] == 1
    assert got[1]["n_nodes"] == 1 and got[1]["min_degree"] == 2


def test_tail_quantiles_order_statistics(spark, tmp_path):
    import math

    from sparkprep.queries.relational_ext import q_tail_quantiles

    vals = [float(v) for v in range(1, 201)]  # 1..200, unique
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "o_orderkey long, o_totalprice double",
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.write.parquet(str(d / "orders.parquet"))
    got = q_tail_quantiles(spark, str(d)).collect()[0]
    s = sorted(vals)
    n = len(s)
    assert got["n_orders"] == n
    assert got["p50"] == s[math.ceil(0.5 * n) - 1]
    assert got["p90"] == s[math.ceil(0.9 * n) - 1]
    assert got["p99"] == s[math.ceil(0.99 * n) - 1]
    assert got["p999"] == s[math.ceil(0.999 * n) - 1]
    assert got["tail_ratio_99_50"] == pytest.approx(
        s[math.ceil(0.99 * n) - 1] / s[math.ceil(0.5 * n) - 1], abs=1e-6
    )


def test_repeat_purchase_curve_invariants(spark, sf_dir):
    from sparkprep.queries.temporal_grouped import q_repeat_purchase_curve

    rows = q_repeat_purchase_curve(spark, sf_dir).orderBy("k_purchases").collect()
    assert rows
    # survival is non-increasing in k and starts at 1.0 (everyone who
    # purchased made >= min observed count)
    ge = [r["n_users_ge"] for r in rows]
    assert ge == sorted(ge, reverse=True)
    assert rows[0]["share_ge"] == pytest.approx(1.0)
    assert sum(r["n_users_exact"] for r in rows) == ge[0]
    # exact + survival consistency: ge[i] - ge[i+1] == exact[i]
    for a, b in zip(rows, rows[1:]):
        assert a["n_users_ge"] - b["n_users_ge"] == a["n_users_exact"]


def test_dp_histogram_mechanism_and_edges(spark, sf_dir):
    import hashlib
    import math

    from sparkprep.queries.governance import q_dp_histogram

    rows = q_dp_histogram(spark, sf_dir).orderBy("bucket").collect()
    assert rows
    P = 2147483647
    for r in rows:
        assert r["hi"] - r["lo"] == 60_000.0
        assert r["lo"] == r["bucket"] * 60_000.0
        h = int(hashlib.md5(f"dph:{r['bucket']}".encode()).hexdigest()[:15], 16) % P
        u = (h + 0.5) / P
        sign = 1.0 if u - 0.5 >= 0 else -1.0
        expected = -sign * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert r["noise"] == pytest.approx(expected, abs=1e-4)
        assert r["n_released"] == pytest.approx(r["n_true"] + expected, abs=1e-3)
