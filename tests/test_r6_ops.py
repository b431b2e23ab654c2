"""Round-6 operator semantics the oracle can't see: nonparametric
rank tests (Mann-Whitney U, Kruskal-Wallis H) against brute-force
pure-Python references (mid-rank ties, tie-corrected variance), plus
degenerate-input behavior (all-ties → NULL statistic, not a crash)."""

import math
from collections import Counter

import pytest

from sparkprep.operators.stats import kruskal_wallis, mann_whitney


def _mid_ranks(values):
    cnt = Counter(values)
    less, cum = {}, 0
    for v in sorted(cnt):
        less[v] = cum
        cum += cnt[v]
    return {v: less[v] + (cnt[v] + 1) / 2 for v in cnt}


def _ref_mann_whitney(a, b):
    pooled = list(a) + list(b)
    r = _mid_ranks(pooled)
    na, nb, n = len(a), len(b), len(pooled)
    ra = sum(r[v] for v in a)
    u = ra - na * (na + 1) / 2
    t = sum(c**3 - c for c in Counter(pooled).values())
    var = na * nb / 12 * ((n + 1) - t / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    return u, z


def _ref_kruskal(groups):
    pooled = [v for g in groups for v in g]
    r = _mid_ranks(pooled)
    n = len(pooled)
    h = 12 / (n * (n + 1)) * sum(
        sum(r[v] for v in g) ** 2 / len(g) for g in groups
    ) - 3 * (n + 1)
    t = sum(c**3 - c for c in Counter(pooled).values())
    return h / (1 - t / (n**3 - n))


def test_mann_whitney_matches_reference(spark):
    a = [3, 5, 5, 7, 9, 12, 12, 12, 15, 4]
    b = [1, 2, 5, 6, 6, 8, 12, 3, 3]
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    got = mann_whitney(df, "v", "g", "A", "B").collect()[0]
    u_ref, z_ref = _ref_mann_whitney(a, b)
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["u_a"] == pytest.approx(u_ref, abs=1e-6)
    assert got["z"] == pytest.approx(z_ref, abs=1e-6)
    na, nb = len(a), len(b)
    assert got["cliffs_d"] == pytest.approx(2 * u_ref / (na * nb) - 1, abs=1e-6)


def test_mann_whitney_symmetry(spark):
    # U_a + U_b = n_a * n_b; z flips sign when the groups swap
    rows = [(v, "A") for v in [1, 4, 4, 9]] + [
        (v, "B") for v in [2, 2, 7, 8, 10]
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    ab = mann_whitney(df, "v", "g", "A", "B").collect()[0]
    ba = mann_whitney(df, "v", "g", "B", "A").collect()[0]
    assert ab["u_a"] + ba["u_a"] == pytest.approx(ab["n_a"] * ab["n_b"])
    assert ab["z"] == pytest.approx(-ba["z"], abs=1e-9)


def test_mann_whitney_all_ties_null_z(spark):
    df = spark.createDataFrame(
        [(5, "A")] * 4 + [(5, "B")] * 3, ["v", "g"]
    )
    got = mann_whitney(df, "v", "g", "A", "B").collect()[0]
    assert got["z"] is None  # sigma = 0 -> try_divide NULL, no crash
    assert got["u_a"] == pytest.approx(4 * 3 / 2)  # all mid-ranks equal


def test_kruskal_wallis_matches_reference(spark):
    groups = {
        "x": [6.4, 6.8, 7.2, 8.3, 8.4, 9.1, 9.4, 9.7],
        "y": [2.5, 3.7, 4.9, 5.4, 5.9, 8.1, 8.2],
        "z": [1.3, 4.1, 4.9, 5.2, 5.5, 8.2],  # ties across groups
    }
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, ["v", "g"])
    got = kruskal_wallis(df, "v", "g").collect()[0]
    assert got["df"] == 2
    assert got["n_rows"] == sum(len(v) for v in groups.values())
    assert got["h_stat"] == pytest.approx(
        _ref_kruskal(list(groups.values())), abs=1e-6
    )


def test_kruskal_wallis_two_groups_equals_mw_z_squared(spark):
    # with k=2, H equals z² of the Mann-Whitney normal approximation
    a = [3, 5, 5, 7, 9, 12, 1]
    b = [2, 2, 6, 6, 8, 12, 3, 14]
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    h = kruskal_wallis(df, "v", "g").collect()[0]["h_stat"]
    _, z = _ref_mann_whitney(a, b)
    assert h == pytest.approx(z * z, abs=1e-5)


def test_kruskal_wallis_all_ties_null(spark):
    df = spark.createDataFrame(
        [(7, "A")] * 3 + [(7, "B")] * 2 + [(7, "C")] * 2, ["v", "g"]
    )
    assert kruskal_wallis(df, "v", "g").collect()[0]["h_stat"] is None


def test_weighted_median_quartiles_ordered(spark, sf_dir):
    from sparkprep.queries.relational_ext import q_weighted_median

    rows = q_weighted_median(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["w_p25"] <= r["w_median"] <= r["w_p75"]
        assert r["total_cents"] > 0


def test_cumulative_reach_monotone_and_complete(spark, sf_dir):
    from sparkprep.queries.temporal_grouped import q_cumulative_reach

    rows = q_cumulative_reach(spark, sf_dir).orderBy("day").collect()
    assert rows
    assert rows[-1]["pct_reach"] == pytest.approx(1.0)
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums) and all(r["new_users"] > 0 for r in rows)
    assert sum(r["new_users"] for r in rows) == cums[-1]


def test_user_twa_bounded_by_observed_values(spark, sf_dir):
    # a time-weighted AVERAGE can never leave the observed value range
    from pyspark.sql import functions as F

    from sparkprep.queries import t
    from sparkprep.queries.temporal_grouped import q_user_twa

    twa = q_user_twa(spark, sf_dir)
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bad = (
        twa.join(bounds, "user_id")
        .filter(
            (F.col("twa") < F.col("lo") - 1e-6)
            | (F.col("twa") > F.col("hi") + 1e-6)
        )
        .count()
    )
    assert bad == 0
    assert twa.filter(F.col("n_events") < 2).count() == 0


def test_k_core_peels_pendants_keeps_clique(spark):
    from sparkprep.operators.graph import k_core

    # K4 clique (nodes 1-4) + a pendant chain 4-10-11-12 hanging off it
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, ["u", "v"])
    got = {r["node"]: r["core_degree"] for r in k_core(df, k=2).collect()}
    # the chain peels from the leaf inward; the clique survives intact
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # 3-core of K4 is K4 itself; k=4 peels everything
    assert {r["node"] for r in k_core(df, k=3).collect()} == {1, 2, 3, 4}
    assert k_core(df, k=4).count() == 0


def test_t_closeness_hand_math(spark):
    from sparkprep.operators.privacy import t_closeness_report

    # classes over 3 ordered buckets: A = [2,0,0], B = [0,1,1]
    # global g = [2,1,1], N = 4, cum_g = [2,3,4]; both classes:
    # sum|cum_c*N - cum_g*n| = 4+2+0 = 6 -> t = 6/(2*4*2) = 0.375
    rows = [("A", 0), ("A", 0), ("B", 1), ("B", 2)]
    df = spark.createDataFrame(rows, ["qi", "s"])
    got = {
        r["qi"]: r
        for r in t_closeness_report(df, ["qi"], "s", t=0.2).collect()
    }
    assert got["A"]["t_closeness"] == pytest.approx(0.375)
    assert got["B"]["t_closeness"] == pytest.approx(0.375)
    assert got["A"]["at_risk"] and got["A"]["t_level"] == pytest.approx(0.375)


def test_t_closeness_identical_distribution_is_zero(spark):
    from sparkprep.operators.privacy import t_closeness_report

    # a class matching the global distribution has EMD exactly 0
    rows = [("A", b) for b in (0, 1, 2)] * 2 + [("B", b) for b in (0, 1, 2)]
    df = spark.createDataFrame(rows, ["qi", "s"])
    for r in t_closeness_report(df, ["qi"], "s").collect():
        assert r["t_closeness"] == 0.0
        assert not r["at_risk"]


def test_trend_robust_matches_python_reference(spark, sf_dir, duck):
    # recompute Theil-Sen + Mann-Kendall in plain Python from the same
    # daily counts and compare — validates the MATH, not just the
    # cross-engine agreement the oracle pins
    from sparkprep.queries.temporal_grouped import q_trend_robust

    daily = duck.execute("""
      SELECT event_type, (epoch_us(date_trunc('day', ts)) // 86400000000) AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    series = {}
    for et, d, n in daily:
        series.setdefault(et, []).append((int(d), int(n)))
    got = {r["event_type"]: r for r in q_trend_robust(spark, sf_dir).collect()}
    for et, pts in series.items():
        slopes, s = [], 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (da, na), (db, nb) = pts[i], pts[j]
                slopes.append((nb - na) / (db - da))
                s += (nb > na) - (nb < na)
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]  # lower median
        r = got[et]
        assert r["n_days"] == len(pts) and r["n_pairs"] == len(slopes)
        assert r["mk_s"] == s
        assert r["ts_slope"] == pytest.approx(med, abs=1e-6)
        nd = len(pts)
        from collections import Counter
        tt = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(n for _, n in pts).values()
        )
        var = (nd * (nd - 1) * (2 * nd + 5) - tt) / 18.0
        if s > 0:
            z = (s - 1) / var**0.5
        elif s < 0:
            z = (s + 1) / var**0.5
        else:
            z = 0.0
        assert r["mk_z"] == pytest.approx(z, abs=1e-6)


def test_cuped_matches_python_replay(spark, sf_dir, duck):
    # replay the CUPED algebra from the same per-user sufficient stats
    # in plain Python — validates the math (theta, adjusted mean and
    # variance identities), not just cross-engine agreement
    from sparkprep.queries.temporal_grouped import q_cuped

    users = duck.execute("""
      WITH bounds AS (
        SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS split
        FROM events
      )
      SELECT user_id % 2 = 1 AS arm,
             sum(CASE WHEN epoch_us(ts) < (SELECT split FROM bounds)
                      THEN 1 ELSE 0 END) AS x,
             coalesce(sum(CASE WHEN epoch_us(ts) >= (SELECT split FROM bounds)
                               THEN value END::DECIMAL(18,6)),
                      0::DECIMAL(18,6)) AS y
      FROM events GROUP BY user_id
    """).fetchall()
    import collections

    stats = collections.defaultdict(lambda: [0, 0.0, 0.0, 0.0, 0.0, 0.0])
    for arm, x, y in users:
        y = float(y)
        st = stats[bool(arm)]
        st[0] += 1
        st[1] += x
        st[2] += y
        st[3] += x * x
        st[4] += y * y
        st[5] += x * y
    pn = sum(s[0] for s in stats.values())
    psx = sum(s[1] for s in stats.values())
    psy = sum(s[2] for s in stats.values())
    psxx = sum(s[3] for s in stats.values())
    psxy = sum(s[5] for s in stats.values())
    theta = (pn * psxy - psx * psy) / (pn * psxx - psx * psx)
    got = {r["arm"]: r for r in q_cuped(spark, sf_dir).collect()}
    assert set(got) == {True, False}
    for arm, (n, sx, sy, sxx, syy, sxy) in stats.items():
        mx, my = sx / n, sy / n
        var_y = syy / n - my * my
        var_x = sxx / n - mx * mx
        cov = sxy / n - mx * my
        r = got[arm]
        assert r["n_users"] == n
        assert r["mean_y"] == pytest.approx(my, abs=1e-5)
        assert r["mean_y_adj"] == pytest.approx(
            my - theta * (mx - psx / pn), abs=1e-5
        )
        assert r["var_y"] == pytest.approx(var_y, rel=1e-6)
        assert r["var_y_adj"] == pytest.approx(
            var_y - 2 * theta * cov + theta * theta * var_x, rel=1e-6
        )


def _ref_signed_rank(diffs):
    nz = [d for d in diffs if d != 0]
    r = _mid_ranks([abs(d) for d in nz])
    n = len(nz)
    w_plus = sum(r[abs(d)] for d in nz if d > 0)
    t = sum(c**3 - c for c in Counter(abs(d) for d in nz).values())
    var = n * (n + 1) * (2 * n + 1) / 24 - t / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    return n, w_plus, z


def test_wilcoxon_signed_rank_matches_reference(spark):
    from sparkprep.operators.stats import wilcoxon_signed_rank

    diffs = [3, -1, 4, -1, 5, 9, -2, 6, -5, 3, 0, 0, 1, -4, 2]
    df = spark.createDataFrame([(d,) for d in diffs], ["d"])
    got = wilcoxon_signed_rank(df, "d").collect()[0]
    n, w_plus, z = _ref_signed_rank(diffs)
    assert got["n_nonzero"] == n
    assert got["w_plus"] == pytest.approx(w_plus, abs=1e-6)
    assert got["z"] == pytest.approx(z, abs=1e-6)


def test_wilcoxon_all_same_positive(spark):
    from sparkprep.operators.stats import wilcoxon_signed_rank

    # all |d| equal and positive: every mid-rank is (n+1)/2, so
    # W+ = n·(n+1)/2 = 15 for n=5
    df = spark.createDataFrame([(2,)] * 5, ["d"])
    got = wilcoxon_signed_rank(df, "d").collect()[0]
    assert got["n_nonzero"] == 5 and got["w_plus"] == pytest.approx(15.0)


def test_knn_label_consistency_flags_planted_error(spark):
    from sparkprep.operators.similarity import knn_label_consistency

    # a tight cluster of 6 near-identical vectors, one mislabeled:
    # the odd one's neighborhood unanimously disagrees -> suspect
    base = [1.0, 0.2, -0.3, 0.05]
    rows = [
        (i, [v + 0.001 * i for v in base], 0 if i < 5 else 1)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        r["vec_id"]: r
        for r in knn_label_consistency(
            df, k=3, num_planes=2, dim=4, seed=42
        ).collect()
    }
    assert got[5]["suspect"] and got[5]["n_agree"] == 0
    # correctly-labeled members see at most one dissenter among top-3
    for i in range(5):
        assert got[i]["agree_frac"] >= 0.5 and not got[i]["suspect"]


def test_average_precision_perfect_and_no_skill(spark):
    from sparkprep.operators.features import binned_average_precision

    # perfectly separating scorer: AP = 1.0
    rows = [(0.9 + i * 0.0001, True) for i in range(5)] + [
        (0.1 + i * 0.0001, False) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["score", "label"])
    r = binned_average_precision(df, "score", "label", bins=1000).collect()[0]
    assert r["ap"] == pytest.approx(1.0)
    assert r["n_pos"] == 5 and r["n_neg"] == 20
    assert r["base_rate"] == pytest.approx(0.2)

    # constant scorer (all one bin): AP collapses to the base rate
    df2 = spark.createDataFrame(
        [(0.5, i < 5) for i in range(25)], ["score", "label"]
    )
    r2 = binned_average_precision(df2, "score", "label", bins=1000).collect()[0]
    assert r2["ap"] == pytest.approx(r2["base_rate"])


def test_average_precision_hand_math(spark):
    from sparkprep.operators.features import binned_average_precision

    # descending bins: [pos=1], [neg=1], [pos=1] ->
    # AP = (1*(1/1) + 1*(2/3)) / 2 = 5/6
    rows = [(0.9, True), (0.5, False), (0.1, True)]
    df = spark.createDataFrame(rows, ["score", "label"])
    r = binned_average_precision(df, "score", "label", bins=10).collect()[0]
    assert r["ap"] == pytest.approx(5 / 6, abs=1e-6)


def test_calibration_error_values_sane(spark, sf_dir):
    from sparkprep.queries.textops import q_calibration_error

    r = q_calibration_error(spark, sf_dir).collect()[0]
    # ECE and Brier both live in [0, 1]; Brier of a calibrated-ish
    # score beats the 0.25 coin-flip ceiling only if informative —
    # just pin the ranges and row accounting here (the oracle pins
    # exact values)
    assert 0.0 <= r["ece"] <= 1.0
    assert 0.0 <= r["brier"] <= 1.0
    assert r["n_rows"] > 0


def test_vocab_growth_monotone_and_bounded(spark, sf_dir):
    from sparkprep.queries.textops import q_vocab_growth

    rows = q_vocab_growth(spark, sf_dir).orderBy("doc_id").collect()
    assert rows
    prev_t, prev_v = 0, 0
    for r in rows:
        assert r["cum_types"] <= r["cum_tokens"]
        assert r["cum_tokens"] >= prev_t and r["cum_types"] >= prev_v
        assert 0.0 < r["ttr"] <= 1.0
        prev_t, prev_v = r["cum_tokens"], r["cum_types"]


def test_rank_tests_invariant_under_monotone_transform(spark):
    # the defining property of rank statistics: any strictly monotone
    # transform of the values leaves U, z, H, and Cliff's delta
    # unchanged (means/variances would shift — ranks cannot)
    from sparkprep.operators.stats import kruskal_wallis, mann_whitney

    rows = [(v, g) for g, vs in {
        "A": [3, 5, 5, 7, 9, 12, 1],
        "B": [2, 2, 6, 6, 8, 12, 3, 14],
        "C": [4, 4, 10, 11, 2],
    }.items() for v in vs]
    df = spark.createDataFrame(rows, ["v", "g"])
    warped = df.selectExpr("CAST(v * v * v + 7 AS DOUBLE) AS v", "g")
    base_mw = mann_whitney(df, "v", "g", "A", "B").collect()[0]
    warp_mw = mann_whitney(warped, "v", "g", "A", "B").collect()[0]
    assert base_mw.asDict() == warp_mw.asDict()
    base_kw = kruskal_wallis(df, "v", "g").collect()[0]
    warp_kw = kruskal_wallis(warped, "v", "g").collect()[0]
    assert base_kw.asDict() == warp_kw.asDict()


def test_fd_repair_majority_and_ties(spark):
    from sparkprep.operators.clean import fd_repair

    rows = [
        (1, "x"), (1, "x"), (1, "y"),          # majority x
        (2, "a"), (2, "b"),                     # tie -> smallest value 'a'
        (3, "z"),                               # singleton keeps itself
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        (r["k"], r["v"]): r["repaired"] for r in fd_repair(df, "k", "v").collect()
    }
    assert got[(1, "x")] == "x" and got[(1, "y")] == "x"
    assert got[(2, "a")] == "a" and got[(2, "b")] == "a"
    assert got[(3, "z")] == "z"


def test_fd_repair_null_semantics(spark):
    # ADVICE r6: NULL-key rows must survive (left join), NULL values
    # must never win the modal vote, and an all-NULL key repairs to NULL
    from sparkprep.operators.clean import fd_repair

    rows = [
        (None, "k"),                       # NULL key survives, repair NULL
        (4, None), (4, None), (4, "w"),    # NULLs outnumber but never vote
        (5, None),                         # all-NULL key -> NULL repair
    ]
    df = spark.createDataFrame(rows, "k int, v string")
    out = fd_repair(df, "k", "v").collect()
    assert len(out) == len(rows), "left join must keep every input row"
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], set()).add(r["repaired"])
    assert by_key[None] == {None}
    assert by_key[4] == {"w"}
    assert by_key[5] == {None}


def test_null_pattern_census_hand_case(spark):
    from sparkprep.operators.profile import null_pattern_census

    rows = [
        (None, 1), (None, 1), (2, None), (3, 4),
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {r["pattern"]: (r["n_rows"], r["share"]) for r in
           null_pattern_census(df, ["a", "b"]).collect()}
    assert got["10"] == (2, 0.5)
    assert got["01"] == (1, 0.25)
    assert got["00"] == (1, 0.25)


def test_grouped_holt_hand_recurrence(spark):
    from sparkprep.operators.grouped import grouped_holt

    ys = [10.0, 12.0, 11.0, 15.0, 14.0]
    df = spark.createDataFrame(
        [("k", i, y) for i, y in enumerate(ys)], ["g", "i", "y"]
    )
    got = {
        r["i"]: (r["level"], r["trend"])
        for r in grouped_holt(df, ["g"], ["i"], "y", alpha=0.3, beta=0.1).collect()
    }
    l, b = ys[0], 0.0
    assert got[0] == (l, b)
    for i, y in enumerate(ys[1:], start=1):
        lp = l
        l = 0.3 * y + (1.0 - 0.3) * (l + b)
        b = 0.1 * (l - lp) + (1.0 - 0.1) * b
        assert got[i][0] == pytest.approx(l, abs=1e-12)
        assert got[i][1] == pytest.approx(b, abs=1e-12)


def test_churn_labels_point_in_time_correct(spark, sf_dir):
    from pyspark.sql import functions as F

    from sparkprep.queries import t
    from sparkprep.queries.temporal_grouped import q_churn_labels

    out = q_churn_labels(spark, sf_dir)
    rows = out.collect()
    assert rows
    # the final observed week never appears as a FEATURE row (no label
    # horizon) — the fabricated-churner guard
    ev = t(spark, sf_dir, "events")
    horizon = ev.agg(
        F.max(F.expr("unix_micros(ts) div 604800000000"))
    ).first()[0]
    assert all(r["week"] < horizon for r in rows)
    # label cross-check on one user: active_next_week TRUE iff a week+1
    # row exists in the weekly grid
    weeks = {}
    for r in rows:
        weeks.setdefault(r["user_id"], set()).add(r["week"])
    # rebuild full activity (including horizon week) for the check
    full = {
        (x["user_id"], x["w"])
        for x in ev.select(
            "user_id", F.expr("unix_micros(ts) div 604800000000").alias("w")
        ).distinct().collect()
    }
    for r in rows:
        assert r["active_next_week"] == ((r["user_id"], r["week"] + 1) in full)


def test_forecast_eval_metrics_sane(spark, sf_dir):
    from sparkprep.queries.temporal_grouped import q_forecast_eval

    rows = q_forecast_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mae"] >= 0.0
        assert 0.0 <= r["smape"] <= 2.0  # sMAPE is bounded by 2
        assert r["n_forecasts"] > 0


def test_forecast_anomalies_flags_are_true_outliers(spark, sf_dir):
    from sparkprep.queries.temporal_grouped import q_forecast_anomalies

    rows = q_forecast_anomalies(spark, sf_dir).collect()
    for r in rows:
        # every flagged residual really is > 2 sigma away (mean offset
        # is bounded by the flag rule itself: |e - mean| > 2 sigma
        # implies |e| + |mean| > 2 sigma; pin the direct contract)
        assert r["sigma"] > 0.0
        assert abs(r["residual"]) > 0.0


def test_a6_scalar_queries_survive_empty_events(spark, tmp_path):
    # ADVICE r6: the A6 driver-scalar pattern (max/min collected to the
    # driver) unpacks None on an EMPTY events table — churn_labels,
    # cuped and signed_rank must return empty frames, not TypeError
    import shutil

    from sparkprep.queries.temporal_grouped import (
        q_churn_labels,
        q_cuped,
        q_signed_rank,
    )

    src = "/root/testdata/sf0.001"
    real = spark.read.parquet(f"{src}/events.parquet")
    empty_dir = tmp_path / "sf_empty"
    empty_dir.mkdir()
    real.limit(0).write.parquet(str(empty_dir / "events.parquet"))
    for q in (q_churn_labels, q_cuped):
        assert q(spark, str(empty_dir)).count() == 0
    # signed_rank is a global-summary aggregate: one all-zero/NULL row
    row = q_signed_rank(spark, str(empty_dir)).collect()
    assert len(row) == 1 and row[0]["n_nonzero"] == 0
