"""mad_scores and top_p_by_group: hand-computed math and boundary
semantics the row-level oracles don't isolate."""

import pytest
from pyspark.sql import Row

from sparkprep.functions import numeric
from sparkprep.operators import mix


def test_mad_scores_hand_computed(spark):
    # group g: values 1,2,3,100 -> median 2.5, MAD 1.0
    df = spark.createDataFrame(
        [Row(g="g", x=v) for v in [1.0, 2.0, 3.0, 100.0]],
        "g string, x double",
    )
    out = {r.x: r.mad_z for r in numeric.mad_scores(df, "x", "g").collect()}
    assert out[100.0] == round(0.6745 * (100.0 - 2.5) / 1.0, 4)
    # 0.6745*-1.5 = -1.01175 sits ON a round-4 boundary: Spark rounds
    # HALF_UP (-1.0118), Python HALF_EVEN (-1.0117) — assert the value,
    # not the rounding rule (Spark<->DuckDB parity is the oracle's job)
    assert out[1.0] == pytest.approx(0.6745 * (1.0 - 2.5), abs=1e-4)


def test_mad_scores_constant_group_null(spark):
    df = spark.createDataFrame(
        [Row(g="c", x=5.0)] * 4, "g string, x double"
    )
    assert all(
        r.mad_z is None for r in numeric.mad_scores(df, "x", "g").collect()
    )


def test_mad_scores_null_value_passthrough(spark):
    df = spark.createDataFrame(
        [Row(g="g", x=1.0), Row(g="g", x=3.0), Row(g="g", x=None)],
        "g string, x double",
    )
    rows = {
        (r.x is None): r.mad_z
        for r in numeric.mad_scores(df, "x", "g").collect()
    }
    assert rows[True] is None  # NULL value -> NULL score, never an error


def test_top_p_crossing_row_kept(spark):
    df = spark.createDataFrame(
        [Row(g="s", i=1, v=50.0), Row(g="s", i=2, v=30.0),
         Row(g="s", i=3, v=20.0)],
        "g string, i long, v double",
    )
    out = {r.i: r.keep for r in
           mix.top_p_by_group(df, "g", "v", 0.8, "i").collect()}
    # 50 (0<80), 30 (50<80) kept; 20 starts at exactly 80 -> dropped
    assert out == {1: True, 2: True, 3: False}


def test_top_p_one_keeps_everything(spark):
    df = spark.createDataFrame(
        [Row(g="s", i=i, v=float(i)) for i in range(1, 5)],
        "g string, i long, v double",
    )
    out = mix.top_p_by_group(df, "g", "v", 1.0, "i").collect()
    assert all(r.keep for r in out)


def test_top_p_zero_mass_group_keeps_nothing(spark):
    df = spark.createDataFrame(
        [Row(g="z", i=1, v=0.0), Row(g="z", i=2, v=0.0)],
        "g string, i long, v double",
    )
    out = mix.top_p_by_group(df, "g", "v", 0.5, "i").collect()
    assert not any(r.keep for r in out)


def test_top_p_tie_break_deterministic(spark):
    # equal scores: lower id wins the prefix slot
    df = spark.createDataFrame(
        [Row(g="s", i=2, v=10.0), Row(g="s", i=1, v=10.0)],
        "g string, i long, v double",
    )
    out = {r.i: r.keep for r in
           mix.top_p_by_group(df, "g", "v", 0.5, "i").collect()}
    assert out == {1: True, 2: False}


def test_top_p_validates_p(spark):
    df = spark.createDataFrame([Row(g="s", i=1, v=1.0)],
                               "g string, i long, v double")
    with pytest.raises(ValueError):
        mix.top_p_by_group(df, "g", "v", 0.0, "i")
    with pytest.raises(ValueError):
        mix.top_p_by_group(df, "g", "v", 1.5, "i")


def test_ab_test_hand_computed(spark):
    import math

    from pyspark.sql import Row
    from sparkprep.operators import features

    rows = [Row(arm=False, converted=i < 3) for i in range(10)] + [
        Row(arm=True, converted=i < 4) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "arm boolean, converted boolean")
    r = features.ab_test_report(df, "arm", "converted").collect()[0]
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (10, 8, 3, 4)
    assert r.rate_a == 0.3 and r.rate_b == 0.5
    assert r.lift == 0.2
    pooled = 7 / 18
    se = math.sqrt(pooled * (1 - pooled) * (1 / 10 + 1 / 8))
    assert r.z_score == pytest.approx((0.5 - 0.3) / se, abs=1e-3)


def test_ab_test_degenerate_null_z(spark):
    from pyspark.sql import Row
    from sparkprep.operators import features

    # everyone converts -> pooled 1 -> se 0 -> NULL z, no crash
    df = spark.createDataFrame(
        [Row(arm=False, converted=True), Row(arm=True, converted=True)],
        "arm boolean, converted boolean",
    )
    r = features.ab_test_report(df, "arm", "converted").collect()[0]
    assert r.z_score is None and r.rate_a == 1.0
    # empty treatment arm -> NULL treatment rate, no ANSI error
    solo = spark.createDataFrame(
        [Row(arm=False, converted=False)], "arm boolean, converted boolean"
    )
    r2 = features.ab_test_report(solo, "arm", "converted").collect()[0]
    assert r2.n_b == 0 and r2.rate_b is None and r2.z_score is None


def test_zipf_slope_on_power_law(spark):
    from pyspark.sql import Row
    from sparkprep.operators import text as tx

    # exact power law: token r appears ceil(1200 / r) times -> slope -1
    words = []
    for r in range(1, 40):
        words += [f"tok{r:02d}"] * (1200 // r)
    df = spark.createDataFrame([Row(text=" ".join(words))], "text string")
    rep = tx.zipf_slope(df, "text", top_n=40).collect()[0]
    assert rep.n_tokens == 39
    assert rep.zipf_slope == pytest.approx(-1.0, abs=0.05)
    assert rep.r2 > 0.99


def test_vocab_coverage_hand_math(spark):
    from pyspark.sql import Row
    from sparkprep.operators import text as tx

    # a a a b b c  -> top1 covers 3/6, top2 5/6, top99 (all) 6/6
    df = spark.createDataFrame([Row(text="a a a b b c")], "text string")
    out = {r.k: r for r in
           tx.vocab_coverage(df, "text", ks=[1, 2, 99]).collect()}
    assert out[1].coverage == 0.5 and out[1].vocab_tokens == 1
    assert out[2].coverage == round(5 / 6, 6)
    assert out[99].coverage == 1.0 and out[99].vocab_tokens == 3

    with pytest.raises(ValueError):
        tx.vocab_coverage(df, "text", ks=[0, 5])


def test_active_users_rolling_distinct(spark):
    import datetime

    from pyspark.sql import Row
    from sparkprep.operators import temporal

    def ts(d, h=0):
        return datetime.datetime(2024, 1, d, h)

    # user 1 active day 1 AND day 3; user 2 active day 3 only
    rows = [Row(ts=ts(1), u=1), Row(ts=ts(1, 5), u=1), Row(ts=ts(3), u=1),
            Row(ts=ts(3), u=2)]
    df = spark.createDataFrame(rows, "ts timestamp, u long")
    out = {r.day: r for r in
           temporal.active_users(df, "ts", "u", window_days=7).collect()}
    assert out["2024-01-01"].dau == 1 and out["2024-01-01"].wau == 1
    # day 3: DAU 2; WAU 2 (user 1 counted ONCE despite two active days)
    assert out["2024-01-03"].dau == 2 and out["2024-01-03"].wau == 2
    assert out["2024-01-03"].stickiness == 1.0
    # only days with activity report (inner join with the dau frame)
    assert "2024-01-02" not in out


def test_hashing_trick_semantics(spark):
    from pyspark.sql import Row
    from sparkprep.operators import features

    df = spark.createDataFrame(
        [Row(id=1, a="x", b=7), Row(id=2, a=None, b=7), Row(id=3, a="x", b=None)],
        "id long, a string, b long",
    )
    out = features.hashing_trick(df, "id", ["a", "b"], n_buckets=8)
    rows = out.collect()
    # NULLs emit no feature row
    assert sorted((r.id, r.feature) for r in rows) == [
        (1, "a"), (1, "b"), (2, "b"), (3, "a")]
    for r in rows:
        assert 0 <= r.bucket < 8 and r.sign in (-1, 1)
    # same value -> same bucket/sign regardless of row
    by = {(r.id, r.feature): (r.bucket, r.sign) for r in rows}
    assert by[(1, "a")] == by[(3, "a")]
    assert by[(1, "b")] == by[(2, "b")]
    # salt re-deals at least one assignment across features
    salted = features.hashing_trick(df, "id", ["a", "b"], n_buckets=8,
                                    salt="v2")
    sby = {(r.id, r.feature): (r.bucket, r.sign) for r in salted.collect()}
    assert sby != by
