"""Governance operators: purge cascade, l-diversity, Benford,
concentration — semantics the sf0.01 oracles can't see (NULL keys,
planted classes, hand-computed math, degenerate inputs)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkprep.functions import numeric
from sparkprep.operators import privacy, skew


def test_purge_keys_null_key_survives(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=None, v="c")],
        "k long, v string",
    )
    keys = spark.createDataFrame([Row(k=1)], "k long")
    kept = privacy.purge_keys(df, "k", keys).collect()
    assert sorted(r.v for r in kept) == ["b", "c"]  # NULL key never matches


def test_derive_keys_distinct_next_hop(spark):
    orders = spark.createDataFrame(
        [Row(cust=1, ok=10), Row(cust=1, ok=11), Row(cust=2, ok=12),
         Row(cust=1, ok=10)],
        "cust long, ok long",
    )
    keys = spark.createDataFrame([Row(cust=1)], "cust long")
    got = sorted(
        r.ok for r in privacy.derive_keys(orders, "cust", "ok", keys).collect()
    )
    assert got == [10, 11]


def test_purge_audit_conservation(spark):
    df = spark.createDataFrame(
        [Row(k=i % 3, v=i) for i in range(12)], "k long, v long"
    )
    keys = spark.createDataFrame([Row(k=0)], "k long")
    audit = privacy.purge_audit([("t", df, "k", keys, "k")]).collect()
    assert len(audit) == 1
    row = audit[0]
    assert row.rows_before == 12 and row.rows_removed == 4
    assert row.rows_after == row.rows_before - row.rows_removed
    kept = privacy.purge_keys(df, "k", keys)
    assert kept.count() == row.rows_after


def test_purge_audit_empty_request_set(spark):
    df = spark.createDataFrame([Row(k=1)], "k long")
    keys = spark.createDataFrame([], "k long")
    row = privacy.purge_audit([("t", df, "k", keys, "k")]).collect()[0]
    assert (row.rows_before, row.rows_removed, row.rows_after) == (1, 0, 1)


def test_l_diversity_planted_class(spark):
    rows = (
        # class A: 3 rows, all the same sensitive value -> l_count 1
        [Row(q="A", s=7)] * 3
        # class B: 3 rows, 3 distinct -> l_count 3
        + [Row(q="B", s=i) for i in range(3)]
        # class C: sensitive all NULL -> l_count 0, at risk
        + [Row(q="C", s=None)] * 2
    )
    df = spark.createDataFrame(rows, "q string, s int")
    rep = {r.q: r for r in privacy.l_diversity_report(df, ["q"], "s", l=2).collect()}
    assert rep["A"].l_count == 1 and rep["A"].at_risk
    assert rep["B"].l_count == 3 and not rep["B"].at_risk
    assert rep["C"].l_count == 0 and rep["C"].at_risk
    assert all(r.l_level == 0 for r in rep.values())
    assert rep["A"].class_size == 3


def test_benford_math_and_filters(spark):
    # digits: 1 (x3), 9 (x2), 0.05 -> digit 5; dropped: -4, 0, 0.004
    vals = [1.0, 12.5, 199.0, 900.0, 9.99, 0.05, -4.0, 0.0, 0.004]
    df = spark.createDataFrame([Row(x=v) for v in vals], "x double")
    rep = {r.digit: r for r in numeric.benford_report(df, "x").collect()}
    assert sorted(rep) == [1, 5, 9]
    assert rep[1].n == 3 and rep[9].n == 2 and rep[5].n == 1
    assert rep[1].share == round(3 / 6, 4)
    assert rep[9].expected == round(math.log10(1 + 1 / 9), 4)
    assert rep[5].deviation == round(
        round(1 / 6, 4) - round(math.log10(1.2), 4), 4
    )


def test_benford_all_nonpositive_is_empty(spark):
    df = spark.createDataFrame([Row(x=-1.0), Row(x=0.0)], "x double")
    assert numeric.benford_report(df, "x").count() == 0


def test_concentration_hand_computed(spark):
    # revenues: a=60, b=30, c=10 -> shares .6/.3/.1, hhi=.46
    rows = [Row(k="a", v=50.0), Row(k="a", v=10.0), Row(k="b", v=30.0),
            Row(k="c", v=10.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    r = skew.concentration_report(df, "k", "v", top=2).collect()[0]
    assert r.n_keys == 3
    assert r.total_value == 100.0
    assert r.hhi == round(0.36 + 0.09 + 0.01, 6)
    assert r.top_share == round(0.9, 6)


def test_concentration_top_exceeds_keys(spark):
    df = spark.createDataFrame([Row(k="a", v=5.0)], "k string, v double")
    r = skew.concentration_report(df, "k", "v", top=10).collect()[0]
    assert r.n_keys == 1 and r.hhi == 1.0 and r.top_share == 1.0


def test_concentration_reuses_per_key_exchange(spark):
    """The top-k and the totals branches must reuse the per-key
    aggregate's exchange (AQE ReusedExchange) — two scans of the
    source would double the dominant cost."""
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )
    rep = skew.concentration_report(df, "k", "v")
    rep.collect()
    node = rep._jdf.queryExecution().executedPlan()
    try:
        node = node.finalPhysicalPlan()
    except Exception:
        pass
    assert "ReusedExchange" in node.toString()


def test_fk_checks_orphans_and_nulls(spark):
    from sparkprep.operators import expect

    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=None), Row(fk=9)], "fk long"
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)], "pk long")
    rep = expect.fk_checks([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert rep.child_rows == 4
    assert rep.null_keys == 1  # NULL is not an orphan
    assert rep.orphans == 1 and not rep.ok


def test_fk_checks_intact_edge_and_empty_raises(spark):
    from sparkprep.operators import expect

    child = spark.createDataFrame([Row(fk=1)], "fk long")
    parent = spark.createDataFrame([Row(pk=1), Row(pk=1)], "pk long")
    rep = expect.fk_checks([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert rep.orphans == 0 and rep.ok
    with pytest.raises(ValueError):
        expect.fk_checks([])


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_attribution_window_and_ties(spark):
    from sparkprep.operators import temporal

    conv = spark.createDataFrame(
        [
            Row(u=1, ts=_ts("2024-01-10 12:00:00"), v=10.0),  # click 1h before
            Row(u=1, ts=_ts("2024-01-20 12:00:00"), v=20.0),  # touch 9d old -> none
            Row(u=2, ts=_ts("2024-01-10 12:00:00"), v=30.0),  # no touches -> none
            Row(u=3, ts=_ts("2024-01-10 12:00:00"), v=40.0),  # tie at exact ts
        ],
        "u long, ts timestamp, v double",
    )
    tch = spark.createDataFrame(
        [
            Row(u=1, ts=_ts("2024-01-10 11:00:00"), ch="click"),
            Row(u=3, ts=_ts("2024-01-10 12:00:00"), ch="view"),
        ],
        "u long, ts timestamp, ch string",
    )
    out = {
        (r.u, r.ts): r.attributed_channel
        for r in temporal.last_touch_attribution(
            conv, tch, "u", "ts", "ch", lookback="7 days"
        ).collect()
    }
    assert out[(1, _ts("2024-01-10 12:00:00"))] == "click"
    assert out[(1, _ts("2024-01-20 12:00:00"))] == "(none)"  # 10d gap
    assert out[(2, _ts("2024-01-10 12:00:00"))] == "(none)"
    assert out[(3, _ts("2024-01-10 12:00:00"))] == "view"  # equal-ts tie


def test_attribution_exact_lookback_boundary_inclusive(spark):
    from sparkprep.operators import temporal

    conv = spark.createDataFrame(
        [Row(u=1, ts=_ts("2024-01-08 00:00:00"), v=1.0)],
        "u long, ts timestamp, v double",
    )
    tch = spark.createDataFrame(
        [Row(u=1, ts=_ts("2024-01-01 00:00:00"), ch="view")],
        "u long, ts timestamp, ch string",
    )
    row = temporal.last_touch_attribution(
        conv, tch, "u", "ts", "ch", lookback="7 days"
    ).collect()[0]
    assert row.attributed_channel == "view"  # gap == lookback attributes
