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
