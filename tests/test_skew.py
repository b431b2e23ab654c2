"""Salting operators: semantics identical to unsalted forms (the whole
point), on data with an engineered hot key."""

import pytest
from pyspark.sql import functions as F

from sparkprep.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one key — the shape that melts a single reducer
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_agg_equals_plain(skewed):
    plain = {
        r.k: (r.n, round(r.s, 6), round(r.a, 6), r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.avg("v").alias("a"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, round(r.s, 6), round(r.a, 6), r.mx)
        for r in skew.salted_agg(
            skewed, ["k"],
            {"n": "count(*)", "s": "sum(v)", "a": "avg(v)", "mx": "max(v)"},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "one"), ("k2", "two")], ["k", "label"]
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = skew.salted_join(skewed, dim, on="k", salt_buckets=4).groupBy(
        "k", "label"
    ).count()
    p = {(r.k, r.label): r["count"] for r in plain.collect()}
    s = {(r.k, r.label): r["count"] for r in salted.collect()}
    assert s == p


def test_salted_agg_rejects_unknown_fn(skewed):
    with pytest.raises(ValueError):
        skew.salted_agg(skewed, ["k"], {"x": "median(v)"})

def test_join_size_estimate_hand_computed(spark):
    from pyspark.sql import Row
    from sparkprep.operators import skew

    left = spark.createDataFrame(
        [Row(k=1)] * 3 + [Row(k=2)] * 2 + [Row(k=9)], "k long"
    )
    right = spark.createDataFrame(
        [Row(k=1)] * 4 + [Row(k=2)] * 1 + [Row(k=7)], "k long"
    )
    r = skew.join_size_estimate(left, right, "k").collect()[0]
    assert (r.n_keys_left, r.n_keys_right, r.n_matching_keys) == (3, 3, 2)
    assert r.predicted_rows == 3 * 4 + 2 * 1  # exact inner-join cardinality
    assert r.top_key == 1 and r.top_key_rows == 12
    assert r.top_share == round(12 / 14, 6)
    # forecast equals reality
    assert left.join(right, "k").count() == r.predicted_rows


def test_join_size_estimate_no_overlap_single_row(spark):
    from pyspark.sql import Row
    from sparkprep.operators import skew

    left = spark.createDataFrame([Row(k=1)], "k long")
    right = spark.createDataFrame([Row(k=2)], "k long")
    out = skew.join_size_estimate(left, right, "k").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_matching_keys == 0 and r.predicted_rows is None
    assert r.top_key is None and r.top_share is None
