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