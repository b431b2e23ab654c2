"""NULL-semantics edge shapes for the Arrow-grouped operators: the
pandas path must emit SQL NULL (not NaN) exactly where the native
window/aggregate oracle would — single-row groups, zero variance,
no-positive-value groups. These shapes don't occur in the testdata SFs,
so the oracle replay can't see them; pinned here instead."""

from pyspark.sql import functions as F  # noqa: F401

from sparkprep.operators import grouped


def test_zscore_single_row_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 4.0)], ["k", "v"]
    )
    out = grouped.grouped_zscore(df, ["k"], "v")
    got = {(r.k, r.v): r.zscore for r in out.collect()}
    assert got[("a", 1.0)] is None          # n=1 -> stddev_samp NULL
    assert got[("b", 2.0)] is not None


def test_zscore_zero_variance_group_is_null(spark):
    df = spark.createDataFrame([("a", 3.0), ("a", 3.0)], ["k", "v"])
    out = grouped.grouped_zscore(df, ["k"], "v")
    assert all(r.zscore is None for r in out.collect())


def test_gmean_no_positive_values_is_null(spark):
    df = spark.createDataFrame(
        [("a", -1.0), ("a", 0.0), ("b", 2.0), ("b", 8.0)], ["k", "v"]
    )
    out = grouped.grouped_geometric_mean(df, ["k"], "v")
    got = {r.k: r.gmean for r in out.collect()}
    assert got["a"] is None
    assert abs(got["b"] - 4.0) < 1e-9
