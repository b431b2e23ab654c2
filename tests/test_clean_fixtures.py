"""Golden-behavior tests on the reference's own toy fixtures
(FIXTURES.md F1/F2; data values from nulls.ipynb#cell2 and
dupwin.ipynb#cell1 — kept literal so outputs reconcile against the
notebook cell outputs)."""

import pytest
from pyspark.sql import functions as F

from sparkprep.operators import clean, profile

F1_ROWS = [
    ("Store 1", 1, 448),
    ("Store 1", 2, None),
    ("Store 1", 3, 499),
    ("Store 1", 44, 432),
    (None, None, None),
    ("Store 2", 1, 355),
    ("Store 2", 1, 355),
    ("Store 2", None, 345),
    ("Store 2", 3, 387),
    ("Store 2", 4, 312),
]
F1_COLS = ["Store", "WeekInMonth", "Revenue"]

F2_ROWS = [
    ("James", "Sales", 3000),
    ("Michael", "Sales", 4600),
    ("Robert", "Sales", 4100),
    ("Maria", "Finance", 3000),
    ("James", "Sales", 3000),
    ("Scott", "Finance", 3300),
    ("Jen", "Finance", 3900),
    ("Jeff", "Marketing", 3000),
    ("Kumar", "Marketing", 2000),
    ("Saif", "Sales", 4100),
]
F2_COLS = ["employee_name", "department", "salary"]


@pytest.fixture(scope="module")
def store_df(spark):
    return spark.createDataFrame(F1_ROWS, F1_COLS)


@pytest.fixture(scope="module")
def emp_df(spark):
    return spark.createDataFrame(F2_ROWS, F2_COLS)


# --- null census / any-null rows (A8/F5, nulls.ipynb#cell5-6) -------------


def test_null_census(store_df):
    row = profile.null_census(store_df).collect()[0]
    assert row.asDict() == {"Store": 1, "WeekInMonth": 2, "Revenue": 2}


def test_rows_with_nulls(store_df):
    assert profile.rows_with_nulls(store_df).count() == 3


# --- dropna variants (N1-N3, nulls.ipynb#cell7-8) -------------------------


def test_dropna_all_removes_only_allnull_row(store_df):
    assert clean.drop_nulls(store_df, how="all").count() == 9


def test_dropna_any(store_df):
    assert clean.drop_nulls(store_df, how="any").count() == 7


def test_dropna_subset(store_df):
    out = clean.drop_nulls(store_df, how="any", subset=["Store", "WeekInMonth"])
    assert out.count() == 8


# --- fillna variants (N4, nulls.ipynb#cell10-12) --------------------------


def test_fillna_single_column(store_df):
    out = clean.fill_nulls(store_df, 0, ["Revenue"])
    assert out.filter(F.col("Revenue") == 0).count() == 2
    assert out.filter(F.col("WeekInMonth").isNull()).count() == 2


def test_fillna_dict_coercion(store_df):
    # Divergence note (SURVEY §7 hard parts): Spark 3.1.2 silently
    # IGNORED string '2' for the numeric column; Spark 4 casts and
    # applies it. We assert current-Spark semantics.
    out = clean.fill_nulls(store_df, {"Store": "Unknown", "WeekInMonth": "2", "Revenue": 3})
    assert out.filter(F.col("Store") == "Unknown").count() == 1
    assert out.filter(F.col("WeekInMonth").isNull()).count() == 0  # coerced+filled
    assert out.filter(F.col("WeekInMonth") == 2).count() == 3
    assert out.filter(F.col("Revenue") == 3).count() == 2


# --- imputation (N5/N6, bde4#cell43, nulls.ipynb#cell13-15) ----------------


def test_impute_mean(store_df):
    out = clean.impute(store_df, "Revenue", strategy="mean")
    mean = sum(r for _, _, r in F1_ROWS if r is not None) / 8
    got = {r.Revenue for r in out.filter(F.col("WeekInMonth").isNull()).collect()}
    assert got == {mean, 345.0}


def test_impute_median_fit_on_subpopulation(store_df):
    # nulls.ipynb#cell13-15: fit median on Store 1 only, apply globally
    out = clean.impute(
        store_df, "Revenue", strategy="median", fit_filter=F.col("Store") == "Store 1"
    )
    filled = out.filter(F.col("Store").isNull()).collect()[0].Revenue
    assert filled in (432, 448)  # Store 1 revenues: 448, 499, 432 -> median 448


# --- duplicates (SET2-SET4, W1/W2) ----------------------------------------


def test_drop_duplicates_exact(store_df):
    # dropdup.ipynb#cell4: ('Store 2',1,355) x2 collapses
    assert clean.dedup_exact(store_df).count() == 9


def test_occurrence_window_matches_reference(emp_df):
    # dupwin.ipynb#cell3: James/Sales/3000 duplicated -> occur_id 1,2
    withid = clean.add_occurrence_id(
        emp_df, keys=["employee_name"], order_by="salary"
    )
    james = withid.filter(F.col("employee_name") == "James").collect()
    assert sorted(r.occur_id for r in james) == [1, 2]


def test_window_dedup_audit_conservation(emp_df):
    audit = clean.dup_audit(emp_df, keys=F2_COLS, order_by="salary")
    rows = {r.occur_id: r["count"] for r in audit.collect()}
    assert rows == {1: 9, 2: 1}
    assert clean.conservation_check(audit, expected_total=10)


def test_window_dedup_keep_first(emp_df):
    deduped = clean.dedup_window(emp_df, keys=F2_COLS, order_by="salary")
    assert deduped.count() == 9
    assert clean.dedup_exact(deduped).count() == 9  # idempotence (dedup.ipynb:8944)


# --- validator (X7/F6, dedup+invalid.ipynb:9322,9588) ---------------------


def test_validator_report_counts(spark):
    df = spark.createDataFrame(
        [("12.74%",), ("5.31%",), ("bad",), (None,)], ["int_rate"]
    )
    v = clean.Validator([clean.Rule("int_rate", r"\d+.\d+%")])
    rep = v.report(df)
    assert rep.counts["int_rate"] == {"valid": 2, "invalid": 2, "null": 1}
    labeled = v.apply(df)
    assert labeled.filter(F.col("int_rate_validity") == "valid").count() == 2


def test_validator_repair_cycle(spark):
    df = spark.createDataFrame([("12.74%",), ("5.31%",)], ["int_rate"])
    repaired = clean.repair_percent_column(df, "int_rate")
    vals = sorted(r.int_rate for r in repaired.collect())
    assert vals == [5.31, 12.74]

# --- sampling determinism (SA1/SA2, SURVEY §7 quarantine) ------------------


def test_seeded_sample_deterministic(spark, sf_dir):
    from sparkprep.operators import transform

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = transform.downsample_class(orders, "o_orderstatus", "O", 0.3, seed=42)
    b = transform.downsample_class(orders, "o_orderstatus", "O", 0.3, seed=42)
    assert sorted(r.o_orderkey for r in a.collect()) == sorted(
        r.o_orderkey for r in b.collect()
    )


def test_seeded_split_deterministic_and_partitions(spark, sf_dir):
    from sparkprep.operators import transform

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    tr1, te1 = transform.train_test_split(orders, (0.8, 0.2), seed=7)
    tr2, te2 = transform.train_test_split(orders, (0.8, 0.2), seed=7)
    assert tr1.count() == tr2.count() and te1.count() == te2.count()
    assert tr1.count() + te1.count() == orders.count()


# --- profile report + delta (A7/A8 composition, SURVEY §5) -----------------


def test_profile_report_and_delta(store_df):
    before = profile.profile_report(store_df)
    assert before["rows"] == 10
    assert before["null_counts"]["Revenue"] == 2
    after_df = clean.drop_nulls(store_df, how="any")
    after = profile.profile_report(after_df)
    delta = profile.profile_delta(before, after)
    assert delta["row_delta"] == -3
    assert delta["null_deltas"]["Revenue"] == -2
    assert delta["columns_added"] == [] and delta["columns_removed"] == []
    assert "Revenue" in delta["stat_deltas"]


def test_stratified_sample_deterministic(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fr = {"O": 0.1, "F": 0.5, "P": 1.0}
    a = orders.sampleBy("o_orderstatus", fractions=fr, seed=42)
    b = orders.sampleBy("o_orderstatus", fractions=fr, seed=42)
    assert sorted(r.o_orderkey for r in a.collect()) == sorted(
        r.o_orderkey for r in b.collect()
    )
    # P stratum: fraction 1.0 keeps every row
    p_all = orders.filter(F.col("o_orderstatus") == "P").count()
    p_kept = a.filter(F.col("o_orderstatus") == "P").count()
    assert p_kept == p_all


def test_pivot_table_explicit_values(spark):
    from sparkprep.operators import transform

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 10.0), ("b", "y", 5.0)],
        ["g", "p", "v"],
    )
    out = transform.pivot_table(
        df, "g", "p", ["x", "y", "z"], "v", lambda c: F.sum(c),
        names={"z": "never_seen"},
    ).orderBy("g")
    assert out.columns == ["g", "x", "y", "never_seen"]
    rows = out.collect()
    # missing (g,p) combinations and never-observed pivot values -> null
    assert (rows[0].x, rows[0].y, rows[0].never_seen) == (3.0, 10.0, None)
    assert (rows[1].x, rows[1].y, rows[1].never_seen) == (None, 5.0, None)


def test_k_anonymity_report_classes_and_level(spark):
    from sparkprep.operators import profile

    rows = (
        [("US", "A")] * 3
        + [("US", "B")] * 7
        + [("DE", "A")] * 1
        + [(None, "B")] * 2  # null QI combo is its own cohort
    )
    df = spark.createDataFrame(rows, ["nation", "segment"])
    out = profile.k_anonymity_report(df, ["nation", "segment"], k=5)
    got = {(r.nation, r.segment): r for r in out.collect()}
    assert got[("US", "A")].class_size == 3 and got[("US", "A")].at_risk
    assert got[("US", "B")].class_size == 7 and not got[("US", "B")].at_risk
    assert got[("DE", "A")].class_size == 1 and got[("DE", "A")].at_risk
    assert got[(None, "B")].class_size == 2 and got[(None, "B")].at_risk
    # dataset-wide k_level = min class size, same on every row
    assert {r.k_level for r in got.values()} == {1}


def test_target_encode_shrinks_rare_toward_prior(spark):
    from sparkprep.operators import features

    rows = [("a", 10.0)] * 50 + [("b", 0.0)] * 2 + [(None, 5.0)] * 3
    df = spark.createDataFrame(rows, ["cat", "y"])
    out = features.target_encode(df, "cat", "y", smoothing=20.0)
    got = {r.cat: r.cat_enc for r in out.dropDuplicates(["cat"]).collect()}
    prior = (50 * 10.0 + 0.0 + 3 * 5.0) / 55  # 9.3636...
    # frequent category stays near its empirical mean
    assert abs(got["a"] - (500 + 20 * prior) / 70) < 1e-6
    # rare category shrinks hard toward the prior (empirical mean is 0)
    assert abs(got["b"] - (0 + 20 * prior) / 22) < 1e-6
    assert got["b"] > 8.0
    # NULL level survives the join-back with its own encoding
    assert None in got and got[None] is not None
    assert out.count() == 55


def test_collapse_rare_threshold_and_null(spark):
    from sparkprep.operators import transform

    rows = [("x",)] * 5 + [("y",)] * 2 + [(None,)] * 2
    df = spark.createDataFrame(rows, ["cat"])
    out = transform.collapse_rare(df, "cat", min_count=3, other_label="OTHER")
    got = {(r.cat, r.cat_collapsed) for r in out.collect()}
    assert got == {("x", "x"), ("y", "OTHER"), (None, None)}
    assert out.count() == 9


def test_impute_mode_grouped_nullsafe_and_allnull_group(spark):
    # Group "a": mode is "x" (2 vs 1). Group NULL must keep its own
    # mode (null-safe join), tie in group "b" breaks by value asc,
    # and an all-NULL group invents no category.
    rows = [
        ("a", "x"), ("a", "x"), ("a", "y"), ("a", None),
        (None, "z"), (None, None),
        ("b", "q"), ("b", "p"), ("b", None),
        ("c", None), ("c", None),
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = clean.impute_mode(df, "v", group_cols=["g"])
    got = [(r.g, r.v) for r in out.collect()]
    assert got.count(("a", "x")) == 3  # NULL filled with mode x
    assert got.count((None, "z")) == 2  # null-group filled null-safely
    assert got.count(("b", "p")) == 2  # tie p/q -> value asc picks p
    assert got.count(("c", None)) == 2  # all-NULL group stays NULL


def test_impute_mode_global(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), (None,)], ["v"]
    )
    out = clean.impute_mode(df, "v")
    assert sorted(r.v for r in out.collect()) == ["x", "x", "x", "y"]


def test_impute_mode_global_all_null_keeps_rows(spark):
    # an all-NULL column yields an EMPTY modes frame; the ungrouped path
    # must NOT cross-join it away — rows survive with their NULLs
    from pyspark.sql.types import StringType, StructField, StructType

    df = spark.createDataFrame(
        [(None,), (None,)], StructType([StructField("v", StringType())])
    )
    out = clean.impute_mode(df, "v")
    assert [r.v for r in out.collect()] == [None, None]
