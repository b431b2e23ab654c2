"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``    — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Conventions to keep the DuckDB value-hash comparison stable:
- every computed column is aliased identically in Spark and SQL;
- float aggregates are ``round()``-ed on both sides (summation order
  differs between engines at the 1e-12 level);
- computed integers are cast to BIGINT on both sides (Spark ``size``/
  ``row_number`` yield INT, DuckDB yields BIGINT);
- session timezone is pinned UTC before timestamp queries.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkprep.session import tune_for_engine
from sparkprep.operators import clean, profile
from sparkprep.functions import numeric as npx

DEFAULT_SF = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Queries — each takes (spark, sf_dir) and returns a DataFrame
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary (A2/A4-class fused aggs).

    Single shuffle on (l_returnflag, l_linestatus); all eight aggregates
    are partial-aggregatable so the map side combines before exchange.
    """
    tune_for_engine(spark)
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_freq_orderpriority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 — frequency table with derived percent (bde4.ipynb#cell31)."""
    orders = _t(spark, sf_dir, "orders")
    return profile.freq(orders, "o_orderpriority", with_percent=True).select(
        "o_orderpriority",
        F.col("count").cast("long").alias("count"),
        F.round("percent", 6).alias("percent"),
    )


_Q_FREQ_SQL = """
SELECT o_orderpriority,
       count(*) AS count,
       round(count(*)::DOUBLE / (SELECT count(*) FROM orders), 6) AS percent
FROM orders
GROUP BY o_orderpriority
ORDER BY count DESC, o_orderpriority
"""


_LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
]


def q_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/N7 — per-column null counts in one pass (nulls.ipynb#cell5)."""
    li = _t(spark, sf_dir, "lineitem")
    return profile.null_census_long(li).select(
        F.col("column").alias("col_name"),
        "null_count",
        F.round("null_frac", 6).alias("null_frac"),
    )


_Q_NULL_CENSUS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, "
    f"count(*) FILTER (WHERE {c} IS NULL)::BIGINT AS null_count, "
    f"round(count(*) FILTER (WHERE {c} IS NULL)::DOUBLE / count(*), 6) AS null_frac "
    f"FROM lineitem"
    for c in _LINEITEM_COLS
)


_DESCRIBE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_describe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — describe() as ONE fused aggregate, long form (SURVEY §4)."""
    li = _t(spark, sf_dir, "lineitem")
    return profile.describe_long(li, _DESCRIBE_COLS, round_to=4).select(
        F.col("column").alias("col_name"), "count", "mean", "stddev", "min", "max"
    )


_Q_DESCRIBE_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, count({c})::BIGINT AS count, "
    f"round(avg({c}), 4) AS mean, round(stddev({c}), 4) AS stddev, "
    f"round(min({c})::DOUBLE, 4) AS min, round(max({c})::DOUBLE, 4) AS max "
    f"FROM lineitem"
    for c in _DESCRIBE_COLS
)


def q_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+A2/A4 — occurrence-id histogram: the dedup audit trail
    (dedup.ipynb:2208). Counts are deterministic even though row identity
    within a window tie is not (SURVEY §7)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    audit = clean.dup_audit(li, keys=["l_partkey", "l_suppkey"], order_by="l_partkey")
    return audit.select(
        F.col("occur_id").cast("long").alias("occur_id"),
        F.col("count").cast("long").alias("count"),
    )


_Q_DEDUP_AUDIT_SQL = """
WITH t AS (
  SELECT row_number() OVER (PARTITION BY l_partkey, l_suppkey ORDER BY l_partkey) AS occur_id
  FROM lineitem
)
SELECT occur_id::BIGINT AS occur_id, count(*) AS count
FROM t GROUP BY occur_id ORDER BY occur_id
"""


def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET4 — keep-first dedup via occur_id <= 1 (dedup.ipynb:8904).
    Projected to the partition keys so the result is deterministic
    (≡ DISTINCT), per SURVEY §7 'hard parts'."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return clean.dedup_window(li, keys=["l_partkey", "l_suppkey"], order_by="l_partkey")


_Q_WINDOW_DEDUP_SQL = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


def q_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 — min-max normalization as native arithmetic over a global
    window (no driver round-trip; reference did 4 collect()s + a UDF,
    loanStat.py:241-287)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = npx.minmax_normalize_distributed(cust, "c_acctbal", suffix="_norm")
    return out.select(
        "c_custkey", F.round("c_acctbal_norm", 6).alias("acctbal_norm")
    )


_Q_MINMAX_SQL = """
SELECT c_custkey,
       round((c_acctbal - min(c_acctbal) OVER ())
             / (max(c_acctbal) OVER () - min(c_acctbal) OVER ()), 6) AS acctbal_norm
FROM customer
"""


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, DEFAULT_SF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "freq_orderpriority": q_freq_orderpriority,
        "null_census": q_null_census,
        "describe_lineitem": q_describe_lineitem,
        "dedup_audit": q_dedup_audit,
        "window_dedup": q_window_dedup,
        "minmax_normalize": q_minmax_normalize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": _Q_PRICING_SQL,
        "freq_orderpriority": _Q_FREQ_SQL,
        "null_census": _Q_NULL_CENSUS_SQL,
        "describe_lineitem": _Q_DESCRIBE_SQL,
        "dedup_audit": _Q_DEDUP_AUDIT_SQL,
        "window_dedup": _Q_WINDOW_DEDUP_SQL,
        "minmax_normalize": _Q_MINMAX_SQL,
    }
