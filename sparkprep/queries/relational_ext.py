"""Round-2 relational extensions: MERGE-INTO upsert semantics,
correlation matrix EDA, and unpivot/melt reshaping — operators a
reference user reaches for next once the §2 surface is covered, each
with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkprep.operators import transform
from sparkprep.queries import t


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE: every 10th customer gets an updated balance +
    segment (update rows win wholesale, nulls included), five brand-new
    keys insert — one full-outer join + coalesce, the format-free
    MERGE INTO."""
    cust = t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(F.lit("UPD-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.round(F.col("c_acctbal") + 1000.0, 2).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    inserts = cust.filter(F.col("c_custkey") < 5).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.lit("NEW CUSTOMER").alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return transform.merge_upsert(
        cust, updates.unionByName(inserts), key_cols=["c_custkey"]
    )


_MERGE_UPSERT_SQL = """
WITH updates AS (
  SELECT c_custkey, 'UPD-' || c_name AS c_name, c_nationkey,
         round(c_acctbal + 1000.0, 2) AS c_acctbal, 'UPDATED' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW CUSTOMER', c_nationkey, 0.0, 'NEW'
  FROM customer WHERE c_custkey < 5
)
SELECT coalesce(u.c_custkey, t.c_custkey) AS c_custkey,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
FROM customer t FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
"""


def q_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numerics in ONE
    fused aggregate job (the EDA correlation matrix — the reference
    eyeballed scatter relationships column by column; A7-adjacent)."""
    li = t(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
    ]
    return li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"corr_{a[2:]}_{b[2:]}")
            for a, b in pairs
        ]
    )


_CORRELATIONS_SQL = """
SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_quantity_extendedprice,
       round(corr(l_quantity, l_discount), 4) AS corr_quantity_discount,
       round(corr(l_extendedprice, l_discount), 4) AS corr_extendedprice_discount,
       round(corr(l_extendedprice, l_tax), 4) AS corr_extendedprice_tax
FROM lineitem
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping (``DataFrame.unpivot`` / melt): lineitem
    measure columns to (metric, value) rows — the inverse of the pivot
    query, a projection-only operator (no shuffle at all)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_discount").cast("double").alias("l_discount"),
        F.col("l_tax").cast("double").alias("l_tax"),
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, metric, value
FROM (
  SELECT l_orderkey, l_linenumber,
         l_quantity::DOUBLE AS l_quantity,
         l_discount::DOUBLE AS l_discount,
         l_tax::DOUBLE AS l_tax
  FROM lineitem WHERE l_orderkey < 100
)
UNPIVOT (value FOR metric IN (l_quantity, l_discount, l_tax))
"""


def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-rank feature scaling per event type (rank-based
    normalization is outlier-immune where min-max isn't) — one keyed
    window, deterministic under ties by definition."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 4).alias("value_pr"),
    )


_PERCENT_RANK_SQL = """
SELECT event_id, event_type,
       round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 4) AS value_pr
FROM events
"""


QUERIES = {
    "merge_upsert": q_merge_upsert,
    "correlations": q_correlations,
    "unpivot": q_unpivot,
    "percent_rank": q_percent_rank,
}

ORACLES = {
    "merge_upsert": _MERGE_UPSERT_SQL,
    "correlations": _CORRELATIONS_SQL,
    "unpivot": _UNPIVOT_SQL,
    "percent_rank": _PERCENT_RANK_SQL,
}
