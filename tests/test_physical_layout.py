"""Physical-layout techniques from the scale brief: bucketed co-located
joins (no exchange) and partition pruning (no I/O for pruned values) —
asserted on the actual plans."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkprep.sources.writers import write_bucketed, write_partitioned


def _simple(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).select("o_orderkey", "l_quantity")
        plan = _simple(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # correctness unchanged
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partition_pruning(spark, sf_dir):
    from sparkprep.queries import t as load_table

    out = tempfile.mkdtemp(prefix="sparkprep-part-")
    try:
        ev = load_table(spark, sf_dir, "events")
        write_partitioned(ev, out, ["event_type"])
        back = spark.read.parquet(out)
        q = back.filter(F.col("event_type") == "click").select("event_id")
        plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
        assert "PartitionFilters: [isnotnull(event_type" in plan
        # pruning is real: only the click partition's rows are read
        clicks = ev.filter(F.col("event_type") == "click").count()
        assert q.count() == clicks
    finally:
        shutil.rmtree(out, ignore_errors=True)