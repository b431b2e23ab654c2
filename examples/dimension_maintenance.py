"""Warehouse maintenance as a runnable job: CDC batches streamed into
an SCD2 dimension via the snapshot-and-swap foreachBatch sink, then a
day-level rollup maintained INCREMENTALLY (delta merge) and proven
identical to a full recompute.

    python examples/dimension_maintenance.py [sf_dir]

Demonstrates the two halves of "don't rescan the warehouse":
- history: each CDC micro-batch SCD2-merges against only the CURRENT
  rows, committed as a new snapshot + pointer swap (restart replays
  are no-ops);
- rollups: the new day's partial aggregate folds into the maintained
  view with one join over two aggregate tables (count/sum/min/max are
  mergeable; DECIMAL sums keep the merge bit-exact).
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkprep.operators import transform  # noqa: E402
from sparkprep.queries import t  # noqa: E402
from sparkprep.session import build_session  # noqa: E402
from sparkprep.streaming import scd  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def land(df, in_dir, name):
    scd.land_cdc_files(df, in_dir, name)


if __name__ == "__main__":
    spark = build_session(app_name="dimension-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dim-maint-")
    in_dir, store, ckpt = (os.path.join(work, d) for d in ("in", "store", "ckpt"))
    os.makedirs(in_dir)

    # 1. bootstrap the SCD2 dimension from the customer table
    cust = t(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    initial = cust.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    scd.init_dimension(initial, store)
    print(f"dimension bootstrapped: {initial.count()} current rows")

    # 2. two CDC days: segment moves + balance updates
    cdc_schema = (
        "c_custkey long, c_mktsegment string, c_acctbal double, "
        "effective_ts string"
    )
    day1 = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("MACHINERY").alias("c_mktsegment"),
        (F.col("c_acctbal") + 10.0).alias("c_acctbal"),
        F.lit("2024-02-01").alias("effective_ts"),
    )
    day2 = cust.filter(F.col("c_custkey") % 14 == 0).select(
        "c_custkey",
        F.lit("FURNITURE").alias("c_mktsegment"),
        "c_acctbal",
        F.lit("2024-03-01").alias("effective_ts"),
    )

    def drain():
        q = (
            spark.readStream.schema(cdc_schema).parquet(in_dir)
            .writeStream.outputMode("append")
            .trigger(availableNow=True)
            .foreachBatch(
                scd.foreach_batch_scd2(store, ["c_custkey"])
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    land(day1, in_dir, "day1")
    drain()
    land(day2, in_dir, "day2")
    drain()

    dim = scd.read_dimension(spark, store)
    hist = dim.groupBy("is_current").count().orderBy("is_current")
    print("dimension after 2 CDC days (closed vs current):")
    hist.show()
    twice = dim.filter(F.col("c_custkey") % 14 == 0).groupBy("c_custkey").count()
    print(
        "keys changed twice now carry 3 versions:",
        twice.filter("count = 3").count(), "of", twice.count(),
    )

    # 3. incremental rollup maintenance: fold one day's delta into the
    #    maintained view; prove it equals the full recompute
    ev = t(spark, SF_DIR, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    days = [r["day"] for r in ev.select("day").distinct().orderBy("day").collect()]
    base_days, delta_day = days[:-1], days[-1]

    def rollup(df):
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )

    maintained = transform.merge_aggregates(
        rollup(ev.filter(F.col("day").isin(base_days))),
        rollup(ev.filter(F.col("day") == delta_day)),
        ["event_type", "day"],
        {"n": "sum", "total": "sum"},
    )
    recomputed = rollup(ev)
    diff = maintained.exceptAll(recomputed).count() + recomputed.exceptAll(
        maintained
    ).count()
    print(
        f"rollup maintained over {len(base_days)} base days + 1 delta day: "
        f"{maintained.count()} rows, diff vs full recompute = {diff}"
    )
    assert diff == 0

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
