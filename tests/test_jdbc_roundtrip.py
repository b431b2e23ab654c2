"""K2/S6 — JDBC write + read-back round-trip against embedded Derby
(the jar ships with Spark), reproducing the reference's MSSQL
reconciliation pattern (mssql.ipynb:862-958: write, read back, compare
count and describe profile)."""

import pytest
from pyspark.sql import functions as F

from sparkprep.sources import readers, writers

URL = "jdbc:derby:memory:sparkprep;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .limit(500)
        .cache()
    )


def test_jdbc_write_readback_reconciles(spark, sample):
    writers.write_jdbc(
        sample, url=URL, table="orders_rt", mode="overwrite", driver=DRIVER, batchsize=100
    )
    back = readers.read_jdbc(spark, url=URL, table="orders_rt", driver=DRIVER)
    assert back.count() == sample.count()
    prof = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("s"),
        F.min("o_orderkey").alias("mn"),
        F.max("o_orderkey").alias("mx"),
    ).collect()[0]
    assert prof(back) == prof(sample)


def test_jdbc_partitioned_read(spark, sample):
    writers.write_jdbc(
        sample, url=URL, table="orders_part", mode="overwrite", driver=DRIVER
    )
    lo, hi = sample.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    back = readers.read_jdbc(
        spark, url=URL, table="orders_part", driver=DRIVER,
        partition_column="o_orderkey", num_partitions=4,
        lower_bound=lo, upper_bound=hi + 1,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == sample.count()