"""Streaming CDC → SCD2 dimension maintenance: micro-batches merged
through foreach_batch_scd2 must equal the same batches applied
sequentially with the batch operator, the snapshot pointer must only
ever expose committed merges, and a replayed batch must be a no-op."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkprep.operators import transform
from sparkprep.streaming import scd


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="sparkprep-scd-")
    yield {
        "in": os.path.join(d, "in"),
        "store": os.path.join(d, "store"),
        "ckpt": os.path.join(d, "ckpt"),
    }
    shutil.rmtree(d, ignore_errors=True)


def _initial(spark):
    rows = [
        Row(k=i, city=f"c{i}", valid_from="2024-01-01",
            valid_to=None, is_current=True)
        for i in range(5)
    ]
    return spark.createDataFrame(
        rows,
        "k: long, city: string, valid_from: string, valid_to: string, "
        "is_current: boolean",
    )


def _updates(spark, rows):
    return spark.createDataFrame(rows, "k: long, city: string, effective_ts: string")


def _land(spark, rows, in_dir, name):
    scd.land_cdc_files(_updates(spark, rows), in_dir, name)


def _drain(spark, dirs):
    stream = (
        spark.readStream.schema("k long, city string, effective_ts string")
        .parquet(dirs["in"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .foreachBatch(scd.foreach_batch_scd2(dirs["store"], ["k"]))
        .option("checkpointLocation", dirs["ckpt"])
        .start()
    )
    q.awaitTermination()


def _table(df):
    return sorted(map(tuple, df.select(
        "k", "city", "valid_from", "valid_to", "is_current").collect()))


class TestStreamingScd2:
    def test_two_batches_match_sequential_batch_merge(self, spark, dirs):
        os.makedirs(dirs["in"])
        init = _initial(spark)
        scd.init_dimension(init, dirs["store"])

        b1 = [Row(k=1, city="x1", effective_ts="2024-02-01"),   # change
              Row(k=2, city="c2", effective_ts="2024-02-01"),   # no-op
              Row(k=9, city="new", effective_ts="2024-02-01")]  # insert
        _land(spark, b1, dirs["in"], "b1")
        _drain(spark, dirs)

        b2 = [Row(k=1, city="x2", effective_ts="2024-03-01"),   # change again
              Row(k=3, city="y3", effective_ts="2024-03-01")]   # change
        _land(spark, b2, dirs["in"], "b2")
        _drain(spark, dirs)

        got = scd.read_dimension(spark, dirs["store"])
        want = transform.merge_scd2(
            transform.merge_scd2(init, _updates(spark, b1), ["k"]),
            _updates(spark, b2), ["k"],
        )
        assert _table(got) == _table(want)
        # k=1 burned through three versions: two closed + one current
        k1 = got.filter(F.col("k") == 1)
        assert k1.count() == 3
        assert k1.filter("is_current").collect()[0]["city"] == "x2"
        # retention: only current + previous snapshots survive — without
        # pruning the store holds one full dimension copy per batch
        snaps = sorted(
            n for n in os.listdir(dirs["store"]) if n.startswith("snap-")
        )
        assert len(snaps) == 2, snaps

    def test_intra_batch_versions_collapse_to_latest(self, spark, dirs):
        os.makedirs(dirs["in"])
        scd.init_dimension(_initial(spark), dirs["store"])
        b = [Row(k=1, city="mid", effective_ts="2024-02-01"),
             Row(k=1, city="late", effective_ts="2024-05-01")]
        _land(spark, b, dirs["in"], "b")
        _drain(spark, dirs)
        k1 = scd.read_dimension(spark, dirs["store"]).filter(F.col("k") == 1)
        # micro-batch granularity: 'mid' never became a version
        assert sorted(r["city"] for r in k1.collect()) == ["c1", "late"]
        assert k1.filter("is_current").collect()[0]["city"] == "late"

    def test_replayed_batch_is_noop_and_pointer_committed(self, spark, dirs):
        os.makedirs(dirs["in"])
        scd.init_dimension(_initial(spark), dirs["store"])
        b = [Row(k=1, city="x1", effective_ts="2024-02-01")]
        _land(spark, b, dirs["in"], "b")
        _drain(spark, dirs)
        snapshot = _table(scd.read_dimension(spark, dirs["store"]))
        # replay the same batch id directly (restart redelivery path)
        sink = scd.foreach_batch_scd2(dirs["store"], ["k"])
        sink(_updates(spark, b), 0)
        assert _table(scd.read_dimension(spark, dirs["store"])) == snapshot
        # a fresh drain with the same checkpoint and no new files also
        # leaves the committed pointer alone
        _drain(spark, dirs)
        assert _table(scd.read_dimension(spark, dirs["store"])) == snapshot
