"""Z-order layout quality and training-mix resampling semantics —
the properties the value-hash oracle can't see.
"""

from pyspark.sql import functions as F

from sparkprep.functions import zorder
from sparkprep.operators import mix
from sparkprep.queries import t


def test_morton_interleaves_exactly(spark):
    df = spark.createDataFrame([(3, 5)], "x int, y int")
    # x=0b011 -> even bit positions; y=0b101 -> odd positions:
    # z = 1*1 + 1*4 + 0*16 + 1*2 + 0*8 + 1*32 = 39
    got = df.select(zorder.morton_key(["x", "y"], bits=3).alias("z")).collect()[0]["z"]
    assert got == 39


def test_zorder_layout_prunes_both_dims(spark):
    # 32x32 grid; 16 files. Z-order layout must give every file a small
    # bounding box in BOTH dims; a single-column sort leaves the other
    # dimension's per-file span at full range.
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("int").alias("y")
    )
    z = zorder.zorder_layout(grid, ["x", "y"], num_files=16, bits=5)
    spans = (
        z.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.max("sx").alias("wx"), F.max("sy").alias("wy"))
        .collect()[0]
    )
    # 16 z-tiles of a 32x32 grid are 8x8 squares: both spans far below 31
    assert spans["wx"] <= 15 and spans["wy"] <= 15
    one_col = (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("sy"))
        .agg(F.max("sy").alias("wy"))
        .collect()[0]
    )
    assert one_col["wy"] == 31  # single-column sort can't prune y


def test_mix_quotas_exact_and_deterministic(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    quotas = {"en": 5, "de": 3}
    out1 = mix.resample_to_quotas(docs, "lang", quotas, "doc_id")
    out2 = mix.resample_to_quotas(docs, "lang", quotas, "doc_id")
    rows1 = sorted((r["lang"], r["doc_id"]) for r in out1.collect())
    rows2 = sorted((r["lang"], r["doc_id"]) for r in out2.collect())
    assert rows1 == rows2  # deterministic
    counts = dict(
        (r["lang"], r["n"])
        for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    avail = dict(
        (r["lang"], r["n"])
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    for lang, k in quotas.items():
        assert counts[lang] == min(k, avail[lang])
    assert set(counts) == {"en", "de"}  # unlisted groups dropped


def test_achieved_mix_fractions_sum_to_one(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    out = mix.achieved_mix(docs, "lang")
    total = out.agg(F.sum("fraction")).collect()[0][0]
    assert abs(total - 1.0) < 1e-4


def test_training_order_deterministic_and_salted(spark):
    from sparkprep.operators.mix import training_order

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a = training_order(df, "doc_id", num_shards=8).collect()
    b = training_order(df, "doc_id", num_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every row present exactly once; positions within a shard are 1..n
    assert len(a) == 200
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different salt reshuffles: some doc changes shard or pos
    c = training_order(df, "doc_id", num_shards=8, salt="epoch1").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_time_split_embargo_and_nulls(spark):
    import datetime
    from sparkprep.operators import mix

    rows = [
        (1, datetime.datetime(2024, 1, 10)),
        (2, datetime.datetime(2024, 1, 20)),   # inside the gap (>= train_until)
        (3, datetime.datetime(2024, 1, 22)),   # first test instant
        (4, None),                              # NULL ts must never train
    ]
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = {r.id: r.split for r in mix.time_split(
        df, "ts", "2024-01-20 00:00:00", "2024-01-22 00:00:00"
    ).collect()}
    assert out == {1: "train", 2: "embargo", 3: "test", 4: "embargo"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="embargo gap is negative"):
        mix.time_split(df, "ts", "2024-01-22 00:00:00", "2024-01-20 00:00:00")


def test_weighted_sample_topk_determinism_and_weights(spark):
    from sparkprep.operators import mix

    rows = [(i, "g", 0.001 if i != 7 else 1e9) for i in range(10)]
    rows += [(100, "g", None), (101, "g", -5.0), (102, "g", 0.0)]
    df = spark.createDataFrame(rows, ["id", "grp", "w"])
    out = mix.weighted_sample_topk(df, "grp", "w", k=3, id_col="id")
    ids = sorted(r.id for r in out.collect())
    assert len(ids) == 3
    # the overwhelming weight is always drawn; invalid weights never are
    assert 7 in ids and not {100, 101, 102} & set(ids)
    # bit-identical replay
    ids2 = sorted(r.id for r in mix.weighted_sample_topk(df, "grp", "w", 3, "id").collect())
    assert ids == ids2
    # different salt -> (very likely) different draw among the light rows
    ids3 = sorted(
        r.id for r in mix.weighted_sample_topk(df, "grp", "w", 3, "id", salt="x").collect()
    )
    assert 7 in ids3
    # k larger than the valid group -> all valid rows, no padding
    all_ids = sorted(r.id for r in mix.weighted_sample_topk(df, "grp", "w", 50, "id").collect())
    assert all_ids == list(range(10))


def test_budget_allocation_water_filling(spark):
    from sparkprep.operators import mix

    df = spark.createDataFrame(
        [("a", 1.0, 10.0), ("b", 1.0, 1000.0), ("c", 2.0, 30.0)],
        ["src", "w", "cap"],
    )
    # partial saturation: a and c hit their caps, b absorbs the rest
    got = {r.src: r.alloc for r in mix.budget_allocation(df, "src", "w", "cap", 100).collect()}
    assert got == {"a": 10.0, "c": 30.0, "b": 60.0}
    assert abs(sum(got.values()) - 100) < 1e-9

    # no saturation: plain proportional split
    got2 = {r.src: r.alloc for r in mix.budget_allocation(df, "src", "w", "cap", 10).collect()}
    assert got2 == {"a": 2.5, "b": 2.5, "c": 5.0}

    # budget exceeds total capacity: everything saturates
    got3 = {r.src: r.alloc for r in mix.budget_allocation(df, "src", "w", "cap", 2000).collect()}
    assert got3 == {"a": 10.0, "b": 1000.0, "c": 30.0}

    # invalid weights allocate zero, never absorb budget
    df2 = spark.createDataFrame(
        [("a", 1.0, 10.0), ("z", 0.0, 50.0), ("n", None, 50.0)],
        ["src", "w", "cap"],
    )
    got4 = {r.src: r.alloc for r in mix.budget_allocation(df2, "src", "w", "cap", 4).collect()}
    assert got4 == {"a": 4.0, "z": 0.0, "n": 0.0}
