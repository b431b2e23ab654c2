"""Cluster-durable checkpoint mode (VERDICT r9 next-round #4).

Every iterative / shared-frame operator truncates lineage through
`sparkprep.checkpointing.lazy_checkpoint`, which routes on the session
conf `sparkprep.checkpoint.mode`:

- local (default): `localCheckpoint` — executor-local blocks, the
  single-node posture every prior round ran under.
- reliable: `checkpoint` under `setCheckpointDir` — survives executor
  loss on a real cluster.

The contract: identical results under both modes (checkpointing is a
physical materialization decision, never a semantic one).
"""

import pytest
from pyspark.sql import functions as F

from sparkprep import checkpointing as cp
from sparkprep.operators import dedup, graph


@pytest.fixture
def reliable_mode(spark, tmp_path):
    old_dir = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(cp.MODE_KEY, "reliable")
    yield
    spark.conf.unset(cp.MODE_KEY)
    # restore (None → leave the tmp dir; harmless for a test session)
    if old_dir is not None:
        spark.sparkContext.setCheckpointDir(old_dir)


def test_reliable_mode_requires_checkpoint_dir(spark):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a prior test pinned a checkpoint dir on the shared session")
    spark.conf.set(cp.MODE_KEY, "reliable")
    try:
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            cp.lazy_checkpoint(spark.range(3))
    finally:
        spark.conf.unset(cp.MODE_KEY)


def _pair_graph(spark):
    # two components: a 5-chain (0-1-2-3-4) and a triangle (10,11,12)
    rows = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_connected_components_same_under_both_modes(spark, tmp_path, reliable_mode):
    pairs = _pair_graph(spark)
    reliable = sorted(
        dedup.connected_components(pairs).collect(), key=lambda r: r[0]
    )
    spark.conf.set(cp.MODE_KEY, "local")
    local = sorted(dedup.connected_components(pairs).collect(), key=lambda r: r[0])
    assert [tuple(r) for r in reliable] == [tuple(r) for r in local]
    comp = {r[0]: r[1] for r in reliable}
    assert comp[4] == 0 and comp[12] == 10


def test_k_core_same_under_both_modes(spark, tmp_path, reliable_mode):
    # triangle (core-3... actually 2-core) + pendant chain peeled at k=2
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(rows, "u long, v long")
    reliable = sorted(graph.k_core(edges, k=2).collect())
    spark.conf.set(cp.MODE_KEY, "local")
    local = sorted(graph.k_core(edges, k=2).collect())
    assert [tuple(r) for r in reliable] == [tuple(r) for r in local]
    nodes = {r[0] for r in reliable}
    assert nodes == {1, 2, 3}



def test_bad_mode_rejected(spark):
    spark.conf.set(cp.MODE_KEY, "turbo")
    try:
        with pytest.raises(ValueError, match="local.*reliable|reliable.*local"):
            cp.lazy_checkpoint(spark.range(3))
    finally:
        spark.conf.unset(cp.MODE_KEY)


def test_reliable_lazy_checkpoint_materializes(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck2"))
    spark.conf.set(cp.MODE_KEY, "reliable")
    try:
        df = cp.lazy_checkpoint(
            spark.range(100).withColumn("x", F.col("id") * 2)
        )
        assert df.agg(F.sum("x")).collect()[0][0] == 9900
        # the checkpoint actually wrote durable blocks
        files = list((tmp_path / "ck2").rglob("*"))
        assert any(f.is_file() for f in files)
    finally:
        spark.conf.unset(cp.MODE_KEY)
