"""Persisted IVF index lifecycle: build → layout → pruned query →
parity with the ad-hoc operator (the bucket-by-cell plan the ann_ivf
docstring promises, pinned as behavior)."""

import json
import os

import pytest

from pyspark.sql import functions as F

from sparkprep.operators import similarity as sim
from sparkprep.pipelines.ann_index import build_ann_index, query_ann_index
from sparkprep.queries import t

_NC = 8
_PROBES = 2
_K = 5


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index"))
    emb = t(spark, sf_dir, "embeddings")
    manifest = build_ann_index(emb, d, num_centroids=_NC, seed=42)
    return d, manifest


def test_build_layout_and_manifest(spark, sf_dir, index_dir):
    d, manifest = index_dir
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    # manifest reconciles with the source
    assert manifest["n_rows"] == n
    assert sum(manifest["cell_counts"].values()) == n
    # hive layout: one cell=<id> directory per non-empty cell
    dirs = {
        p for p in os.listdir(os.path.join(d, "corpus")) if p.startswith("cell=")
    }
    assert dirs == {f"cell={c}" for c in manifest["cell_counts"]}
    # manifest on disk matches the returned one
    with open(os.path.join(d, "manifest.json")) as fh:
        assert json.load(fh) == manifest


def test_query_reads_only_probed_partitions(spark, sf_dir, index_dir):
    d, manifest = index_dir
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(3)
    out = query_ann_index(spark, d, queries, k=_K, num_probes=_PROBES)
    # recompute the probe set the query path used
    cent = (
        spark.read.parquet(os.path.join(d, "centroids")).orderBy("cell").collect()
    )
    import numpy as np

    cunit = np.asarray([r["unit"] for r in cent], dtype=np.float64)
    probed = {
        int(c)
        for r in queries.select(
            F.explode(
                sim.ivf_cell_expr(cunit, F.col("embedding"), _PROBES)
            ).alias("c")
        ).collect()
        for c in [r["c"]]
    }
    assert 0 < len(probed) < _NC  # pruning has something to prune
    pruned = spark.read.parquet(os.path.join(d, "corpus")).filter(
        F.col("cell").isin(sorted(probed))
    )
    # the static IN-filter must reach the scan as a PARTITION filter...
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    # ...and the EXECUTED scan must touch only probed cell directories
    # (inputFiles() reports the unpruned relation, so read the actual
    # file names the scan produced)
    full_files = {
        r["f"]
        for r in spark.read.parquet(os.path.join(d, "corpus"))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    pruned_files = {
        r["f"]
        for r in pruned.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert pruned_files < full_files
    assert all(
        any(f"cell={c}/" in f for c in probed) for f in pruned_files
    )
    # and the query actually returns ranked neighbors
    pdf = out.toPandas()
    assert set(pdf["query_id"]) == {r["vec_id"] for r in queries.select("vec_id").collect()}
    assert pdf.groupby("query_id")["rank"].max().le(_K).all()


def test_query_parity_with_adhoc_operator(spark, sf_dir, index_dir):
    d, _ = index_dir
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(3)
    got = (
        query_ann_index(spark, d, queries, k=_K, num_probes=_PROBES)
        .orderBy("query_id", "rank")
        .collect()
    )
    want = (
        sim.ann_ivf_topk(
            emb,
            queries,
            k=_K,
            num_centroids=_NC,
            num_probes=_PROBES,
            seed=42,
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
