"""Session-shared query subtrees.

Several registry families rebuild an identical expensive subtree per
query (the MinHash+CC labels; the co-purchase pair graph — eleven graph
queries derive it from the same lineitem projection with the same cap).
Within one driver/bench session those queries run back-to-back, so the
engine memoizes ONE lazily-localCheckpoint-ed frame per (session,
sf_dir) and every family member consumes the materialized leaf — the
computed-once-artifact shape a 100 TB pipeline would persist anyway
(VERDICT r7 item 4 measured the CC family 16.1s → 1.6s from this).

Keyed by applicationId so a restarted session (dead RDD lineage) can
never serve a stale frame; within one live session the cache keeps one
entry per (name, sf_dir) — dead-session entries are evicted on miss.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from sparkprep.checkpointing import lazy_checkpoint

_FRAMES: dict = {}


def session_frame(
    spark: SparkSession, name: str, sf_dir: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Memoize ``build()`` per (session, name, sf_dir); the builder is
    expected to return a frame whose expensive subtree is truncated by
    a lazy ``localCheckpoint`` (so reuse is a leaf scan, and the first
    consumer's action materializes it)."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, name, sf_dir)
    hit = _FRAMES.get(key)
    if hit is not None:
        return hit
    frame = build()
    # evict only DEAD-session entries (different applicationId) for this
    # name: a restarted session's RDD lineage is gone, but one live
    # session alternating two sf_dirs (sf0.001 fixtures vs
    # SPARKPREP_TEST_SF_DIR) keeps one frame per sf_dir instead of
    # rebuilding the expensive subtree on every switch (ADVICE r8)
    for k in [k for k in _FRAMES if k[1] == name and k[0] != app_id]:
        del _FRAMES[k]
    _FRAMES[key] = frame
    return frame


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-purchase pair graph every graph-family query derives:
    ``cooccurrence_pairs`` over the distinct (order, part) frame with
    the standard 64-item cap — returned RAW (``item_a, item_b,
    n_keys``) and localCheckpoint-ed, so each consumer applies its own
    support filter/renames on the materialized leaf."""
    from pyspark.sql import functions as F  # noqa: F401  (parity with callers)

    from sparkprep.operators import graph
    from sparkprep.queries import t

    def build() -> DataFrame:
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        return graph.cooccurrence_pairs(
            li, "l_orderkey", "l_partkey", max_items_per_key=64, cap_by="id"
        ).transform(lazy_checkpoint)

    return session_frame(spark, "copurchase_pairs", sf_dir, build)


def kmeans_assignment(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    dims: int,
    scale: int,
    rounds: int,
) -> DataFrame:
    """The fixed-round Lloyd assignment frame ``(id, xi, cluster)`` that
    kmeans_assign AND silhouette_score both replay (identical
    quantize + rounds chain, verbatim-shared oracle CTEs) — one Lloyd
    iteration per session instead of one per consumer. kmeans_lloyd
    already lazy-localCheckpoints its final assignment, so reuse is a
    leaf scan; parameters key the cache name so a panel with different
    (k, dims, rounds) could coexist."""
    from sparkprep.operators import clustering
    from sparkprep.queries import t

    def build() -> DataFrame:
        emb = t(spark, sf_dir, "embeddings")
        pts = clustering.quantize_points(
            emb, "vec_id", "embedding", dims=dims, scale=scale
        )
        return clustering.kmeans_lloyd(pts, k=k, dims=dims, rounds=rounds)

    name = f"kmeans_asg:k{k}d{dims}s{scale}r{rounds}"
    return session_frame(spark, name, sf_dir, build)


def copurchase_edges(
    spark: SparkSession, sf_dir: str, a: str = "u", b: str = "v"
) -> DataFrame:
    """The standard ≥2-order-support edge list over the shared pair
    frame — the exact construction every graph query used inline
    before sharing (filter + rename are row-local over the leaf)."""
    from pyspark.sql import functions as F

    return (
        copurchase_pairs(spark, sf_dir)
        .filter(F.col("n_keys") >= 2)
        .select(F.col("item_a").alias(a), F.col("item_b").alias(b))
    )
