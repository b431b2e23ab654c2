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


def reset() -> None:
    """Drop every memoized frame so the next consumer rebuilds from the
    parquet inputs. The bench harness calls this at the start of every
    timing pass so each shared family's build cost is charged inside
    the FIRST consumer's timing on EVERY pass — without it, the
    best-of-N minima never bill the build at all (a pass-2 timing of
    the first consumer reads the pass-1 checkpoint leaf), overstating
    the shared-frame win (VERDICT r10 item 1). The dropped
    localCheckpoint blocks are reclaimed by the ContextCleaner once the
    last DataFrame reference dies; no explicit unpersist is needed."""
    _FRAMES.clear()


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


def lpa_labels(spark: SparkSession, sf_dir: str, rounds: int) -> DataFrame:
    """The fixed-round LPA community labels over the shared co-purchase
    edge list — communities and modularity both replay the identical
    4-round propagation (join + groupBy + keyed window per round);
    memoized once per session. lpa_communities checkpoints per round,
    so the returned frame is already a materialized leaf chain; one
    more lazy cut makes reuse a single leaf scan."""
    from sparkprep.operators import graph

    def build() -> DataFrame:
        edges = copurchase_edges(spark, sf_dir)
        return graph.lpa_communities(edges, rounds=rounds).transform(
            lazy_checkpoint
        )

    return session_frame(spark, f"lpa_labels:r{rounds}", sf_dir, build)


def customer_revenue_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank + running-sum scaffold over per-customer revenue in the ONE
    total ordering (revenue asc, custkey asc) that gini_scale,
    lorenz_scale AND value_deciles all sort by — each previously ran its
    own ranks.global_rank/ntile/cumsum pass (sampling job + range
    exchange + checkpoint + counts apiece) over the same 150k-row frame.
    One range pass emits everything each consumer derives row-locally:

    - ``__rank``  exact global row_number (gini's Σ i·x term)
    - ``__n``     total rows (ntile math → lorenz deciles, bit-identical
                  via ranks.ntile_from_rank)
    - ``__cum``   exact running sum of integer revenue units
                  (``__u = __rev·10⁴`` as int64 — value_deciles' input)
    - ``__tot``   total units

    Same two-phase scaffold as ranks.global_rank/global_cumsum (range
    partition → per-partition counts/partials → broadcast prefix
    offsets → per-partition window), so every derived quantity is
    bit-identical to the single-purpose operators and the consumers
    keep their window-form oracles."""
    return session_frame(
        spark,
        "customer_revenue_ranked",
        sf_dir,
        lambda: build_customer_revenue_ranked(spark, sf_dir),
    )


def build_customer_revenue_ranked(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """The scaffold behind :func:`customer_revenue_ranked`.
    ``checkpoint=False`` exists for plan-shape tests only: the
    localCheckpoint truncates explain() to ``Scan ExistingRDD``
    (ranks.global_rank convention), hiding the one-range-exchange
    shape the audit asserts."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from sparkprep.queries import relational_ext

    def _cp(df: DataFrame) -> DataFrame:
        return df.transform(lazy_checkpoint) if checkpoint else df

    per_cust = relational_ext.per_customer_revenue(spark, sf_dir)
    units = per_cust.withColumn(
        "__u", (F.col("__rev") * 10000).cast("long")
    )
    order_exprs = [F.asc("__rev"), F.asc("o_custkey")]
    parted = _cp(
        units.repartitionByRange(32, *order_exprs).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    partials = parted.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__c"), F.sum("__u").alias("__cu")
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = partials.select(
        "__pid",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__offc"),
        F.sum("__c").over(Window.partitionBy()).alias("__totc"),
        F.coalesce(
            F.sum("__cu").over(w_off), F.lit(0).cast("long")
        ).alias("__offu"),
        F.sum("__cu").over(Window.partitionBy()).alias("__totu"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_exprs)
    w_cum = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = parted.join(F.broadcast(offsets), "__pid").select(
        "o_custkey",
        "__rev",
        "__u",
        (F.row_number().over(w_local) + F.col("__offc")).cast("long").alias(
            "__rank"
        ),
        (F.sum("__u").over(w_cum) + F.col("__offu")).alias("__cum"),
        F.col("__totc").cast("long").alias("__n"),
        F.col("__totu").alias("__tot"),
    )
    return _cp(out)


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
