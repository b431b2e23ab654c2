"""Sketch-based approximate aggregates — the 100 TB substitutes.

Exact `COUNT(DISTINCT)` and exact percentiles are per-group sorts /
full shuffles of the key universe; at 100 TB you run the sketch
versions (HLL++, Greenwald-Khanna/KLL, FP-growth-style freq items),
which partial-aggregate map-side into fixed-size state and merge. These
wrap Spark's built-ins behind the same call shape as the exact twins in
``operators/profile`` so a pipeline can flip exact -> approx per scale.

No DuckDB oracles: the sketch values are algorithm-specific (DuckDB's
approx_distinct is a different HLL), so driver verification is
rows-only by design; pytest asserts the published error bounds against
the exact answers instead (tests/test_sketches.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_counts(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """One-row frame of HLL++ distinct counts (fixed-size state per
    column; exact twin: ``profile.distinct_counts``). ``rsd`` is the
    guaranteed relative standard deviation."""
    return df.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct")
            for c in cols
        ]
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """One-row frame of approximate percentiles (mergeable sketch, no
    per-group sort; exact twin: ``F.percentile`` in stats_extended).
    Error <= 1/accuracy of the rank."""
    return df.agg(
        *[
            F.percentile_approx(col, p, accuracy).alias(
                f"{col}_p{int(p * 100)}"
            )
            for p in probabilities
        ]
    )


def frequent_items(
    df: DataFrame, cols: Sequence[str], support: float = 0.01
) -> DataFrame:
    """Karp-Papadimitriou-Shenker frequent items per column (single
    pass, fixed state). May contain false positives (by contract),
    never false negatives above `support`."""
    return df.stat.freqItems(list(cols), support)


def cms_estimate(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Count-Min sketch estimates for every distinct key: (key, n_exact,
    n_cms) with the one-sided CMS guarantee n_cms >= n_exact (estimates
    only ever over-count, by at most eps*N with probability 1-delta for
    width = e/eps, depth = ln(1/delta)).

    Unlike the HLL/GK sketches (engine-internal state, rows-only under
    the driver), every ingredient here is md5-derived and replayable:
    bucket_d(key) = (a_d * H(key) + b_d) mod p mod width with the
    dedup module's seeded coefficients — so another engine can rebuild
    the identical counter matrix and the estimates compare EXACTLY.

    Shape: one explode of ``depth`` (row, bucket) structs per input row
    -> one map-combined groupBy((row, bucket)) builds the depth x width
    counter matrix (bounded size, broadcastable); distinct keys join
    their ``depth`` counters and take the min. The matrix, not the
    data, is what a monitoring pipeline ships between hosts — this
    operator is the fidelity audit for a chosen (depth, width).
    """
    from sparkprep.operators.dedup import (
        MERSENNE_P, hash_coeffs, string_to_int_hash,
    )

    coeffs = hash_coeffs(depth, seed)
    h = string_to_int_hash(F.col(key_col))
    rows = df.select(
        F.col(key_col).alias("key"), h.alias("__h")
    )
    bucket_structs = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                (
                    (F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MERSENNE_P)
                    % F.lit(width)
                ).alias("bucket"),
            )
            for d, (a, b) in enumerate(coeffs)
        ]
    )
    counters = (
        rows.select(F.explode(bucket_structs).alias("rb"))
        .groupBy("rb.row", "rb.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    keys = rows.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_exact"), F.first("__h").alias("__h")
    )
    keyed = keys.select(
        "key",
        "n_exact",
        F.explode(bucket_structs).alias("rb"),
    ).select("key", "n_exact", F.col("rb.row").alias("row"),
             F.col("rb.bucket").alias("bucket"))
    est = keyed.join(F.broadcast(counters), ["row", "bucket"])
    return (
        est.groupBy("key", "n_exact")
        .agg(F.min("cnt").alias("n_cms"))
        .select(
            "key",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_cms").cast("long").alias("n_cms"),
        )
    )
