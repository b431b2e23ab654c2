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
