"""Z-order (Morton) interleaved sort keys for multi-dimensional layout.

Sorting a 100 TB table by ONE column gives perfect min/max pruning on
that column and none on any other; interleaving the bits of two or
three key columns gives useful pruning on ALL of them (the Delta/Iceberg
OPTIMIZE ZORDER idea). Here the key is a native bit-arithmetic
expression (whole-stage-codegen-friendly, no UDF), used with
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` before a
partitioned write so every file covers a small hyper-rectangle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: Sequence, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of each column into one BIGINT.

    Bit i of column j lands at position i * ndims + j, so the combined
    key alternates source bits — close in z-value implies close in
    every dimension. Columns must already be non-negative integers
    scaled to [0, 2^bits); use rank/bucketing upstream for doubles.
    """
    ndims = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ndims + j)
    return z


def add_zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16, out: str = "zkey"
) -> DataFrame:
    """Add the Morton key over ``cols`` masked into range (low ``bits``
    kept — callers with wider domains should rank-normalize first)."""
    mask = (1 << bits) - 1
    masked = [
        F.col(c).cast("long").bitwiseAND(F.lit(mask)) for c in cols
    ]
    return df.withColumn(out, morton_key(masked, bits))


def zorder_layout(
    df: DataFrame, cols: Sequence[str], num_files: int, bits: int = 16
) -> DataFrame:
    """Range-partition + sort by the z-key: the write-side layout step.
    Each output partition (file) then covers a compact hyper-rectangle
    of the key space, so min/max stats prune reads on every dimension."""
    keyed = add_zorder_key(df, cols, bits)
    return keyed.repartitionByRange(num_files, "zkey").sortWithinPartitions("zkey")
