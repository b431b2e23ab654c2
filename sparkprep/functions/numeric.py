"""Numeric transforms — min-max normalization done in ONE Spark job.

The reference (X9, loanStat.py:241-287) runs FOUR separate
``select(max(..)).collect()`` actions (4 full jobs over the cached frame)
and then normalizes through a Python UDF closing over the scalars. Here:
one ``agg`` computes every scalar in a single pass, and the normalization
is native column arithmetic (SURVEY §4 rows 5-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minmax_scalars(df: DataFrame, *cols: str) -> dict[str, tuple[float, float]]:
    """All (min, max) pairs in one aggregate job.

    Replaces loanStat.py:241-266 (4 collect() round-trips → 1).
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def minmax_normalize(df: DataFrame, *cols: str, suffix: str = "") -> DataFrame:
    """X9 — ``(x - mn) / (mx - mn)`` as native arithmetic.

    ``suffix=''`` replaces in place like the reference
    (loanStat.py:287); pass e.g. ``'_norm'`` to keep the original.
    Degenerate columns (mx == mn) normalize to null (0/0), matching the
    UDF's ZeroDivisionError-free... actually the reference UDF would
    raise; we choose null and document the divergence.
    """
    scalars = minmax_scalars(df, *cols)
    out = df
    for c in cols:
        mn, mx = scalars[c]
        denom = mx - mn
        expr = (
            F.lit(None).cast("double")
            if denom == 0
            else (F.col(c) - F.lit(mn)) / F.lit(denom)
        )
        out = out.withColumn(c + suffix, expr)
    return out


def minmax_normalize_distributed(df: DataFrame, *cols: str, suffix: str = "") -> DataFrame:
    """Fully-lazy variant: no driver round-trip — the scalar aggregate is
    cross-joined back as a broadcast.

    NOT implemented as ``min() over ()``: an empty-frame window moves ALL
    rows to a single partition (WindowExec warns exactly this), which is
    fatal at 100 TB. ``crossJoin(broadcast(agg))`` computes the scalars
    with a normal partial+final aggregate and streams them to every task;
    the normalize itself stays a narrow, codegen'd projection.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    scalars = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(scalars))
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        # degenerate column (mx == mn) -> null, matching minmax_normalize;
        # a bare division trips ANSI divide-by-zero
        denom = F.when(mx != mn, mx - mn)
        out = out.withColumn(c + suffix, (F.col(c) - mn) / denom)
    return out.drop(*[f"__{p}_{c}" for c in cols for p in ("mn", "mx")])
