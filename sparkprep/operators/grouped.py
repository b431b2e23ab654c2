"""Arrow-batched grouped Python operators — the sanctioned escape hatch
when built-ins can't express the semantics (SURVEY §2.15: the reference
had only row-at-a-time scalar UDFs; no pandas_udf/UDAF/grouped map).

These exist to exercise and document the FAST Python path:
- grouped-map (``applyInPandas``): whole-group pandas function, Arrow
  transfer, one shuffle on the key;
- grouped-agg (``pandas_udf``): vectorized UDAF, partial-agg NOT
  available (Python aggregates see whole groups), so the shuffle carries
  raw rows — use only when no native aggregate composition exists.

Both examples ship with native-SQL oracle equivalents in the query
registry, proving the Python path computes exactly what the declarative
form would — the contract any custom pandas operator here must meet.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def grouped_zscore(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` (grouped map).

    Expressible natively with window functions — and the oracle checks
    exactly that — but implemented through the pandas path as the
    template for genuinely non-native per-group logic (model scoring,
    scipy transforms, ...). Groups stream through Arrow; memory bound =
    largest single group, the operator's real scale constraint.
    """
    schema_fields = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in df.columns)
    out_schema = f"{schema_fields}, {out_col} double"

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)  # sample stddev, matching Spark/SQL stddev
        pdf = pdf.copy()
        if sd and sd > 0:  # NaN (n=1) and 0 both fall through
            pdf[out_col] = (v - v.mean()) / sd
        else:
            # SQL NULL semantics: stddev_samp is NULL for n=1 and the
            # z-score is NULL for zero variance — emit nulls, not NaN
            # (Arrow keeps NaN as a double, which would diverge from
            # any window-function oracle).
            pdf[out_col] = pd.array([None] * len(pdf), dtype="Float64")
        return pdf

    return df.groupBy(*key_cols).applyInPandas(zscore, out_schema)


def grouped_geometric_mean(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: exp(mean(ln(x))) — a UDAF Spark has
    no single built-in for (though exp(avg(ln(x))) composes natively;
    the oracle uses that composition to pin this implementation).

    The UDF is created lazily — ``@pandas_udf`` resolves its return type
    against the ACTIVE SparkSession, so a module-level decorator would
    crash any import that happens before a session exists.
    """

    @pandas_udf("double")
    def geometric_mean(v: pd.Series) -> float:
        import numpy as np

        pos = v[v > 0]
        if len(pos) == 0:
            # SQL NULL semantics: avg(ln(x)) FILTER (WHERE x > 0) over a
            # group with no positive values is NULL, not NaN.
            return None
        return float(np.exp(np.log(pos).mean()))

    return df.groupBy(*key_cols).agg(
        geometric_mean(F.col(value_col)).alias("gmean")
    )


def grouped_ewma(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key EWMA sequence — y_t = α·x_t + (1-α)·y_{t-1}, y_1 = x_1 —
    the canonical LINEAR RECURRENCE that no window function expresses
    (the closed form needs (1-α)^{-i} factors that overflow on long
    series). This is the genuinely-non-native case the pandas path
    exists for: one shuffle on the key, each group streams through
    Arrow, the recurrence runs in an explicit per-group loop whose
    float operation order (α·x + β·prev) is written IDENTICALLY in the
    DuckDB recursive-CTE oracle, so results are bit-reproducible.

    Bit-parity trap worth naming: β must be computed as ``1 - alpha``
    in Python and interpolated into the oracle via ``repr(beta)`` —
    the SQL literal ``0.7`` is a DIFFERENT double than ``1 - 0.3``.

    NULL values poison the tail of their key's sequence (NaN
    propagates through the recurrence) — filter or impute first.
    Memory bound = largest single group, like every grouped map.
    """
    import numpy as np

    beta = 1.0 - alpha
    schema_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in df.columns
    )
    out_schema = f"{schema_fields}, {out_col} double"

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        y = np.empty_like(x)
        prev = None
        for i, v in enumerate(x):
            prev = v if prev is None else alpha * v + beta * prev
            y[i] = prev
        pdf = pdf.copy()
        pdf[out_col] = y
        return pdf

    return df.groupBy(*key_cols).applyInPandas(ewma, out_schema)


def grouped_cusum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    out_col: str = "cusum",
) -> DataFrame:
    """Per-key one-sided CUSUM drift statistic — s_t = max(0, s_{t-1} +
    (x_t - target - slack)), the sequential change-point detector that
    flags a sustained upward shift long before a mean-over-window
    does. Same linear-recurrence regime as :func:`grouped_ewma` (no
    window function expresses it; closed forms don't exist), so same
    machinery: Arrow grouped map, explicit recurrence, float op order
    and constants mirrored into a recursive-CTE oracle via ``repr``
    for bit parity. Adds ``alarm`` (s_t > threshold) when a threshold
    is given. NULL values poison their key's tail — filter first.
    """
    import numpy as np

    schema_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in df.columns
    )
    out_schema = f"{schema_fields}, {out_col} double"
    if threshold is not None:
        out_schema += ", alarm boolean"

    def cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        y = np.empty_like(x)
        prev = 0.0
        for i, v in enumerate(x):
            prev = max(0.0, prev + (v - target - slack))
            y[i] = prev
        pdf = pdf.copy()
        pdf[out_col] = y
        if threshold is not None:
            pdf["alarm"] = y > threshold
        return pdf

    return df.groupBy(*key_cols).applyInPandas(cusum, out_schema)


def grouped_holt(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend) — the
    forecasting step up from :func:`grouped_ewma` when the series has
    drift an EWMA lags behind:

        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},   l_1 = y_1, b_1 = 0

    Same linear-recurrence regime as grouped_ewma (no window function
    expresses it), same machinery and same bit-parity contract: Arrow
    grouped map, explicit float op order, constants interpolated into
    the recursive-CTE oracle via ``repr`` (1 − α in Python is a
    DIFFERENT double than the SQL literal). The oracle's recursive arm
    must repeat the l_t expression textually inside b_t — same
    expression, same IEEE result. One-step forecast = l_t + b_t.
    NULL values poison their key's tail — filter first. Memory bound =
    largest single group (use on BOUNDED groups, e.g. per-type daily
    panels — never per-entity raw events).
    """
    import numpy as np

    oneha = 1.0 - alpha
    onehb = 1.0 - beta
    schema_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in df.columns
    )
    out_schema = f"{schema_fields}, {level_col} double, {trend_col} double"

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        lv = np.empty_like(x)
        tr = np.empty_like(x)
        l = b = 0.0
        for i, v in enumerate(x):
            if i == 0:
                l, b = v, 0.0
            else:
                lp = l
                l = alpha * v + oneha * (l + b)
                b = beta * (l - lp) + onehb * b
            lv[i] = l
            tr[i] = b
        pdf = pdf.copy()
        pdf[level_col] = lv
        pdf[trend_col] = tr
        return pdf

    return df.groupBy(*key_cols).applyInPandas(holt, out_schema)


def grouped_holt_winters(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    m: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Per-key additive Holt-Winters (level + trend + m-period
    seasonal) — the seasonality-aware upgrade of :func:`grouped_holt`
    for series with a weekly/periodic signal the double-exponential
    model aliases into trend:

        l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m}

    Initialization (exactly replayable): l_m = mean(y_1..y_m),
    b_m = 0, s_p = y_p − l_m for p = 1..m; the recursion starts at
    t = m+1 and rows 1..m are consumed by the init only (groups with
    ≤ m rows emit nothing). ``forecast`` is the honest ONE-STEP-AHEAD
    prediction made before seeing y_t: f_t = l_{t−1} + b_{t−1} +
    s_{t−m}.

    Bit-parity contract (grouped_holt's): Arrow grouped map with an
    explicit float-op order the recursive-CTE oracle repeats textually
    — the m-slot seasonal ring unrolls to m state COLUMNS in the CTE
    (a LIST-typed recursive column would leave DuckDB's planner no
    fixed schema), each updated via CASE on the row's phase. The init
    mean is exact when y is integral (counts ≤ 2^53: the sum is exact
    in any order, then ONE division) — feed count-valued series, not
    arbitrary floats. Memory bound = largest single group; use on
    BOUNDED per-key panels (daily per type), never per-entity raw
    events. NULLs poison their key's tail — filter first.
    """
    import numpy as np

    oneha = 1.0 - alpha
    onehb = 1.0 - beta
    onehg = 1.0 - gamma
    fm = float(m)
    schema_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in df.columns
    )
    out_schema = (
        f"{schema_fields}, level double, trend double, seasonal double,"
        " forecast double"
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        n = len(x)
        if n <= m:
            return pdf.iloc[0:0].assign(
                level=np.array([], dtype=float),
                trend=np.array([], dtype=float),
                seasonal=np.array([], dtype=float),
                forecast=np.array([], dtype=float),
            )
        # init: integral y -> the sum is exact in any order; ONE division
        mbar = x[:m].sum() / fm
        s = [x[p] - mbar for p in range(m)]
        l = mbar
        b = 0.0
        lv = np.empty(n - m)
        tr = np.empty(n - m)
        se = np.empty(n - m)
        fc = np.empty(n - m)
        for i in range(m, n):
            p = i % m
            s_prev = s[p]
            v = x[i]
            f = l + b + s_prev
            lp = l
            l = alpha * (v - s_prev) + oneha * (lp + b)
            b = beta * (l - lp) + onehb * b
            s[p] = gamma * (v - l) + onehg * s_prev
            j = i - m
            lv[j] = l
            tr[j] = b
            se[j] = s[p]
            fc[j] = f
        out = pdf.iloc[m:].copy()
        out["level"] = lv
        out["trend"] = tr
        out["seasonal"] = se
        out["forecast"] = fc
        return out

    return df.groupBy(*key_cols).applyInPandas(hw, out_schema)


def grouped_croston(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    demand_col: str,
    interval_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Per-key Croston state (the intermittent-demand forecaster):
    TWO coupled SES recurrences over the key's demand OCCURRENCES —
    z_i = z + α(d_i − z) on demand sizes, p_i = p + α(q_i − p) on
    inter-demand intervals, seeded z₁ = d₁, p₁ = q₁ — emitting one
    row per key with the final state and occurrence count (the
    forecast rate z/p is the caller's one division).

    Shape: each key's occurrence list is folded into ORDERED arrays by
    one map-combined groupBy (bounded by the calendar, ~350 weeks), and
    the recursion runs in a SCALAR Arrow-batched pandas UDF over those
    array rows — ~|keys|/10k batches, never one pandas group per key
    (the first implementation paid ~1.4 ms of applyInPandas overhead
    per key: 20k parts → 28.9 s at sf0.1; this form is 26x faster at
    identical results). Same bit-parity contract as grouped_ewma: the
    Python loop's float op order is replayed verbatim by the keyed
    recursive-CTE oracle, and α must be an exact binary fraction or
    ``repr``-interpolated. NULLs poison their key's tail — filter
    first.
    """
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    key = key_cols[0]
    packed = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_demands"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                    F.col(demand_col).cast("double").alias("d"),
                    F.col(interval_col).cast("double").alias("q"),
                )
            )
        ).alias("__occ"),
    ).select(
        *key_cols,
        "n_demands",
        F.col("__occ.d").alias("__d"),
        F.col("__occ.q").alias("__q"),
    )

    @pandas_udf("struct<z: double, p: double>")
    def croston_state(ds: pd.Series, qs: pd.Series) -> pd.DataFrame:
        zs = np.empty(len(ds))
        ps = np.empty(len(ds))
        # plain-list access: ndarray item indexing in a tight Python
        # loop pays boxing per element; tolist() once per row is ~3x
        for i, (da, qa) in enumerate(zip(ds.to_numpy(), qs.to_numpy())):
            d = da.tolist()
            q = qa.tolist()
            z, p = d[0], q[0]
            for j in range(1, len(d)):
                z = z + alpha * (d[j] - z)
                p = p + alpha * (q[j] - p)
            zs[i] = z
            ps[i] = p
        return pd.DataFrame({"z": zs, "p": ps})

    out = packed.select(
        *key_cols,
        "n_demands",
        croston_state(F.col("__d"), F.col("__q")).alias("__st"),
    )
    return out.select(*key_cols, "n_demands", "__st.z", "__st.p")
