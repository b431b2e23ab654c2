"""Inferential statistics with exact cross-engine arithmetic: one-way
ANOVA F and Spearman rank correlation.

Both follow the repo's decimal-sum discipline (CLAUDE.md): every
order-sensitive accumulation happens in exact DECIMAL on per-row-cast
values, so the only float operations are a handful of IEEE ops on
deterministic inputs at the very end — the same contract that keeps
autocorr/chi_square hash-identical across engines.

Neither operator ever sorts raw data: ANOVA is one map-combined
groupBy + a one-row fold over the k-group frame; Spearman derives
average ranks FROM THE VALUE-FREQUENCY TABLE (2·rank_avg(v) =
2·cum_count(≤v) − count(v) + 1 — an integer), so the ranking window
runs over the aggregated |distinct-values| frame, never a global sort
of the corpus. That makes this Spearman exact for discrete/low-
cardinality columns (the common case for ratings, counts, buckets);
for near-continuous columns, quantize first (e.g. ``F.round(x, 2)``)
or sample — the global-sort alternative single-partitions the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def anova_f(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA F-statistic of ``value_col`` across ``group_col``
    levels, plus effect size (eta²). NULL values drop (pairwise-
    complete, matching SQL aggregate semantics).

    Sums-of-squares identities on exact decimals:
      SSB = Σ_g S_g²/n_g − S²/N,  SSW = Q − Σ_g S_g²/n_g
    with S_g = Σx (DECIMAL(18,6) per-row cast), Q = Σx² (the square of
    a decimal is exact; its sum is exact). Per-group float terms
    (S_g²/n_g — 2 IEEE ops on deterministic inputs) are re-cast to
    DECIMAL(30,8) before the k-row fold so the final sum is
    order-independent too. Returns one row:
    ``(f_stat, df_between, df_within, n_rows, eta_sq)``.
    """
    x = F.col(value_col).cast("decimal(18,6)")
    per = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(x).alias("__s"),
            F.sum(x * x).alias("__q"),
        )
    )
    # S_g²/n_g: deterministic per group (single double conversion, one
    # multiply, one divide), then exact decimal for the cross-group sum
    g_term = (
        (F.col("__s").cast("double") * F.col("__s").cast("double"))
        / F.col("__n")
    ).cast("decimal(30,8)")
    folded = per.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__n").alias("__N"),
        F.sum("__s").alias("__S"),
        F.sum("__q").alias("__Q"),
        F.sum(g_term).alias("__G"),
    )
    # SSB and SSW are mathematically non-negative; the DECIMAL(30,8)
    # quantization of the per-group terms can push a near-zero value a
    # hair below 0 (hypothesis-found: constant-ish groups → F = -0.5).
    # Clamp at 0 — identical on both engines since the quantized
    # inputs are identical (the oracle mirrors the greatest()).
    S = F.col("__S").cast("double")
    ssb = F.greatest(
        F.col("__G").cast("double") - (S * S) / F.col("__N"), F.lit(0.0)
    )
    ssw = F.greatest(
        F.col("__Q").cast("double") - F.col("__G").cast("double"), F.lit(0.0)
    )
    df1 = (F.col("__k") - 1).cast("long")
    df2 = (F.col("__N") - F.col("__k")).cast("long")
    f_stat = F.try_divide(
        F.try_divide(ssb, df1.cast("double")),
        F.try_divide(ssw, df2.cast("double")),
    )
    return folded.select(
        F.round(f_stat, round_to).alias("f_stat"),
        df1.alias("df_between"),
        df2.alias("df_within"),
        F.col("__N").cast("long").alias("n_rows"),
        F.round(F.try_divide(ssb, ssb + ssw), round_to).alias("eta_sq"),
    )


def _doubled_rank_map(df: DataFrame, col: str) -> DataFrame:
    """(value, 2·average-rank) from the value-frequency table: with
    c(v) the count of v and cum(v) the running count through v in
    value order, 2·r_avg(v) = 2·cum(v) − c(v) + 1 — an exact integer
    (mid-rank ties are always whole or half). The window runs over the
    AGGREGATED counts frame (|distinct| rows, HashAggregate below the
    single-partition exchange — the sanctioned shape), never raw data.
    """
    counts = df.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return counts.select(
        "__v",
        (2 * F.sum("__c").over(w) - F.col("__c") + 1).alias("__r2"),
    )


def spearman(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Spearman rank correlation (mid-rank tie convention) without a
    global sort: per-column doubled-average-rank maps come from the
    value-frequency tables (:func:`_doubled_rank_map`), join back as
    tiny broadcast dimensions, and ρ is Pearson over the exact-integer
    doubled ranks — every sum is DECIMAL(38,0)-exact, the finish is 5
    IEEE ops on deterministic inputs. Rows with a NULL in either
    column drop (pairwise-complete). Returns one row
    ``(spearman_rho, n_rows)``.
    """
    staged = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
    rx = _doubled_rank_map(staged, "__x").withColumnsRenamed(
        {"__v": "__x", "__r2": "__rx"}
    )
    ry = _doubled_rank_map(staged, "__y").withColumnsRenamed(
        {"__v": "__y", "__r2": "__ry"}
    )
    ranked = staged.join(F.broadcast(rx), "__x").join(F.broadcast(ry), "__y")
    d38 = "decimal(38,0)"
    sums = ranked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__rx").cast(d38)).alias("__sx"),
        F.sum(F.col("__ry").cast(d38)).alias("__sy"),
        F.sum((F.col("__rx") * F.col("__ry")).cast(d38)).alias("__sxy"),
        F.sum((F.col("__rx") * F.col("__rx")).cast(d38)).alias("__sxx"),
        F.sum((F.col("__ry") * F.col("__ry")).cast(d38)).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    num = n * F.col("__sxy").cast("double") - sx * sy
    dx = n * F.col("__sxx").cast("double") - sx * sx
    dy = n * F.col("__syy").cast("double") - sy * sy
    rho = F.try_divide(num, F.sqrt(dx) * F.sqrt(dy))
    return sums.select(
        F.round(rho, round_to).alias("spearman_rho"),
        F.col("__n").cast("long").alias("n_rows"),
    )
