"""Skew-mitigation operators: salting for hot keys (task brief: 'skewed
keys hurt ... salting for skew').

AQE's skew-join splitting handles sort-merge JOIN skew automatically
(enabled in our session factory), but AGGREGATION skew — one giant group
saturating a single reducer — still needs salting. The pattern:

    phase 1: groupBy(key, salt) — the hot group splits across
             `salt_buckets` reducers, each seeing 1/N of it;
    phase 2: groupBy(key)       — merge the tiny per-salt partials.

Phase 2's input is #distinct-keys x salt_buckets rows, so the second
shuffle is negligible. Works for any algebraic aggregate (sum/count/
min/max; avg = sum+count merged at phase 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> "fn(col)" with fn in
    {count, sum, min, max, avg}. avg is decomposed into sum+count and
    recombined, since avg of partial avgs is wrong under skew.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )

    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        fn, col = spec.rstrip(")").split("(", 1)
        fn = fn.strip().lower()
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").cast("long").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{out}"))
            final_exprs.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")

    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) LEFT side randomly;
    REPLICATE every right row across all salt values, so each
    (key, salt) bucket joins locally. Right side grows x salt_buckets —
    use when right is the small/moderate side and AQE's skew splitting
    can't apply (e.g. broadcast is too big but a few left keys are hot).
    """
    l_salted = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_replicated, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Heavy-key diagnosis BEFORE a join/agg melts an executor: the
    ``top`` hottest keys with their row count, share of the table, and
    skew factor (count ÷ the mean per-key load — a factor of 40 says
    that key's shuffle partition does 40 keys' worth of work). Feed the
    offenders to :func:`salted_agg`/:func:`salted_join` or AQE skew
    handling.

    Shape: one map-combined count aggregate; the top-k runs as
    TakeOrderedAndProject over the per-key frame (count desc, key asc —
    deterministic under ties); totals reduce the SAME aggregated frame
    to one row, so AQE reuses the count exchange rather than rescanning
    the table, and the 1-row frame broadcast-attaches to the k survivors
    (the sanctioned tiny-broadcast cross pattern).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    topk = counts.orderBy(F.desc("n"), F.asc("key")).limit(top)
    return topk.join(F.broadcast(totals)).select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.round(F.try_divide(F.col("n"), F.col("__total")), round_to).alias(
            "share"
        ),
        F.round(
            F.try_divide(F.col("n") * F.col("__nkeys"), F.col("__total")), 4
        ).alias("skew_factor"),
    )


def concentration_report(
    df: DataFrame,
    key_col: str,
    value_col: str,
    top: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Market/ownership concentration of a value column over its keys,
    in one row: key count, exact total, Herfindahl-Hirschman index
    (sum of squared shares — 1/n_keys = uniform, 1.0 = monopoly), and
    the share held by the ``top`` largest keys. The skew twin of
    :func:`key_skew_report` for WEIGHTED load (revenue per customer,
    tokens per source) rather than row counts.

    Shape mirrors key_skew_report: one map-combined per-key sum (values
    cast DECIMAL(18,4) per row, so the sum is exact and
    order-independent), squares re-narrowed to DECIMAL(18,4) before
    multiplying (the widened sum type would overflow the 38-digit cap
    and silently lose scale), totals and the TakeOrdered top-k both
    reduce the SAME aggregated frame (AQE reuses the exchange), and the
    two 1-row frames broadcast-join. Ratios divide as doubles and round
    at ``round_to`` — cross-engine double division is exact, summation
    never happens in double.
    """
    v = F.sum(F.col(value_col).cast("decimal(18,4)")).alias("v")
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(v)
    v44 = F.col("v").cast("decimal(18,4)")
    totals = per_key.agg(
        F.count(F.lit(1)).alias("__nkeys"),
        F.sum("v").alias("__total"),
        F.sum(v44 * v44).alias("__sumsq"),
    )
    topv = (
        per_key.orderBy(F.desc("v"), F.asc("key"))
        .limit(top)
        .agg(F.sum("v").alias("__topv"))
    )
    tot_d = F.col("__total").cast("double")
    return topv.join(F.broadcast(totals)).select(
        F.col("__nkeys").cast("long").alias("n_keys"),
        F.round(tot_d, 2).alias("total_value"),
        F.round(
            F.try_divide(F.col("__sumsq").cast("double"), tot_d * tot_d),
            round_to,
        ).alias("hhi"),
        F.round(
            F.try_divide(F.col("__topv").cast("double"), tot_d), round_to
        ).alias("top_share"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Pre-flight cardinality forecast for an equi-join, in one row:
    per-side distinct keys, matching keys, the EXACT output row count
    the join would produce (sum over matching keys of count_l *
    count_r — exact for inner equi-joins, no sampling), and the
    hottest key with its share. Run this BEFORE a big join: "those two
    1 TB tables will emit 40 B rows, and one key contributes 38 B" is
    the fact that changes the plan (pre-aggregate, salt, or rethink)
    — after the OOM it's a post-mortem.

    Cost: one map-combined count per side (tiny per-key frames), one
    equi-join of those key-count frames — never the data join itself.
    Per-key products and their sum ride wide DECIMALs: two billion-row
    hot sides overflow int64, and ANSI mode makes that a job-killer
    rather than a wrong answer. Totals and the TakeOrdered top-1
    reduce the SAME joined frame (AQE reuses the exchange); the two
    1-row frames broadcast-attach.
    """
    cl = left.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    cr = right.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("nr")
    )
    # FULL OUTER on the per-key count frames: every side/match/product
    # stat reduces this ONE frame, so neither input is scanned twice
    # (a separate per-side distinct-count branch would re-run the scan)
    m = cl.join(cr, "key", "full_outer")
    contrib = F.when(
        F.col("nl").isNotNull() & F.col("nr").isNotNull(),
        F.col("nl").cast("decimal(19,0)") * F.col("nr").cast("decimal(19,0)"),
    )
    marked = m.select("key", "nl", "nr", contrib.alias("rows_out"))
    totals = marked.agg(
        F.sum(F.when(F.col("nl").isNotNull(), 1).otherwise(0)).alias(
            "n_keys_left"
        ),
        F.sum(F.when(F.col("nr").isNotNull(), 1).otherwise(0)).alias(
            "n_keys_right"
        ),
        F.sum(F.when(F.col("rows_out").isNotNull(), 1).otherwise(0)).alias(
            "__nkeys"
        ),
        F.sum("rows_out").alias("__rows"),
    )
    top = (
        marked.filter(F.col("rows_out").isNotNull())
        .orderBy(F.desc("rows_out"), F.asc("key"))
        .limit(1)
        .select(
            F.col("key").alias("top_key"),
            F.col("rows_out").alias("__top_rows"),
        )
    )
    # totals LEFT-joins the (possibly EMPTY, when zero keys match)
    # top-1 frame so the report always returns exactly one row
    return totals.join(F.broadcast(top), F.lit(True), "left").select(
        F.col("n_keys_left").cast("long").alias("n_keys_left"),
        F.col("n_keys_right").cast("long").alias("n_keys_right"),
        F.col("__nkeys").cast("long").alias("n_matching_keys"),
        F.col("__rows").cast("long").alias("predicted_rows"),
        F.col("top_key"),
        F.col("__top_rows").cast("long").alias("top_key_rows"),
        F.round(
            F.try_divide(
                F.col("__top_rows").cast("double"),
                F.col("__rows").cast("double"),
            ),
            round_to,
        ).alias("top_share"),
    )
