"""Training-mix resampling: shape a corpus to target group quotas.

A 100 TB pretraining pipeline rarely trains on the crawl's natural
source/language distribution — it resamples to a target mix (e.g. 60%
en, 20% de, ...). This operator takes an exact per-group quota and
selects rows DETERMINISTICALLY (md5-hash order, the repo's
oracle-portable convention — Spark's RNG sampler can't be replayed by
another engine), so the same corpus + quotas always yields the same
training set. One keyed window per group; no collect, no RNG.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _uniform60(group_col: str, salt: str) -> Column:
    """The repo's salted md5 uniform in one place: 60-bit integer from
    the first 15 md5 hex chars of ``str(group) || salt`` (exact as
    int64; 16 chars would overflow). NULL group keys hash the literal
    sentinel ``'\\x00null'`` — every assignment built on this therefore
    gives NULL-keyed rows ONE deterministic destination instead of the
    silent NULL-propagates-to-NULL drop (a NULL fold/split falls out of
    both sides of every filter). Shared by :func:`grouped_split` and
    :func:`grouped_kfold`; ``dedup.string_to_int_hash`` is the unsalted
    MERSENNE-mod sibling for sketch math."""
    key = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00null"))
    return F.conv(
        F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 15), 16, 10
    ).cast("long")


def resample_to_quotas(
    df: DataFrame,
    group_col: str,
    quotas: Mapping[str, int],
    order_col: str,
) -> DataFrame:
    """Keep the first `quotas[g]` md5-ordered rows of each group.

    Groups absent from `quotas` are dropped (mix says zero). Groups
    with fewer rows than their quota keep everything they have — the
    caller can compare achieved vs requested counts downstream. Adds
    ``mix_rank`` (1-based position within the group's md5 order).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(order_col).cast("string")), F.col(order_col)
    )
    quota = _quota_expr(F.col(group_col), quotas)
    return (
        df.withColumn("mix_rank", F.row_number().over(w))
        .filter(F.col("mix_rank") <= quota)
        .withColumn("mix_rank", F.col("mix_rank").cast("long"))
    )


def _quota_expr(group: Column, quotas: Mapping[str, int]) -> Column:
    expr = F.lit(0)
    for key, k in sorted(quotas.items()):
        expr = F.when(group == key, F.lit(int(k))).otherwise(expr)
    return expr


def achieved_mix(df: DataFrame, group_col: str) -> DataFrame:
    """Per-group achieved counts + fraction of total (one aggregate +
    a broadcast of the single-row total; the audit record that belongs
    next to every resampled training set)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    total_w = Window.partitionBy()
    return counts.select(
        group_col,
        "n",
        F.round(F.col("n") / F.sum("n").over(total_w), 6).alias("fraction"),
    )


def training_order(
    df: DataFrame,
    id_col: str,
    num_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic corpus shuffle for training: assign every row a
    (shard, pos) — shard by md5 bucket, position by md5 order within
    the shard. The "shuffle the data before training" step, with no RNG
    anywhere: the same corpus + salt always yields the same order, any
    engine can replay it, and a different ``salt`` (e.g. the epoch
    number) gives an independent reshuffle.

    No global window: ordering is per-shard (``row_number`` partitioned
    by shard), so parallelism == num_shards. Choose num_shards so one
    shard ≈ one output file at the target size (100 TB / 256 MB ≈ 400k
    shards), never a small constant — the per-shard sort is the only
    O(shard) step.
    """
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    shard = F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % num_shards
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (
        df.select(F.col(id_col), key.alias("__key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def grouped_split(
    df: DataFrame,
    group_col: str,
    fractions: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of a GROUP
    (domain, source, near-dup cluster id, ...) lands in the same split,
    so evaluation never sees shards of a training document — the
    standard guard against contamination-by-construction that a plain
    row-level ``randomSplit`` violates.

    Deterministic md5-threshold on the group key (the repo's
    oracle-portable convention, no RNG): a group's md5/2^60 maps to
    [0,1), and cumulative fraction thresholds carve the splits in the
    caller-given order. Same corpus + salt => same assignment in any
    engine; changing ``salt`` re-deals the groups. Map-only — the
    assignment is a row-local expression on ``group_col``; nothing
    shuffles. Expect split sizes to deviate from the fractions by the
    group-size distribution (whole groups move together — that is the
    point); assert on group-atomicity, not exact row counts.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    u = _uniform60(group_col, salt).cast("double") / F.lit(float(1 << 60))
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        # round the accumulated threshold to 12 places: 0.8 + 0.1
        # accumulates to 0.9000000000000001 in binary, one ulp ABOVE
        # the 0.9 literal an oracle/spec would write — a group whose
        # uniform lands exactly on the literal would then split
        # differently between engines
        acc = round(acc + fractions[name], 12)
        expr = (
            F.when(u < acc, F.lit(name))
            if expr is None
            else expr.when(u < acc, F.lit(name))
        )
    last = F.lit(names[-1])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", assigned)


def grouped_kfold(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    salt: str = "",
    fold_col: str = "fold",
) -> DataFrame:
    """Group-aware k-fold assignment: fold = md5(group‖salt) mod k, so
    every row of a group lands in the same fold — cross-validation
    without cross-fold leakage of near-identical rows (the same
    contamination guard as :func:`grouped_split`, dealt k ways).
    Map-only, no RNG, engine-replayable; ``salt`` re-deals. NULL group
    keys get a deterministic fold via the shared sentinel (a NULL fold
    would silently vanish from BOTH sides of every train/val filter)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(fold_col, (_uniform60(group_col, salt) % k).cast("bigint"))


def time_split(
    df: DataFrame,
    ts_col: str,
    train_until: str,
    test_from: str,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split with an embargo gap:
    train strictly before ``train_until``, test at/after ``test_from``,
    and everything between labeled ``embargo`` (dropped by the caller).
    The gap is the defense against look-ahead leakage when features are
    windowed aggregates — a trailing 7-day feature computed at the first
    test timestamp must not overlap training rows, so the embargo must
    be at least the longest feature window.

    Map-only (three literal comparisons, whole-stage codegen); the
    cutoffs are plan literals, so partition pruning applies when the
    table is date-partitioned. NULL timestamps label ``embargo`` — never
    silently train — via the otherwise() branch."""
    if not train_until <= test_from:
        raise ValueError(
            f"embargo gap is negative: train_until={train_until!r} "
            f"must be <= test_from={test_from!r}"
        )
    ts = F.col(ts_col)
    return df.withColumn(
        split_col,
        F.when(ts < F.to_timestamp(F.lit(train_until)), "train")
        .when(ts >= F.to_timestamp(F.lit(test_from)), "test")
        .otherwise("embargo"),
    )


def weighted_sample_topk(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "aes",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): per group keep the k rows maximizing ``u^(1/w)``
    with ``u`` the salted-md5 uniform of the row id — selection
    probability proportional to weight, zero RNG, bit-replayable across
    engines and re-runs (the repo's sampling discipline: engine RNG is
    unverifiable, md5 math is oracle-checkable).

    Map-only key computation + ONE per-group top-k window. The sort key
    is rounded at 12 with the id as tiebreak, so a last-ulp libm ``pow``
    disagreement between engines can't flip a rank. Rows with NULL or
    non-positive weight are excluded — A-ES is undefined there, and a
    silent 0-weight keep would be a sampling bug."""
    u = (_uniform60(id_col, salt) + 1).cast("double") / F.lit(
        float(1 << 60)
    )
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 12
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("__aes_key"), F.asc(id_col)
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__aes_key", key)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__aes_key", "__rk")
    )


def budget_allocation(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    cap_col: str,
    budget: float,
    round_to: int = 4,
) -> DataFrame:
    """Water-filling budget allocation: split a total ``budget`` (token
    count, sample count) across groups proportionally to ``weight_col``
    but never above each group's availability ``cap_col`` —
    ``alloc_i = min(cap_i, λ·w_i)`` with λ chosen so the allocations sum
    to the budget (every group saturates when budget ≥ Σcap). The mix-
    planning step after temperature weighting: naive proportional quotas
    overshoot small sources and waste budget; water-filling reallocates
    their overflow exactly.

    Closed form, no iteration: sort groups by saturation point
    ``r = cap/w``; saturation is prefix-closed in that order, so the
    crossing prefix falls out of cumulative-sum windows and
    λ = (budget − Σ_sat cap) / (Σw − Σ_sat w). ``df`` must already be
    ONE ROW PER GROUP (an aggregated frame) — every window here runs
    over |groups| rows, never data. Rows with NULL/non-positive weight
    allocate 0 (they can't absorb budget). Double math is fixed-shape
    and rounded at ``round_to`` for cross-engine parity."""
    from pyspark.sql.window import Window

    B = float(budget)
    valid = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    invalid = df.filter(
        F.col(weight_col).isNull() | (F.col(weight_col) <= 0)
    ).select(
        group_col,
        F.col(weight_col).cast("double").alias("weight"),
        F.col(cap_col).cast("double").alias("cap"),
        F.lit(0.0).alias("alloc"),
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("__r", group_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = valid.select(
        group_col,
        F.col(weight_col).cast("double").alias("__w"),
        F.col(cap_col).cast("double").alias("__cap"),
    ).withColumn("__r", F.try_divide("__cap", "__w"))
    cum = staged.select(
        group_col,
        "__w",
        "__cap",
        "__r",
        F.row_number().over(Window.orderBy("__r", group_col)).alias("__rn"),
        F.try_divide(
            F.lit(B) - F.sum("__cap").over(w_ord),
            F.sum("__w").over(w_all) - F.sum("__w").over(w_ord),
        ).alias("__lam_i"),
        (F.sum("__w").over(w_all)).alias("__tw"),
    ).withColumn(
        "__sat",
        F.col("__lam_i").isNotNull() & (F.col("__r") <= F.col("__lam_i")),
    )
    resolved = cum.withColumn(
        "__p", F.max(F.when(F.col("__sat"), F.col("__rn"))).over(w_all)
    ).withColumn(
        "__lam_sat",
        F.max(
            F.when(F.col("__rn") == F.col("__p"), F.col("__lam_i"))
        ).over(w_all),
    )
    lam = F.coalesce(F.col("__lam_sat"), F.lit(B) / F.col("__tw"))
    out = resolved.select(
        group_col,
        F.col("__w").alias("weight"),
        F.col("__cap").alias("cap"),
        F.round(F.least(F.col("__cap"), lam * F.col("__w")), round_to).alias(
            "alloc"
        ),
    )
    return out.unionByName(invalid)


def top_p_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    p: float,
    id_col: str,
) -> DataFrame:
    """Nucleus (top-p) selection per group: rank rows by ``score_col``
    descending (``id_col`` ascending as the deterministic tiebreak) and
    keep the smallest prefix whose score mass reaches fraction ``p`` of
    the group total — the row that crosses the threshold is KEPT. The
    budget-trimming primitive for "keep the best 80% of chars/tokens
    per source" corpus curation.

    Scores must be non-negative (a negative score makes "mass"
    meaningless and the running sum non-monotone) — violations raise at
    plan-build time cost only if caught by the caller; this function
    documents the contract rather than paying a full validation scan.

    Shape: one exchange on the group key; the ordered running sum and
    the group total are windows over the SAME partitioning (the second
    WindowExec reuses the first's shuffle). Scores accumulate as
    DECIMAL(18,6) and the threshold multiplies DECIMAL-exactly, so the
    keep boundary is bit-identical across engines and layouts — a
    double running sum could flip the crossing row at ~1e-12.
    """
    if not 0 < p <= 1:
        raise ValueError(f"p must be in (0, 1], got {p}")
    from decimal import Decimal

    from pyspark.sql.window import Window

    s = F.col(score_col).cast("decimal(18,6)")
    w_ord = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = F.sum(s).over(w_ord)
    total = F.sum(s).over(w_all)
    # keep while the mass BEFORE this row is still short of p*total —
    # includes the crossing row; any group with positive mass keeps at
    # least its top row, an all-zero group keeps nothing (no mass to
    # cover)
    thresh = total * F.lit(Decimal(str(p)).quantize(Decimal("0.000001")))
    return df.withColumn("keep", (cum - s) < thresh)


def preference_pairs(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    id_col: str,
) -> DataFrame:
    """Best-vs-worst preference-pair construction (DPO/RLHF-style):
    within each group, rank rows by (score desc, id) and pair the i-th
    best with the i-th worst for i = 1..floor(n/2), so every pair has
    chosen_score >= rejected_score and no row appears twice (the odd
    middle row sits out). Deterministic — id tiebreaks, no RNG.

    Scale: ONE ranking window, then each row computes its own pair
    index (i = rb for the best half, n+1-rb for the worst half) and a
    groupBy(group, i) folds the two halves into pair rows — no
    self-join, so the window subtree executes ONCE (a best/worst
    branch join re-runs the whole scan+window per side: the
    branches-re-execute-upstream landmine). The groupBy keys extend
    the window's partition keys, so the exchange is a cheap
    repartition of already-grouped data; pair count is bounded by
    n/2 per group. NULL group keys form their own group (groupBy is
    null-safe, unlike a name-list join).

    Returns group cols + ``chosen_id``, ``rejected_id``, ``margin``
    (chosen score - rejected score, input type).
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("_score"), F.asc("_id")
    )
    ranked = df.select(
        *group_cols,
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_score"),
    ).withColumn("_rb", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    rb, n = F.col("_rb"), F.col("_n")
    # best half: rb <= n/2; worst half: rb > ceil(n/2) == n - floor(n/2);
    # the odd middle row matches neither and drops out
    role = F.when(rb <= n / 2, F.lit("c")).when(
        rb > n - F.floor(n / 2), F.lit("r")
    )
    halves = ranked.select(
        *group_cols,
        role.alias("_role"),
        F.when(role == "c", rb).otherwise(n + 1 - rb).alias("_i"),
        "_id",
        "_score",
    ).filter(F.col("_role").isNotNull())
    is_c = F.col("_role") == "c"
    # exactly one row per role per (group, i): max() just extracts it
    return halves.groupBy(*group_cols, "_i").agg(
        F.max(F.when(is_c, F.col("_id"))).alias("chosen_id"),
        F.max(F.when(~is_c, F.col("_id"))).alias("rejected_id"),
        (
            F.max(F.when(is_c, F.col("_score")))
            - F.max(F.when(~is_c, F.col("_score")))
        ).alias("margin"),
    ).drop("_i")
