"""Data-governance operators: right-to-be-forgotten purge cascades and
l-diversity release audits.

A training corpus built from user data needs two governance primitives
the cleaning/dedup stack doesn't cover: (1) deleting every row a
deletion-request key touches — across ALL the tables the key cascades
into — with an auditable accounting of what was removed, and (2) the
l-diversity refinement of k-anonymity (``profile.k_anonymity_report``):
an equivalence class can be large (k-safe) yet still leak its sensitive
attribute when every member shares the same value.

Scale shape: deletion-request key sets are tiny relative to the facts
(regulatory request volumes, not data volumes), so every purge is a
broadcast anti/semi-join — the fact tables never shuffle. The audit
counts ride a broadcast LEFT join + one map-combined aggregate per
table, one pass each. Derived key sets (e.g. the order keys owned by
purged customers) can outgrow a broadcast at extreme scale; the
cascade helpers take plain DataFrames so the caller can drop the
broadcast hint and let AQE pick a shuffle join for those hops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from sparkprep.checkpointing import lazy_checkpoint


def purge_keys(
    df: DataFrame, key_col: str, keys: DataFrame, keys_col: str | None = None
) -> DataFrame:
    """Rows of ``df`` that survive the purge: anti-join against the
    deletion-request key set (broadcast — the request set is small).

    NULL ``key_col`` rows survive: a NULL key cannot match any request,
    and anti-join's NULL semantics already guarantee that — no guard
    needed on either engine.
    """
    keys_col = keys_col or key_col
    req = keys.select(F.col(keys_col).alias(key_col)).dropDuplicates()
    return df.join(F.broadcast(req), on=key_col, how="left_anti")


def derive_keys(
    df: DataFrame,
    key_col: str,
    out_col: str,
    keys: DataFrame,
    keys_col: str | None = None,
) -> DataFrame:
    """The next hop of a cascade: the distinct ``out_col`` values owned
    by rows matching the current key set (semi-join, then project).
    E.g. purged customers -> the order keys of their orders, which then
    purge lineitem."""
    keys_col = keys_col or key_col
    req = keys.select(F.col(keys_col).alias(key_col)).dropDuplicates()
    return (
        df.join(F.broadcast(req), on=key_col, how="left_semi")
        .select(out_col)
        .dropDuplicates()
    )


def purge_audit(
    tables: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Per-table purge accounting in ONE pass per table: for each
    ``(table_name, df, key_col, keys_df, keys_col)`` report
    ``rows_before / rows_removed / rows_after``.

    Each table's counts come from a broadcast LEFT join against its key
    set plus a single map-combined aggregate — never a separate
    before-count and after-count job (two scans), and the removed rows
    are counted, not materialized. The per-table 1-row aggregates
    union; each branch reads a DIFFERENT table, so this is not the
    unions-of-selects-from-one-source re-execution trap.
    """
    rows = []
    for name, df, key_col, keys_df, keys_col in tables:
        req = (
            keys_df.select(F.col(keys_col).alias(key_col))
            .dropDuplicates()
            .withColumn("__purge", F.lit(1))
        )
        marked = df.select(key_col).join(
            F.broadcast(req), on=key_col, how="left"
        )
        agg = marked.agg(
            F.count(F.lit(1)).alias("rows_before"),
            F.coalesce(F.sum("__purge"), F.lit(0)).alias("rows_removed"),
        )
        rows.append(
            agg.select(
                F.lit(name).alias("table_name"),
                F.col("rows_before").cast("long").alias("rows_before"),
                F.col("rows_removed").cast("long").alias("rows_removed"),
                (F.col("rows_before") - F.col("rows_removed"))
                .cast("long")
                .alias("rows_after"),
            )
        )
    return reduce(DataFrame.unionByName, rows)


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit: each quasi-identifier equivalence class with
    its size, the number of DISTINCT sensitive values it contains, an
    ``at_risk`` flag (fewer than ``l`` distinct values — everyone in
    the class is outed), and the dataset-wide ``l_level`` (the min:
    the l for which the dataset IS l-diverse).

    One exchange keyed on the quasi-identifier (count_distinct of one
    column inside a single groupBy is the two-phase distinct aggregate,
    not the Expand trap of multiple distinct aggs); the l_level window
    runs over the already-aggregated |classes|-row frame only. NULL
    sensitive values are not counted as a diversity value (both
    engines' count_distinct skips NULLs) — a class of all-NULL
    sensitive rows reports 0 distinct values and flags at_risk, which
    is the conservative reading a release gate wants.
    """
    from pyspark.sql.window import Window

    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("l_count"),
    )
    w = Window.partitionBy()
    return classes.select(
        *quasi_cols,
        F.col("class_size").cast("long").alias("class_size"),
        F.col("l_count").cast("long").alias("l_count"),
        (F.col("l_count") < F.lit(l)).alias("at_risk"),
        F.min("l_count").over(w).cast("long").alias("l_level"),
    )


def pseudonym(c, salt: str = "") -> Column:
    """Deterministic salted pseudonym for a key column: md5 of
    salt‖value, hex-truncated to 16 chars. Same key + salt → same
    token in any engine (joinability across pseudonymized tables is
    preserved); rotating the salt re-keys the whole corpus — the
    GDPR-pseudonymization primitive that keeps analytics joins
    working after direct identifiers are dropped. 64 bits of md5
    keeps collisions ~n²/2⁶⁵; audit with :func:`pseudonym_audit`
    before trusting a release."""
    col = F.col(c) if isinstance(c, str) else c
    return F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 16)


def pseudonym_audit(
    df: DataFrame, key_col: str, salt: str = ""
) -> DataFrame:
    """Release gate for :func:`pseudonym`: distinct keys vs distinct
    tokens and the collision count (keys sharing a token). Two
    count_distincts in one aggregate over the deduped (key, token)
    frame — the dedup is ONE keyed exchange; NULL keys are excluded
    (they pseudonymize to NULL, not a token)."""
    pairs = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("__k"))
        .dropDuplicates()
        .select("__k", pseudonym(F.col("__k"), salt).alias("__t"))
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.count_distinct("__t").cast("long").alias("n_tokens"),
        (F.count(F.lit(1)) - F.count_distinct("__t"))
        .cast("long")
        .alias("collisions"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """t-closeness audit (Li et al., ICDE 2007): for each
    quasi-identifier class, the Earth Mover's Distance between the
    class's distribution over an ORDERED sensitive attribute and the
    global distribution — the release gate k-anonymity/l-diversity
    can't express (a class can be large AND diverse yet still skewed
    toward one end of the income scale).

    For ordered categories, EMD = Σ_b |cumP(b) − cumQ(b)| / (B−1).
    Everything stays exact int64/DECIMAL until one final division:
    with class counts c, global counts g, class size n, total N,
    |cumP − cumQ| = |cum_c·N − cum_g·n| / (n·N), so the per-class sum
    accumulates the integer numerator |cum_c·N − cum_g·n| and divides
    ONCE by n·N·(B−1).

    Shapes: the global bucket panel is a bounded driver collect
    (O(|buckets|), the numeric.py one-job-scalar contract); each class
    row EXPLODES the literal (bucket, cum_g) array — a row-local
    densification, never a cross join (CartesianProduct is banned
    repo-wide) — so classes missing a bucket still contribute the
    flat-cum |difference| terms; the per-class cumulative window runs
    over the |classes|×|buckets| aggregated grid. NULL sensitive
    values drop (no position on the ordered scale — mirror in any
    oracle with a WHERE).
    """
    from pyspark.sql.window import Window

    staged = df.filter(F.col(sensitive_col).isNotNull())
    # cb anchors three consumers (panel collect, class fold, grid
    # join) — truncate lineage or the source scan re-executes per use
    cb = (
        staged.groupBy(*quasi_cols, F.col(sensitive_col).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .transform(lazy_checkpoint)
    )
    panel = (
        cb.groupBy("__b")
        .agg(F.sum("__cnt").alias("__g"))
        .orderBy("__b")
        .collect()
    )
    if not panel:
        raise ValueError("t_closeness_report: no non-NULL sensitive rows")
    total = sum(r["__g"] for r in panel)
    n_buckets = len(panel)
    cum, lits = 0, []
    for r in panel:
        cum += r["__g"]
        lits.append(
            F.struct(
                F.lit(r["__b"]).alias("b"), F.lit(cum).alias("cg")
            )
        )
    classes = cb.groupBy(*quasi_cols).agg(
        F.sum("__cnt").alias("class_size")
    )
    grid = classes.select(
        *quasi_cols,
        "class_size",
        F.explode(F.array(*lits)).alias("__bk"),
    ).select(
        *quasi_cols,
        "class_size",
        F.col("__bk.b").alias("__b"),
        F.col("__bk.cg").alias("__cg"),
    )
    joined = grid.join(F.broadcast(cb), [*quasi_cols, "__b"], "left")
    w_cum = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ADVICE r6: cast the cumulative counts to DECIMAL *before* the
    # multiplications — cum*N in int64 overflows under ANSI at
    # multi-billion-row N while the DuckDB oracle auto-promotes to
    # HUGEINT. DECIMAL(19,0) operands make the product DECIMAL(38,0)
    # (exact to ~1e38), matching the oracle's headroom.
    _d19 = "decimal(19,0)"
    term = F.abs(
        F.sum(F.coalesce(F.col("__cnt"), F.lit(0))).over(w_cum).cast(_d19)
        * F.lit(int(total)).cast(_d19)
        - F.col("__cg").cast(_d19) * F.col("class_size").cast(_d19)
    )
    per = joined.select(
        *quasi_cols, "class_size", term.alias("__term")
    ).groupBy(*quasi_cols, "class_size").agg(
        F.sum("__term").alias("__s")
    )
    t_val = F.round(
        F.try_divide(
            F.col("__s").cast("double"),
            F.col("class_size").cast("double")
            * F.lit(float(total))
            * F.lit(float(n_buckets - 1)),
        ),
        round_to,
    )
    w_all = Window.partitionBy()
    out = per.select(
        *quasi_cols,
        F.col("class_size").cast("long").alias("class_size"),
        t_val.alias("t_closeness"),
    )
    return out.select(
        "*",
        (F.col("t_closeness") > F.lit(float(t))).alias("at_risk"),
        F.max("t_closeness").over(w_all).alias("t_level"),
    )
