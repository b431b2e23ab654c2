"""Declarative data-quality constraint suite (Deequ-style expectations)
and PSI distribution-drift detection.

The reference verified data quality by eyeballing ``describe()`` /
``groupBy(label).count().show()`` between prep steps
(dedup+invalid.ipynb:9588-9607, mssql.ipynb:575). This module turns the
same checks into a declarative, machine-readable gate a pipeline can
FAIL on — the standard pattern for production data-prep (AWS Deequ,
Great Expectations), re-expressed as native Spark aggregates.

Scale notes (100 TB):

- The whole suite evaluates in ONE aggregate pass over the table: every
  constraint contributes conditional-count expressions to a single
  ``df.agg(...)``, so the data is scanned once, map-side combined, and
  one tiny row crosses the shuffle per partition. Adding constraints
  adds columns to that row, not passes over the data.
- ``uniqueness`` is the exception: exact ``count_distinct`` inside a
  shared agg makes Catalyst plan an Expand (one duplicated stream per
  distinct-agg) — at scale that multiplies the shuffled bytes by the
  number of uniqueness constraints. Default is therefore HLL++
  (``approx_count_distinct``, one pass, mergeable sketch, no Expand);
  ``exact=True`` opts into the Expand for oracle-grade parity on
  small/medium data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One constraint: a metric expression over the table and a closed
    predicate on its value. ``metric`` must be an aggregate Column
    yielding DOUBLE (ratios) or BIGINT (counts)."""

    name: str
    metric: Column
    lo: float | None = None  # inclusive lower bound on the metric
    hi: float | None = None  # inclusive upper bound


def completeness(col: str, min_ratio: float = 1.0, name: str | None = None) -> Check:
    """Share of non-null values in ``col`` must be >= min_ratio.
    An EMPTY frame scores 0.0 (the guard matters: ANSI mode makes an
    unguarded 0/0 throw DIVIDE_BY_ZERO instead of failing the check)."""
    return Check(
        name=name or f"completeness({col})",
        metric=(F.count(col) / F.greatest(F.count(F.lit(1)), F.lit(1))).cast("double"),
        lo=min_ratio,
    )


def non_negative(col: str, name: str | None = None) -> Check:
    """Every non-null value in ``col`` must be >= 0."""
    return Check(
        name=name or f"non_negative({col})",
        metric=F.count(F.when(F.col(col) < 0, True)).cast("double"),
        hi=0.0,
    )


def in_range(
    col: str, lo: float, hi: float, min_ratio: float = 1.0, name: str | None = None
) -> Check:
    """Share of non-null values inside [lo, hi] must be >= min_ratio."""
    inside = F.count(F.when(F.col(col).between(lo, hi), True))
    return Check(
        name=name or f"in_range({col})",
        metric=(inside / F.greatest(F.count(col), F.lit(1))).cast("double"),
        lo=min_ratio,
    )


def in_set(
    col: str, values: list, min_ratio: float = 1.0, name: str | None = None
) -> Check:
    """Share of non-null values that are members of ``values``."""
    member = F.count(F.when(F.col(col).isin(list(values)), True))
    return Check(
        name=name or f"in_set({col})",
        metric=(member / F.greatest(F.count(col), F.lit(1))).cast("double"),
        lo=min_ratio,
    )


def matches(
    col: str, regex: str, min_ratio: float = 1.0, name: str | None = None
) -> Check:
    """Share of non-null values matching ``regex`` (Java/POSIX-shared
    subset if DuckDB-oracle parity matters — SURVEY §7)."""
    ok = F.count(F.when(F.col(col).rlike(regex), True))
    return Check(
        name=name or f"matches({col})",
        metric=(ok / F.greatest(F.count(col), F.lit(1))).cast("double"),
        lo=min_ratio,
    )


def size_between(lo: int, hi: int | None = None, name: str | None = None) -> Check:
    """Table row count within [lo, hi]."""
    return Check(
        name=name or "size",
        metric=F.count(F.lit(1)).cast("double"),
        lo=float(lo),
        hi=float(hi) if hi is not None else None,
    )


def mean_between(col: str, lo: float, hi: float, name: str | None = None) -> Check:
    return Check(
        name=name or f"mean({col})", metric=F.avg(col).cast("double"), lo=lo, hi=hi
    )


def uniqueness(
    col: str, min_ratio: float = 1.0, exact: bool = False, name: str | None = None
) -> Check:
    """distinct(col)/count(col) — approximate by default (see module
    docstring for why exact distinct in a shared agg is a scale trap)."""
    distinct = (
        F.count_distinct(F.col(col)) if exact else F.approx_count_distinct(col)
    )
    return Check(
        name=name or f"uniqueness({col})",
        metric=(distinct / F.greatest(F.count(col), F.lit(1))).cast("double"),
        lo=min_ratio,
    )


@dataclass
class Suite:
    """A named set of checks evaluated in one aggregate pass.

    ``report_df`` returns the long-form result table
    (check, metric, lo, hi, passed) — the DataFrame stays declarative so
    a pipeline can join/filter/sink it; ``run`` collects it into a
    pass/fail dict for control flow.
    """

    checks: list[Check] = field(default_factory=list)

    def report_df(self, df: DataFrame, round_to: int = 6) -> DataFrame:
        if not self.checks:
            raise ValueError("Suite has no checks — nothing to report")
        names = [c.name for c in self.checks]
        if len(set(names)) != len(names):
            dups = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(
                f"duplicate check names {dups} — two checks of the same kind "
                "on one column need explicit name= overrides or run()'s "
                "verdict dict silently drops one"
            )
        aggs = [
            F.round(c.metric, round_to).alias(f"__m_{i}")
            for i, c in enumerate(self.checks)
        ]
        wide = df.agg(*aggs)
        # one row per check via explode-over-struct-array (NOT a union of
        # selects from `wide` — that re-executes the agg per check)
        rows = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.col(f"__m_{i}").alias("metric"),
                    F.lit(c.lo).cast("double").alias("lo"),
                    F.lit(c.hi).cast("double").alias("hi"),
                )
                for i, c in enumerate(self.checks)
            ]
        )
        out = wide.select(F.explode(rows).alias("r")).select("r.*")
        passed = F.lit(True)
        passed = passed & F.when(F.col("lo").isNotNull(), F.col("metric") >= F.col("lo")).otherwise(True)
        passed = passed & F.when(F.col("hi").isNotNull(), F.col("metric") <= F.col("hi")).otherwise(True)
        # an unmeasurable metric (all-NULL column -> avg NULL) is a
        # FAILED check, not a NULL one: passed==false filters must see
        # it, and three-valued logic would leak NULL through the ANDs
        passed = F.when(F.col("metric").isNull(), F.lit(False)).otherwise(passed)
        return out.withColumn("passed", passed)

    def run(self, df: DataFrame) -> dict:
        rows = self.report_df(df).collect()
        return {
            "passed": all(r["passed"] for r in rows),
            "checks": {
                r["check"]: {"metric": r["metric"], "passed": r["passed"]}
                for r in rows
            },
        }


def psi_drift(
    before: DataFrame,
    after: DataFrame,
    col: str,
    breakpoints: list[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of ``col``.

    PSI = Σ_bins (p_after − p_before) · ln(p_after / p_before), the
    standard drift score for monitoring a feature between a training
    snapshot and fresh data (rule of thumb: <0.1 stable, 0.1–0.25
    moderate shift, >0.25 action needed).

    Design for scale:

    - ``breakpoints`` are EXPLICIT bin edges (caller derives them once —
      e.g. from training-time quantiles). Deriving edges in here from
      quantiles of `before` would make the report nondeterministic under
      resampling and add a percentile pass per call.
    - Each side is reduced map-side by a single groupBy on the bin id
      (one tiny row per bin per partition crosses the shuffle); the two
      K-row bin tables join and fold into one PSI row. Nothing about the
      raw tables meets except through those K-row aggregates.
    - Empty bins are smoothed with ``eps`` (standard practice) so a bin
      present on one side only contributes a finite term instead of ±inf.

    Returns one row: (column, psi, n_bins) with per-bin shares available
    via :func:`psi_bins` when the detail matters.
    """
    bins = psi_bins(before, after, col, breakpoints, eps)
    return bins.agg(
        F.first(F.lit(col)).alias("column"),
        F.round(F.sum("psi_term"), 6).alias("psi"),
        F.count(F.lit(1)).alias("n_bins"),
    )


def _check_edges(breakpoints: list[float]) -> list[float]:
    edges = [float(b) for b in breakpoints]
    if len(edges) < 2:
        raise ValueError(
            f"breakpoints must define at least one bin (>= 2 edges), got {edges}"
        )
    if sorted(edges) != edges or len(set(edges)) != len(edges):
        raise ValueError("breakpoints must be strictly increasing")
    return edges


def _bin_expr(c: Column, edges: list[float]) -> Column:
    """Bin id for value column ``c``: interior edges only — below
    edges[1] -> 0, >= edges[-2] -> top bin (clamped open tails)."""
    b = F.lit(0)
    for i, edge in enumerate(edges[1:-1], start=1):
        b = F.when(c >= edge, i).otherwise(b)
    return b.cast("bigint")


def reference_shares(
    df: DataFrame, col: str, breakpoints: list[float]
) -> dict[int, float]:
    """Bin-share table of a reference snapshot as a plain dict — compute
    ONCE at monitor setup, then score arbitrarily many batches against
    it with :func:`psi_against_reference`. The collect is O(n_bins)."""
    edges = _check_edges(breakpoints)
    rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(_bin_expr(F.col(col), edges).alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in rows) or 1
    shares = {i: 0.0 for i in range(len(edges) - 1)}
    shares.update({int(r["bin_id"]): r["n"] / total for r in rows})
    return shares


def psi_against_reference(
    df: DataFrame,
    col: str,
    breakpoints: list[float],
    ref_shares: dict[int, float],
    eps: float = 1e-6,
) -> DataFrame:
    """One-row (psi, n_bins, rows) of ``df``'s ``col`` distribution
    against precomputed :func:`reference_shares` — the monitoring
    shape: the reference is never re-aggregated, and each scored batch
    costs exactly ONE job (a map-combined groupBy on the bin id).
    ``rows`` is the full frame count — NULL values land in a sentinel
    bin that is excluded from the shares but counted, so callers never
    need a second count() pass over the batch. An empty (or all-NULL)
    frame reports rows accordingly with psi NULL."""
    edges = _check_edges(breakpoints)
    c = F.col(col)
    binned = F.when(c.isNull(), F.lit(-1).cast("bigint")).otherwise(
        _bin_expr(c, edges)
    )
    counts = df.groupBy(binned.alias("bin_id")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    from pyspark.sql import Window

    scored_total = F.sum(F.when(F.col("bin_id") >= 0, F.col("__n"))).over(
        Window.partitionBy()
    )
    all_total = F.sum("__n").over(Window.partitionBy())
    shares = counts.select(
        "bin_id",
        (F.col("__n") / F.greatest(scored_total, F.lit(1))).alias("share_now"),
        all_total.alias("__rows"),
    )
    nb = len(edges) - 1
    grid = df.sparkSession.createDataFrame(
        [(i, float(ref_shares.get(i, 0.0))) for i in range(nb)],
        "bin_id: bigint, share_ref: double",
    )
    joined = grid.join(
        F.broadcast(shares.filter(F.col("bin_id") >= 0)), "bin_id", "left"
    ).fillna({"share_now": 0.0})
    p = F.greatest(F.col("share_now"), F.lit(eps))
    q = F.greatest(F.col("share_ref"), F.lit(eps))
    # totals ride along via max() (constant across joined bins; NULL
    # where no data rows joined -> coalesce to 0). psi is only
    # meaningful when something was scored: an empty/all-NULL batch
    # would otherwise read as maximal drift vs the reference.
    agg = joined.agg(
        F.round(F.sum((p - q) * F.log(p / q)), 4).alias("__psi_raw"),
        F.count(F.lit(1)).alias("n_bins"),
        F.coalesce(F.max("__rows"), F.lit(0)).cast("long").alias("rows"),
        F.coalesce(F.max(F.col("share_now") > 0).cast("int"), F.lit(0)).alias("__any"),
    )
    return agg.select(
        F.when(F.col("__any") == 1, F.col("__psi_raw")).alias("psi"),
        "n_bins",
        "rows",
    )


def psi_bins_cohorts(
    df: DataFrame,
    cohort_expr: Column,
    col: str,
    breakpoints: list[float],
    eps: float = 1e-6,
) -> DataFrame:
    """:func:`psi_bins` for the common case where both populations live
    in ONE table split by a boolean column expression (week-over-week
    partitions, A/B arms, user cohorts): both sides bin in a single
    scan and a SINGLE keyed exchange — groupBy(bin) with one
    conditional count per cohort (map-side combined to 2 longs per bin
    per task), cohort totals from an empty-frame window over the K-row
    aggregate (post-agg frames are where that pattern is legal). Two
    separate psi_bins passes read the whole table twice: a modulo/date
    cohort predicate doesn't prune parquet row groups, so each pass
    decodes everything — at 100 TB this variant halves the IO.
    ``cohort_expr`` true = 'after', false = 'before'; null-cohort rows
    are excluded. Output schema identical to psi_bins."""
    edges = _check_edges(breakpoints)
    counts = (
        df.filter(F.col(col).isNotNull() & cohort_expr.isNotNull())
        .groupBy(_bin_expr(F.col(col), edges).alias("bin_id"))
        .agg(
            F.count(F.when(~cohort_expr, True)).alias("__nb"),
            F.count(F.when(cohort_expr, True)).alias("__na"),
        )
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    folded = counts.select(
        "bin_id",
        (F.col("__nb") / F.greatest(F.sum("__nb").over(tot), F.lit(1))).alias(
            "share_before"
        ),
        (F.col("__na") / F.greatest(F.sum("__na").over(tot), F.lit(1))).alias(
            "share_after"
        ),
    )
    nb = len(edges) - 1
    grid = df.sparkSession.createDataFrame([(i,) for i in range(nb)], "bin_id: bigint")
    joined = grid.join(F.broadcast(folded), "bin_id", "left").fillna(
        {"share_before": 0.0, "share_after": 0.0}
    )
    p = F.greatest(F.col("share_after"), F.lit(eps))
    q = F.greatest(F.col("share_before"), F.lit(eps))
    return joined.select(
        "bin_id",
        F.round("share_before", 6).alias("share_before"),
        F.round("share_after", 6).alias("share_after"),
        F.round((p - q) * F.log(p / q), 4).alias("psi_term"),
    )


def psi_bins(
    before: DataFrame,
    after: DataFrame,
    col: str,
    breakpoints: list[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Per-bin PSI detail: (bin_id, share_before, share_after, psi_term).

    Bin i covers [breakpoints[i], breakpoints[i+1]); values below the
    first edge land in bin 0, values at/above the last edge in the top
    bin (open-ended tails — drift usually shows up in the tails, so
    clamping instead of dropping matters). Nulls are excluded (monitor
    them with :func:`completeness`, which is the right tool)."""
    edges = _check_edges(breakpoints)

    def binned(df: DataFrame, share_name: str) -> DataFrame:
        c = F.col(col)
        grouped = (
            df.filter(c.isNotNull())
            .groupBy(_bin_expr(c, edges).alias("bin_id"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        # share denominator via a window over the K-row aggregate (fine:
        # post-agg frame, not raw data)
        from pyspark.sql import Window

        return grouped.select(
            "bin_id",
            (F.col("__n") / F.sum("__n").over(Window.partitionBy())).alias(
                share_name
            ),
        )

    nb = len(edges) - 1
    all_bins = range(nb)
    spark = before.sparkSession
    grid = spark.createDataFrame([(i,) for i in all_bins], "bin_id: bigint")
    b_shares = binned(before, "share_before")
    a_shares = binned(after, "share_after")
    joined = (
        grid.join(F.broadcast(b_shares), "bin_id", "left")
        .join(F.broadcast(a_shares), "bin_id", "left")
        .fillna({"share_before": 0.0, "share_after": 0.0})
    )
    p = F.greatest(F.col("share_after"), F.lit(eps))
    q = F.greatest(F.col("share_before"), F.lit(eps))
    return joined.select(
        "bin_id",
        F.round("share_before", 6).alias("share_before"),
        F.round("share_after", 6).alias("share_after"),
        # round 4, not 6: shares are exact int ratios (engine-identical),
        # but ln() is libm-dependent — JVM vs DuckDB can differ in the
        # last ulp, and 1e-4 granularity absorbs that for oracle parity
        F.round((p - q) * F.log(p / q), 4).alias("psi_term"),
    )


def fk_checks(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit across foreign-key edges: for each
    ``(edge_name, child_df, child_key, parent_df, parent_key)`` report
    child row count, NULL-key rows, orphan rows (non-NULL key with no
    parent), and an ``ok`` flag. The cross-TABLE complement of
    :class:`Suite`'s per-column checks — the thing that catches a
    truncated dimension load before a training join silently drops or
    null-pads facts.

    Shape per edge: the parent reduces to its deduplicated key column
    only (the cheapest possible projection of the big side), the child
    projects its key, and ONE left join + map-combined aggregate
    produces the row — orphans are counted, never materialized. Parent
    keys are NOT assumed broadcastable (a fact-to-fact edge like
    lineitem->orders has billions of parent keys at scale); the plain
    join lets AQE pick broadcast vs shuffle per edge. The per-edge
    1-row aggregates union — each branch reads different tables, so
    this is not the single-source re-execution trap.

    A NULL child key is reported separately, not as an orphan: SQL FK
    semantics admit NULL references, and conflating them with broken
    ones makes the count useless for triage.
    """
    if not edges:
        raise ValueError("fk_checks needs at least one edge")
    from functools import reduce

    rows = []
    for name, child, child_key, parent, parent_key in edges:
        pkeys = (
            parent.select(F.col(parent_key).alias(child_key))
            .dropDuplicates()
            .withColumn("__parent", F.lit(1))
        )
        marked = child.select(child_key).join(pkeys, on=child_key, how="left")
        agg = marked.agg(
            F.count(F.lit(1)).alias("child_rows"),
            F.sum(
                F.when(F.col(child_key).isNull(), 1).otherwise(0)
            ).alias("null_keys"),
            F.sum(
                F.when(
                    F.col(child_key).isNotNull() & F.col("__parent").isNull(),
                    1,
                ).otherwise(0)
            ).alias("orphans"),
        )
        rows.append(
            agg.select(
                F.lit(name).alias("edge"),
                F.col("child_rows").cast("long").alias("child_rows"),
                F.col("null_keys").cast("long").alias("null_keys"),
                F.col("orphans").cast("long").alias("orphans"),
                (F.col("orphans") == 0).alias("ok"),
            )
        )
    return reduce(DataFrame.unionByName, rows)


def psi_multi(
    before: DataFrame,
    after: DataFrame,
    specs: dict[str, list[float]],
    eps: float = 1e-6,
) -> DataFrame:
    """Drift panel: PSI for MANY features in one report — one row per
    feature (feature, psi, n_bins). The monitoring shape for a feature
    store or training table: fifty features cost the same TWO scans as
    one feature, not fifty passes per side.

    Each side binning rides one explode-over-struct: every feature's
    bin id is computed ONCE per row (an all-conditional-sums aggregate
    would re-expand each feature's CASE tree per bin — the measured
    projection-collapse trap), the exploded (feature, bin) stream is
    map-side combined to <= features x bins rows per partition, and
    shares derive from windows over that aggregated frame only. PSI
    terms round at 4 (ln is libm-dependent) and sum as DECIMAL(18,4) —
    order-independent — before the final round(6). NULLs are excluded
    per feature via a sentinel bin, matching :func:`psi_bins`.
    """
    from pyspark.sql.window import Window

    specs = {c: _check_edges(e) for c, e in specs.items()}

    def side(df: DataFrame, share_name: str) -> DataFrame:
        entries = [
            F.struct(
                F.lit(c).alias("feature"),
                F.when(F.col(c).isNull(), F.lit(-1).cast("bigint"))
                .otherwise(_bin_expr(F.col(c), edges))
                .alias("bin_id"),
            )
            for c, edges in specs.items()
        ]
        counts = (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.feature", "e.bin_id")
            .filter(F.col("bin_id") >= 0)
            .groupBy("feature", "bin_id")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = Window.partitionBy("feature")
        return counts.select(
            "feature",
            "bin_id",
            (F.col("__n") / F.sum("__n").over(w)).alias(share_name),
        )

    spark = before.sparkSession
    grid = spark.createDataFrame(
        [(c, i) for c, edges in specs.items() for i in range(len(edges) - 1)],
        "feature string, bin_id bigint",
    )
    joined = (
        grid.join(F.broadcast(side(before, "__sb")), ["feature", "bin_id"], "left")
        .join(F.broadcast(side(after, "__sa")), ["feature", "bin_id"], "left")
        .fillna({"__sb": 0.0, "__sa": 0.0})
    )
    p = F.greatest(F.col("__sa"), F.lit(eps))
    q = F.greatest(F.col("__sb"), F.lit(eps))
    term = F.round((p - q) * F.log(p / q), 4).cast("decimal(18,4)")
    return joined.groupBy("feature").agg(
        F.round(F.sum(term).cast("double"), 6).alias("psi"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )


def ks_cohorts(
    df: DataFrame,
    cohort_expr: Column,
    col: str,
    breakpoints: list[float],
    round_to: int = 6,
) -> DataFrame:
    """Binned two-sample Kolmogorov–Smirnov statistic between two
    cohorts of ONE table — the sampling-QC companion of
    :func:`psi_bins_cohorts` (did the 10% sample keep the
    distribution? is the holdout exchangeable with training?). Same
    single-scan, single-keyed-exchange shape: one groupBy(bin) with a
    conditional count per cohort; cumulative counts stay EXACT int64
    over the ordered window on the K-row aggregate, so each bin's CDF
    gap is one IEEE division per side — engine-identical before the
    per-bin rounding that feeds max(). Binned KS lower-bounds the true
    statistic (resolution = bin width); pick edges from reference
    quantiles when that matters. Returns ONE row:
    (n_before, n_after, ks_stat). ``cohort_expr`` true = 'after'.
    """
    edges = _check_edges(breakpoints)
    counts = (
        df.filter(F.col(col).isNotNull() & cohort_expr.isNotNull())
        .groupBy(_bin_expr(F.col(col), edges).alias("bin_id"))
        .agg(
            F.count(F.when(~cohort_expr, True)).alias("__nb"),
            F.count(F.when(cohort_expr, True)).alias("__na"),
        )
    )
    from pyspark.sql import Window

    cum = Window.orderBy("bin_id").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    staged = counts.select(
        F.sum("__nb").over(cum).alias("__cb"),
        F.sum("__na").over(cum).alias("__ca"),
        F.sum("__nb").over(tot).alias("__tb"),
        F.sum("__na").over(tot).alias("__ta"),
    )
    gap = F.round(
        F.abs(
            F.try_divide(F.col("__cb"), F.col("__tb"))
            - F.try_divide(F.col("__ca"), F.col("__ta"))
        ),
        round_to,
    )
    return staged.select(gap.alias("__gap"), "__tb", "__ta").agg(
        F.max("__tb").cast("long").alias("n_before"),
        F.max("__ta").cast("long").alias("n_after"),
        F.max("__gap").alias("ks_stat"),
    )
