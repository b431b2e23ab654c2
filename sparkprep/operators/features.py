"""ML feature-prep operators (SURVEY.md §2.14 M1-M9) — the reference's
``mlpc.py`` pipeline surface, with its one big anti-pattern fixed:
evaluation metrics are computed IN SPARK as conditional aggregates
(M9), not by shipping the whole scored test set to pandas
(``mlpc.py:519`` ``.toPandas()`` → driver OOM at scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class FeaturePlan:
    """Declarative description of the feature pipeline the reference
    hand-assembled (mlpc.py:418-466): label + categoricals (indexed and
    one-hot), continuous passthrough, manual bucketization."""

    label_col: str
    categorical: list[str] = field(default_factory=list)
    continuous: list[str] = field(default_factory=list)
    bucketize: dict[str, list[float]] = field(default_factory=dict)
    output_col: str = "features"


def build_feature_pipeline(plan: FeaturePlan):
    """M1-M5 composed into a pyspark.ml Pipeline:

    - M1 StringIndexer on the label (handleInvalid='keep', mlpc.py:425)
    - M2 per-column StringIndexer for categoricals (mlpc.py:427-428)
    - M3 OneHotEncoder (dropLast default, mlpc.py:431-433)
    - M4 Bucketizer per configured column (mlpc.py:434-435)
    - M5 VectorAssembler over encoded + continuous + bucketized
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import Bucketizer, OneHotEncoder, StringIndexer, VectorAssembler

    stages = [
        StringIndexer(
            inputCol=plan.label_col, outputCol="indexedLabel", handleInvalid="keep"
        )
    ]
    encoded = []
    for c in plan.categorical:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}_indexed", handleInvalid="keep")
        )
        stages.append(OneHotEncoder(inputCol=f"{c}_indexed", outputCol=f"{c}_encoded"))
        encoded.append(f"{c}_encoded")
    bucketized = []
    for c, splits in plan.bucketize.items():
        stages.append(
            Bucketizer(inputCol=c, outputCol=f"{c}_bucketized", splits=splits)
        )
        bucketized.append(f"{c}_bucketized")
    stages.append(
        VectorAssembler(
            inputCols=encoded + plan.continuous + bucketized, outputCol=plan.output_col
        )
    )
    return Pipeline(stages=stages)


def mlp_layers_from_features(
    train_df: DataFrame, hidden: list[int], num_classes: int, features_col: str = "features"
) -> list[int]:
    """M7 — input-layer width read from the assembled feature metadata
    (mlpc.py:451-456: ``schema['features'].metadata['ml_attr']['num_attrs']``)."""
    num_attrs = train_df.schema[features_col].metadata["ml_attr"]["num_attrs"]
    return [num_attrs] + hidden + [num_classes]


def build_mlpc(
    layers: list[int], label_col: str = "indexedLabel", features_col: str = "features", seed: int = 42
):
    """M7 — MultilayerPerceptronClassifier (seeded; the reference left it
    unseeded — SURVEY §7 nondeterminism quarantine)."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier

    return MultilayerPerceptronClassifier(
        labelCol=label_col, featuresCol=features_col, layers=layers, seed=seed
    )


def strip_training_summary(model):
    """Drop the training summary from a fitted model (PipelineModel or
    bare classifier). Two reasons, both about what a fitted model should
    carry into serving:

    - The summary pins the fitting ``SparkSession`` AND the predictions
      DataFrame — dead weight on a model object that may live for the
      whole serving job.
    - Spark 4 landmine: ``model.transform`` serializes the model into a
      ScalaUDF closure, summary included. The summary's SparkSession
      reference drags in ``observationManager`` — a *lazily initialized*
      non-serializable field that is null until the first
      ``df.observe(...)`` on the session. So fits work in isolation,
      then every later ``transform`` on the same session dies with
      ``NotSerializableException: ObservationManager`` once anything
      (e.g. :meth:`sparkprep.plans.Pipeline.run_observed`) has used the
      Observation API. Clearing the summary removes the session
      reference entirely.

    Uses the JVM-side ``setSummary(None)`` (``private[ml]`` in Scala is
    public bytecode, so py4j can call it); no-ops for models without a
    summary. Returns the model for chaining.
    """
    from pyspark import SparkContext

    stages = getattr(model, "stages", None) or [model]
    jvm = SparkContext._active_spark_context._jvm
    for st in stages:
        jo = getattr(st, "_java_obj", None)
        if jo is None:
            continue
        try:
            if getattr(st, "hasSummary", False):
                jo.setSummary(jvm.scala.Option.empty())
        except Exception:  # noqa: BLE001 — hygiene, never fail a fit over it
            pass
    return model


def confusion_metrics(
    scored: DataFrame,
    label_col: str = "indexedLabel",
    pred_col: str = "prediction",
    positive: float = 1.0,
) -> dict:
    """M9 — confusion matrix + derived rates in ONE Spark aggregate.

    Replaces ``eval_metrics`` (mlpc.py:382-401), which collected the
    entire scored test set with ``.toPandas()`` and counted with boolean
    masks. Four conditional counts cross the driver boundary instead of
    every row.
    """
    lbl, prd = F.col(label_col), F.col(pred_col)
    row = scored.agg(
        F.count(F.when((lbl == positive) & (prd == positive), True)).alias("tp"),
        F.count(F.when((lbl == positive) & (prd != positive), True)).alias("fn"),
        F.count(F.when((lbl != positive) & (prd != positive), True)).alias("tn"),
        F.count(F.when((lbl != positive) & (prd == positive), True)).alias("fp"),
    ).collect()[0]
    tp, fn, tn, fp = row["tp"], row["fn"], row["tn"], row["fp"]

    def ratio(n, d):
        return (n / d) if d else None

    return {
        "tp": tp, "fn": fn, "tn": tn, "fp": fp,
        "ppv": ratio(tp, tp + fp),          # precision
        "npv": ratio(tn, tn + fn),
        "sensitivity": ratio(tp, tp + fn),  # recall
        "specificity": ratio(tn, tn + fp),
        "accuracy": ratio(tp + tn, tp + fn + tn + fp),
    }


def subset_search(
    train_df: DataFrame,
    test_df: DataFrame,
    plan: FeaturePlan,
    candidate_cols: list[str],
    build_estimator,
    max_size: int | None = None,
):
    """M8 — feature-subset search (mlpc.py:510-522:
    ``itertools.combinations`` over categorical columns). Driver-side
    orchestration loop BY DESIGN (reference parity): the loop fits one
    pipeline per subset, so the total cost is Σ C(n, k) ≈ 2^n
    distributed fits — the CALLER owns that bill. Fine at the
    reference's 5 categoricals (31 fits); ruinous past ~10 columns
    (1023+ fits), so the operator refuses >10 candidates unless
    ``max_size`` bounds the exhaustive blow-up. Each individual
    fit/score is fully distributed. Yields (subset, metrics) lazily so
    callers can early-stop."""
    import itertools
    import math
    from dataclasses import replace

    n_fits = sum(
        math.comb(len(candidate_cols), k)
        for k in range(1, (max_size or len(candidate_cols)) + 1)
    )
    if n_fits > 2**10 - 1:
        # eager (call-time) guard — the body below is a generator, so
        # without the wrapper the refusal would hide until first next()
        raise ValueError(
            f"subset_search would run {n_fits} pipeline fits over "
            f"{len(candidate_cols)} candidate columns (2^n growth); "
            "pass max_size to bound the search or trim the candidates"
        )

    def _run():
        for size in range(1, (max_size or len(candidate_cols)) + 1):
            for subset in itertools.combinations(candidate_cols, size):
                sub_plan = replace(plan, categorical=list(subset))
                pipe = build_feature_pipeline(sub_plan)
                prep = pipe.fit(train_df)
                train_t = prep.transform(train_df)
                est = build_estimator(train_t)
                model = strip_training_summary(est.fit(train_t))
                scored = model.transform(prep.transform(test_df))
                yield subset, confusion_metrics(scored)

    return _run()


def fit_quality_classifier(
    labeled: DataFrame,
    signal_cols: list[str],
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit the LR quality filter on a labeled sample of quality signals
    (the standard corpus-filter recipe: label a few thousand docs, fit a
    tiny linear model, then serve it corpus-wide as native column math —
    queries/textops.q_quality_logit is the serving path).

    The fit runs on the labeled SAMPLE (thousands of rows — iterative
    L-BFGS over 100 TB would be wrong and is unnecessary); what must
    scale is scoring, and :func:`lr_scoring_expr` exports the fitted
    model as a pure Column expression so serving never touches MLlib or
    a UDF. Returns the fitted PipelineModel.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=list(signal_cols), outputCol="__sig"),
            LogisticRegression(
                featuresCol="__sig",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return strip_training_summary(pipe.fit(labeled))


def lr_scoring_expr(model, signal_cols: list[str]):
    """Distill a fitted binary LR pipeline into a native Column:
    ``sigmoid(intercept + Σ coef_i · signal_i)``. This is the bridge
    from MLlib fit to 100 TB serving — the scoring pass is map-only
    whole-stage-codegen column arithmetic, no vector assembly, no
    Python, no model object on the executors."""
    lr = model.stages[-1]
    coefs = lr.coefficients.toArray().tolist()
    z = F.lit(float(lr.intercept))
    for c, w in zip(signal_cols, coefs):
        z = z + float(w) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def binned_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """ROC-AUC of a score against a boolean label, computed at fixed-bin
    granularity — the distributed form of the Mann-Whitney rank sum. A
    global rank over raw scores would single-partition the corpus; the
    fixed grid needs ONE map-combined groupBy to (bin, pos, neg), and
    the cumulative structure runs over the ≤``bins``-row aggregated
    frame. Ties (rows sharing a bin) count half, the standard
    mid-rank convention, so with ≤``bins`` distinct scores the result
    is EXACT; otherwise it is AUC of the binned score (error bounded by
    the bin's label mix, shrink by raising ``bins``).

    Scores are assumed in [0, 1] (probability-like); values outside are
    clamped to the edge bins. NULL scores are excluded (can't be
    ranked), and so are NULL LABELS (an unknown class is neither pos
    nor neg — an SQL twin written as CASE WHEN label THEN 1 ELSE 0
    would count them negative; mirror the filter, n_pos + n_neg may be
    < the row count). Returns one row: (auc, n_pos, n_neg); auc is NULL when
    either class is empty (try_divide — matching SQL's x/0). The bin
    products stay exact in int64/double up to ~10^15 rows; past that,
    cast the sums to DECIMAL before the final division.
    """
    from pyspark.sql.window import Window

    b = F.least(
        F.greatest(F.floor(F.col(score_col) * bins).cast("long"), F.lit(0).cast("long")),
        F.lit(bins - 1).cast("long"),
    )
    y = F.col(label_col).cast("int")
    binned = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(b.alias("__b"), y.alias("__y"))
        .groupBy("__b")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(F.lit(1) - F.col("__y")).alias("neg"),
        )
    )
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    cum = binned.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    return cum.agg(
        F.round(
            F.try_divide(
                F.sum(F.col("pos") * F.col("neg_below"))
                + 0.5 * F.sum(F.col("pos") * F.col("neg")),
                F.sum("pos") * F.sum("neg"),
            ),
            round_to,
        ).alias("auc"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Smoothed mean target encoding for high-cardinality categoricals:
    ``enc(c) = (sum_y(c) + m·prior) / (n(c) + m)`` with ``prior`` the
    global target mean — the shrinkage form that keeps rare categories
    near the prior instead of memorizing their (noisy) empirical mean.

    One map-combined groupBy to |categories| rows; the prior comes from
    empty-frame windows over that AGGREGATED frame (never
    ``crossJoin(broadcast(df.agg(...)))`` — that re-executes the whole
    upstream subtree). Sums are DECIMAL(18,4)-exact so the category
    stats are order-independent across engines; the encoding itself is
    then one fixed-shape double expression, rounded. Join-back is a
    NULL-SAFE broadcast (a plain name join silently drops NULL-category
    rows; NULL is a real level here and gets its own encoding). NULL
    targets don't contribute (sum/count both skip them)."""
    from pyspark.sql.window import Window

    from sparkprep.functions.numeric import _attach_group_scalars

    out_col = out_col or f"{cat_col}_enc"
    m = float(smoothing)
    stats = df.groupBy(cat_col).agg(
        F.sum(F.col(target_col).cast("decimal(18,4)")).alias("__s"),
        F.count(target_col).alias("__n"),
    )
    w = Window.partitionBy()
    prior = F.sum("__s").over(w).cast("double") / F.sum("__n").over(w).cast(
        "double"
    )
    enc = F.round(
        (F.col("__s").cast("double") + F.lit(m) * prior)
        / (F.col("__n").cast("double") + F.lit(m)),
        round_to,
    )
    encoded = stats.select(cat_col, enc.alias(out_col))
    return _attach_group_scalars(df, encoded, cat_col)


def ab_test_report(
    df: DataFrame,
    arm_col: str,
    converted_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Two-proportion experiment readout in ONE map-only aggregate over
    per-UNIT rows (one row per user/session — aggregate to units first
    or the z-test's independence assumption is fiction): per-arm sizes
    and conversions, rates, absolute lift (B - A), and the pooled
    two-proportion z statistic. The analytics staple that closes the
    loop on the leakage-safe split operators (mix.grouped_split).

    ``arm_col`` boolean (False = control/A, True = treatment/B);
    ``converted_col`` boolean. All eight aggregates ride one
    conditional-sum pass — no per-arm jobs, no shuffle beyond the
    1-row reduce. Degenerate pools (0% or 100% conversion -> zero
    standard error) yield NULL z via try_divide, never a crash. Exact
    integer counts make every derived double engine-identical; sqrt is
    IEEE-correctly-rounded so only the final round matters.
    """
    a = F.when(~F.col(arm_col), 1).otherwise(0)
    b = F.when(F.col(arm_col), 1).otherwise(0)
    conv = F.when(F.col(converted_col), 1).otherwise(0)
    agg = df.agg(
        F.sum(a).cast("long").alias("n_a"),
        F.sum(b).cast("long").alias("n_b"),
        F.sum(a * conv).cast("long").alias("conv_a"),
        F.sum(b * conv).cast("long").alias("conv_b"),
    )
    # try_divide throughout: an empty arm (n 0) must yield NULL rates,
    # not an ANSI DIVIDE_BY_ZERO (double division throws too)
    p_a = F.try_divide(F.col("conv_a"), F.col("n_a"))
    p_b = F.try_divide(F.col("conv_b"), F.col("n_b"))
    pooled = F.try_divide(
        F.col("conv_a") + F.col("conv_b"), F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled
        * (1 - pooled)
        * (F.try_divide(F.lit(1.0), F.col("n_a"))
           + F.try_divide(F.lit(1.0), F.col("n_b")))
    )
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(p_b - p_a, 6).alias("lift"),
        F.round(F.try_divide(p_b - p_a, F.nullif(se, F.lit(0.0))), round_to).alias(
            "z_score"
        ),
    )


def hashing_trick(
    df: DataFrame,
    id_col: str,
    cols: list[str],
    n_buckets: int = 256,
    salt: str = "",
) -> DataFrame:
    """Feature hashing for high-cardinality categoricals: each
    (column, value) pair maps to a signed bucket —
    ``md5(col '=' value salt)`` taken as a 60-bit int, bucket = h mod
    n_buckets, sign = ±1 from the next bit. One output row per
    non-NULL feature: (id, feature, bucket, sign). Unlike
    StringIndexer/OneHot (M1-M5), no fitted vocabulary exists to
    store, ship, or go stale — the standard trick when the category
    space is unbounded (URLs, user agents, n-grams).

    Map-only: values fold through explode-over-struct (each hash
    computed once), NULL values emit NO feature (the sparse-vector
    convention) via an array_compact on the struct array — never a
    filter that would push below the projection and re-expand it. md5
    keeps buckets reproducible outside Spark (dedup.string_to_int_hash
    note); swap xxhash64 for production-only runs.
    """
    if not 1 <= n_buckets <= 2**29:
        raise ValueError(f"n_buckets out of range: {n_buckets}")
    def _h60(prefix: str, c: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(prefix),
                        F.lit(c),
                        F.lit("="),
                        F.col(c).cast("string"),
                        F.lit(salt),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    entries = []
    for c in cols:
        # independent hashes for bucket and sign: deriving the sign
        # from high bits of the SAME hash needs an integer divide, and
        # Column `/` is double division — inexact past 2^53
        bucket = _h60("b:", c) % n_buckets
        sign = (2 * (_h60("s:", c) % 2) - 1).cast("int")
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(c).alias("feature"),
                    bucket.alias("bucket"),
                    sign.alias("sign"),
                ),
            )
        )
    return (
        df.select(
            F.col(id_col),
            F.explode(F.array_compact(F.array(*entries))).alias("e"),
        )
        .select(id_col, "e.feature", "e.bucket", "e.sign")
    )


def did_report(
    df: DataFrame,
    arm_col: str,
    period_col: str,
    value_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Difference-in-differences readout in ONE map-only aggregate:
    the four (arm x period) cell means and the DiD effect
    (treated after-before) - (control after-before) — the standard
    launch-impact estimate when randomization wasn't available and
    both groups share a trend. Cell sums ride DECIMAL(18,4) (order-
    independent, engine-exact); each mean is ONE IEEE division of
    exact numbers, so the effect arithmetic is bit-identical before
    rounding. try_divide: an empty cell yields NULL means and a NULL
    effect, never a job kill. ``arm_col``/``period_col`` are boolean
    (true = treated / after); NULL rows are excluded.
    """
    arm = F.col(arm_col)
    period = F.col(period_col)
    staged = df.filter(
        arm.isNotNull() & period.isNotNull() & F.col(value_col).isNotNull()
    ).select(arm.alias("__a"), period.alias("__p"),
             F.col(value_col).cast("decimal(18,4)").alias("__v"))

    def cell(a: bool, p: bool, what):
        cond = (F.col("__a") == a) & (F.col("__p") == p)
        return F.sum(F.when(cond, what))

    n_tb = cell(True, False, F.lit(1))
    n_ta = cell(True, True, F.lit(1))
    n_cb = cell(False, False, F.lit(1))
    n_ca = cell(False, True, F.lit(1))
    m_tb = F.try_divide(cell(True, False, F.col("__v")).cast("double"), n_tb)
    m_ta = F.try_divide(cell(True, True, F.col("__v")).cast("double"), n_ta)
    m_cb = F.try_divide(cell(False, False, F.col("__v")).cast("double"), n_cb)
    m_ca = F.try_divide(cell(False, True, F.col("__v")).cast("double"), n_ca)
    return staged.agg(
        # coalesce each CELL before summing: with one empty cell the NULL
        # count would propagate through the addition and report 0 units
        # even though the other cell has rows
        (F.coalesce(n_tb, F.lit(0)) + F.coalesce(n_ta, F.lit(0))).cast("long").alias("n_treated"),
        (F.coalesce(n_cb, F.lit(0)) + F.coalesce(n_ca, F.lit(0))).cast("long").alias("n_control"),
        F.round(m_tb, round_to).alias("treated_before"),
        F.round(m_ta, round_to).alias("treated_after"),
        F.round(m_cb, round_to).alias("control_before"),
        F.round(m_ca, round_to).alias("control_after"),
        F.round((m_ta - m_tb) - (m_ca - m_cb), round_to).alias("did_effect"),
    )


def binned_average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """Average precision (PR-AUC, step interpolation) of a score
    against a boolean label at fixed-bin granularity —
    :func:`binned_auc`'s companion for imbalanced gates, where ROC
    flatters a scorer that ranks the huge negative class well. Same
    distributed shape: ONE map-combined groupBy to (bin, pos, neg),
    cumulative structure over the ≤``bins``-row aggregated frame,
    descending-score traversal:

      AP = Σ_b pos_b · P(≥b) / n_pos,
      P(≥b) = cum_pos(≥b) / (cum_pos(≥b) + cum_neg(≥b))

    Rows inside one bin share that bin's precision (the binned-score
    convention; exact when distinct scores ≤ bins). Each per-bin term
    is 2 IEEE ops on exact int64 cumulative counts, then re-cast to
    DECIMAL(38,12) so the cross-bin sum is order-independent (the
    anova_f g_term discipline — a raw double sum over 1000 bins would
    be summation-order-dependent). NULL scores/labels drop, as in
    binned_auc. Returns one row ``(ap, base_rate, n_pos, n_neg)``;
    base_rate (= n_pos/N) is the no-skill AP floor.
    """
    from pyspark.sql.window import Window

    b = F.least(
        F.greatest(
            F.floor(F.col(score_col) * bins).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(bins - 1).cast("long"),
    )
    y = F.col(label_col).cast("int")
    binned = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(b.alias("__b"), y.alias("__y"))
        .groupBy("__b")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(F.lit(1) - F.col("__y")).alias("neg"),
        )
    )
    w = Window.orderBy(F.desc("__b")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "pos",
        F.sum("pos").over(w).alias("__cp"),
        F.sum("neg").over(w).alias("__cn"),
    )
    term = (
        F.col("pos")
        * (
            F.col("__cp").cast("double")
            / (F.col("__cp") + F.col("__cn")).cast("double")
        )
    ).cast("decimal(38,12)")
    # the desc-cumulative maxima ARE the class totals (last bin holds
    # the full running sums) — no second pass over the bin frame
    return cum.agg(
        F.round(
            F.try_divide(
                F.sum(term).cast("double"), F.max("__cp").cast("double")
            ),
            round_to,
        ).alias("ap"),
        F.round(
            F.try_divide(
                F.max("__cp").cast("double"),
                (F.max("__cp") + F.max("__cn")).cast("double"),
            ),
            round_to,
        ).alias("base_rate"),
        F.max("__cp").cast("long").alias("n_pos"),
        F.max("__cn").cast("long").alias("n_neg"),
    )
