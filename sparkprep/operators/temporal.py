"""Temporal join operators Spark lacks as built-ins: AS-OF join and
RANGE (interval) join — expressed as compositions of existing DataFrame
ops per the engine's design rules (no custom physical operators needed).

AS-OF join — the "most recent value at or before t" join (market-data /
feature-store staple):
    Implemented with the union-and-window technique: tag both sides,
    union on the time axis, sort within each key partition once, and
    carry the right side's latest values forward with ``last(ignorenulls)``
    over an unbounded-preceding window. Cost: ONE shuffle on the key +
    one per-partition sort — same shape as a sort-merge join, with no
    row explosion, no inequality-join fallback to broadcast-nested-loop.
    This scales to 100 TB the same way any keyed window does.

RANGE join — "events inside [start, end)" against an interval table:
    A naive ``ON e.ts BETWEEN i.start AND i.end`` inequality join forces
    BroadcastNestedLoopJoin (every event x every interval). We bin time
    into fixed buckets: intervals explode to the buckets they overlap,
    events map to one bucket, the join becomes an EQUI-join on the
    bucket plus a residual range filter. Candidate pairs shrink from
    |E| x |I| to sum over buckets — the standard interval-binning trick
    (cf. Spark's own range-join hints in Databricks runtime, absent in
    OSS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from sparkprep.checkpointing import lazy_checkpoint


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row's values with the largest
    ``on`` <= left.``on`` (direction='backward'; 'forward' mirrors with
    the smallest >=), optionally matching within ``by`` groups.

    Left rows with no prior right row keep nulls (like pandas
    ``merge_asof``). Ties on the time column: the right row wins (right
    rows sort before left rows at equal timestamps, so an exactly-equal
    timestamp IS visible to the left row — matches ``ASOF JOIN ON
    l.ts >= r.ts`` semantics).

    ``by=None`` is REFUSED: an unkeyed as-of needs
    ``Window.partitionBy()`` (empty frame), which funnels the entire
    union through ONE partition — correct results, catastrophic at
    scale, and silent. Add a constant key only if the data is known
    tiny, or pre-bucket time into a coarse key and as-of within it.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    if by is None:
        raise ValueError(
            "asof_join(by=None) would run the whole union through a "
            "single partition (empty window frame). Pass a key column; "
            "for a truly global as-of on small data, add a constant "
            "column and pass it as `by`."
        )
    value_cols = value_cols or [
        c for c in right.columns if c != on and c != by
    ]
    lcols = [c for c in left.columns]
    clash = sorted(set(value_cols) & set(lcols))
    if clash:
        raise ValueError(
            f"asof_join value columns {clash} collide with left columns — "
            "the output would carry duplicate names and every downstream "
            "reference would be AMBIGUOUS_REFERENCE. Rename on the right "
            "or pass value_cols explicitly (pandas merge_asof suffixes; "
            "this engine makes you choose)."
        )

    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        *[
            F.col(on).alias(c) if c == on else (F.col(by).alias(c) if c == by else F.lit(None).cast(left.schema[c].dataType).alias(c))
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    order = [F.col(on).asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("__side").asc()]
    w = (
        (Window.partitionBy(by) if by else Window.partitionBy())
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__c_{c}").alias(c) for c in value_cols]
    )


_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _duration_seconds(spec: str) -> int:
    qty, unit = spec.strip().split()
    return int(qty) * _UNITS[unit.lower()]


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Equi-join-able interval join: events.ts in [start, end).

    ``bucket`` should be on the order of the TYPICAL interval length:
    too coarse → large candidate groups; too fine → interval rows
    explode into many buckets. At 100 TB you'd pick it from interval
    statistics (p50 length) — here it's a parameter.
    """
    # integer bucket ids from epoch seconds (F.window can't be used
    # twice in one projection — Spark rejects multiple time windows)
    n = _duration_seconds(bucket)
    ev_b = events.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / n).cast("long")
    )
    iv_b = intervals.withColumn(
        "__buckets",
        F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / n).cast("long"),
            F.floor(F.unix_timestamp(F.col(end_col)) / n).cast("long"),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")

    joined = ev_b.join(iv_b, "__bucket").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bucket")


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
    round_to: int = 4,
) -> DataFrame:
    """Fixed-step resampling with forward fill (timeseries gap-fill):
    per key, a dense bucket grid from the key's first to last
    observation, each bucket carrying the aggregated observed value or
    the most recent earlier one (``is_gap`` marks filled rows).

    Dataflow: bucket arithmetic on epoch seconds (integer, no session
    TZ dependence) -> one groupBy(key, bucket) for observed values ->
    per-key bounds -> ``sequence``-explode the grid (rows scale with
    span/step per key, generated distributed, never on the driver) ->
    left join + ``last(ignorenulls)`` over the keyed window. Every
    shuffle is on the key: skew follows the hottest key's SPAN, not its
    row count — cap spans upstream if keys live for years.
    """
    from pyspark.sql.window import Window

    n = _duration_seconds(step)
    b = df.select(
        F.col(key_col),
        F.floor(F.unix_timestamp(F.col(ts_col)) / n).cast("long").alias("__bkt"),
        F.col(value_col),
    )
    obs = b.groupBy(key_col, "__bkt").agg(
        F.round(F.avg(value_col), round_to).alias("__v")
    )
    grid = (
        b.groupBy(key_col)
        .agg(F.min("__bkt").alias("__b0"), F.max("__bkt").alias("__b1"))
        .select(key_col, F.explode(F.sequence("__b0", "__b1")).alias("__bkt"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "__bkt"], "left")
        .select(
            key_col,
            F.timestamp_seconds(F.col("__bkt") * n).alias("ts"),
            F.last("__v", ignorenulls=True).over(w).alias("value_ff"),
            F.col("__v").isNull().alias("is_gap"),
        )
    )


def rolling_time_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    window: str = "1 hour",
    round_to: int = 4,
) -> DataFrame:
    """Trailing time-interval rolling aggregate (a RANGE frame, not a
    ROWS frame): every row annotated with the mean and count of its
    key's values in the closed interval ``[ts - window, ts]``.

    The frame is declared over ``unix_micros(ts)`` — exact int64 epoch
    arithmetic (Spark 4 forbids NTZ→numeric casts, and a double epoch
    loses precision above 2^53 µs) — with ``rangeBetween(-w_µs, 0)``.
    One shuffle on the key, one per-partition sort; WindowExec evaluates
    the sliding frame incrementally (add/remove at the frame edges), so
    cost is O(rows) per key, not O(rows · frame-width). Skew follows the
    hottest key, same as any keyed window — salt upstream if one key
    owns the stream.
    """
    n_us = _duration_seconds(window) * 1_000_000
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-n_us, 0)
    )
    return df.select(
        "*",
        F.round(F.avg(value_col).over(w), round_to).alias(f"{value_col}_roll_avg"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_window"),
    )


def event_sequences(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    payload_col: str,
    max_len: int = 100,
) -> DataFrame:
    """Per-key ordered event sequences for sequence-model training
    (user histories, session traces): (key, n_events, seq) with ``seq``
    the first ``max_len`` payloads in ``order_cols`` order, joined with
    ','.

    Scale design — the trap here is ``collect_list`` state: aggregating
    THEN truncating buffers every event of a hot key (a bot user with
    10M events holds 10M structs in one aggregation buffer). Instead
    the cap is applied BEFORE any array exists: ``row_number`` over
    (key, order) keeps ranks <= max_len, and the aggregation only ever
    sees <= max_len rows per key. The window and the groupBy hash on
    the SAME key, so Catalyst plans ONE exchange — the filter and agg
    ride the window's partitioning. ``n_events`` (the pre-truncation
    total) comes from an unordered count window over the same exchange.

    Determinism: ``order_cols`` must be a total order per key (pass a
    unique id as the last column) or ties make ``seq`` layout-dependent.
    """
    from pyspark.sql.window import Window

    w_ord = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order_cols])
    w_all = Window.partitionBy(key_col)
    ranked = df.select(
        key_col,
        F.col(payload_col).cast("string").alias("__p"),
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    ).filter(F.col("__rn") <= max_len)
    from sparkprep.functions.strings import ordered_join

    return ranked.groupBy(key_col).agg(
        F.max("__n").cast("long").alias("n_events"),
        ordered_join("__rn", "__p").alias("seq"),
    )


def debounce(
    df: DataFrame,
    key_cols: list,
    ts_col: str,
    gap: str = "5 seconds",
    order_cols: list | None = None,
) -> DataFrame:
    """Collapse per-key event BURSTS (double-clicks, sensor chatter,
    retry storms): consecutive events closer than ``gap`` belong to one
    burst; the output is one row per burst with its first event's
    timestamp and the burst size. Differs from a session window only in
    intent — here the payload is "how many raw events collapsed", the
    dedup-style accounting a pipeline needs BEFORE rate features.

    One keyed exchange total: burst boundaries come from ``lag`` over
    (key, order), the burst id is the running count of boundaries over
    the SAME window spec, and the per-burst groupBy hashes on the same
    key prefix — Catalyst plans a single shuffle. Gap math is exact
    int64 microseconds (``unix_micros``; a double cast of a timestamp
    is both lossy and illegal on NTZ in Spark 4).
    """
    from pyspark.sql.window import Window

    order_cols = [str(c) for c in (order_cols or [ts_col])]
    gap_us = _duration_seconds(gap) * 1_000_000
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts_col))
    boundary = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    # two projections, not one: the running sum OF the boundary is a
    # window over a window — and its spec needs the order columns, so
    # they must survive the first select
    keep = list(dict.fromkeys([*key_cols, ts_col, *order_cols]))
    marked = df.select(*keep, boundary.alias("__new")).withColumn(
        "burst_id",
        F.sum("__new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return marked.groupBy(*key_cols, "burst_id").agg(
        F.min(ts_col).alias("burst_start"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def sessionize_ids(
    df: DataFrame,
    key_cols: list,
    ts_col: str,
    gap: str = "30 minutes",
    order_cols: list | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based session assignment that KEEPS every input column: adds
    ``session_col`` (1-based per-key counter) where a new session starts
    at each event whose gap from the previous one exceeds ``gap``. The
    labeling twin of ``debounce`` — same lag-boundary + running-sum
    skeleton on ONE keyed exchange, but rows survive for downstream
    per-session analysis (paths, durations, funnels) instead of being
    collapsed. ``F.session_window`` covers windowed AGGREGATION; this
    covers per-ROW session membership, which the built-in doesn't emit.

    Exact int64-µs gap math; ``order_cols`` must totally order each key
    (append a unique id) or boundaries are layout-dependent."""
    from pyspark.sql.window import Window

    order_cols = [str(c) for c in (order_cols or [ts_col])]
    gap_us = _duration_seconds(gap) * 1_000_000
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts_col))
    boundary = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__new", boundary)
        .withColumn(
            session_col,
            F.sum("__new")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .drop("__new")
    )


def decayed_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life: str = "1 day",
    round_to: int = 2,
) -> DataFrame:
    """Recency-weighted per-key value: Σ value · 0.5^(age / half_life),
    age measured from the KEY's newest event — the classic
    recency-decay feature (user activity score, item popularity) that a
    plain lifetime sum overstates for stale keys.

    One keyed exchange: the per-key max timestamp is a window aggregate
    over the key partition, and the groupBy reuses that partitioning.
    Cross-engine determinism: age is exact int64 µs → whole seconds by
    integer division; the weight is ROUNDED at 6 (libm pow can differ
    in the last ulp across engines) and each term is cast to
    DECIMAL(18,6) before summing, so the sum is order-independent —
    the same double-sums-differ-by-order trap as money aggregates.
    """
    from pyspark.sql.window import Window

    hl_s = _duration_seconds(half_life)
    w = Window.partitionBy(key_col)
    us = F.unix_micros(F.col(ts_col))
    age_s = ((F.max(us).over(w) - us) / F.lit(1_000_000)).cast("long")
    weight = F.round(F.pow(F.lit(0.5), age_s / F.lit(float(hl_s))), 6)
    term = (F.col(value_col) * weight).cast("decimal(18,6)")
    staged = df.select(key_col, term.alias("__t"))
    return staged.groupBy(key_col).agg(
        F.round(F.sum("__t").cast("double"), round_to).alias("decayed_value"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def last_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    lookback: str = "7 days",
    none_label: str = "(none)",
) -> DataFrame:
    """Marketing-style last-touch attribution: each conversion row gets
    an ``attributed_channel`` — the channel of the most recent touch by
    the same user at or before the conversion, provided it falls within
    ``lookback``; otherwise ``none_label``. Built on :func:`asof_join`
    (union + one keyed window — never an inequality join), so the cost
    is one exchange on the user key regardless of touch volume.

    The lookback gap is exact int64 µs math (``unix_micros``), never a
    float cast on a timestamp. Ties at the exact conversion timestamp
    attribute (asof_join's right-wins-at-equal rule); equal-timestamp
    ties BETWEEN touches follow the window order and are only
    deterministic if (user, ts) is unique among touches — pre-dedup
    touches if the feed can collide.
    """
    tch = touches.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(channel_col).alias("__ch"),
        F.col(ts_col).alias("__tts"),
    )
    joined = asof_join(
        conversions, tch, on=ts_col, by=user_col, value_cols=["__ch", "__tts"]
    )
    lookback_us = _duration_seconds(lookback) * 1_000_000
    in_window = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__tts"))
    ) <= F.lit(lookback_us)
    return joined.withColumn(
        "attributed_channel",
        F.when(F.col("__tts").isNotNull() & in_window, F.col("__ch")).otherwise(
            F.lit(none_label)
        ),
    ).drop("__ch", "__tts")


def active_users(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    window_days: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """Daily/rolling active users and stickiness: per day, DAU, the
    trailing-``window_days`` distinct-user count (WAU for 7), and the
    DAU/WAU stickiness ratio. The product-analytics daily that looks
    trivial until the rolling DISTINCT: a sum of daily distincts
    double-counts returning users, and COUNT(DISTINCT) over a sliding
    range frame doesn't exist in either engine.

    Shape: dedup to the (day, user) grain FIRST (one exchange of the
    deduped stream — the raw event volume only ever map-side combines),
    then each (day, user) row EXPLODES into the ``window_days`` window
    ends it contributes to, is deduped again at the (window_end, user)
    grain, and counts. Cost is window_days x the DAILY-grain stream —
    independent of raw event volume, the factor that matters at 100 TB.
    Early days carry partial windows (standard convention); day emits
    as a yyyy-MM-dd STRING (DATE columns hash differently via pandas
    between engines).
    """
    day = F.date_trunc("day", F.col(ts_col))
    daily = df.select(
        day.alias("__d"), F.col(user_col).alias("__u")
    ).dropDuplicates()
    dau = daily.groupBy("__d").agg(F.count(F.lit(1)).alias("dau"))
    exploded = daily.select(
        F.explode(
            F.expr(f"sequence(0, {int(window_days) - 1})")
        ).alias("__i"),
        "__d",
        "__u",
    ).select(
        F.col("__d") + F.make_interval(days=F.col("__i")), F.col("__u")
    ).toDF("__w", "__u").dropDuplicates()
    wau = exploded.groupBy(F.col("__w").alias("__d")).agg(
        F.count(F.lit(1)).alias("wau")
    )
    return (
        dau.join(wau, "__d")
        .select(
            F.date_format("__d", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.try_divide(F.col("dau"), F.col("wau")), round_to).alias(
                "stickiness"
            ),
        )
    )


def autocorrelation(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
    round_to: int = 4,
) -> DataFrame:
    """Per-key autocorrelation function of DAILY event counts at the
    given row lags — the seasonality probe (a strong acf at lag 7 on
    daily data is weekly cycle; a slow decay is trend; ~0 everywhere is
    noise) that decides whether a forecast/trend model is worth
    fitting.

    Shape discipline: aggregate to the daily frame FIRST (one
    map-combined groupBy), so the lag windows partition by key over
    |days| rows per key, never raw events; then one grouped aggregate
    computes every requested lag in a single pass. Row lags on the
    observed day sequence — gap days are absent rows, not zeros;
    resample upstream (``resample_ffill``) if calendar lags are wanted.

    NOT ``F.corr``: under Spark 4 ANSI a zero-variance series makes
    corr's internal division THROW (measured), where DuckDB's corr
    returns NULL. Instead the Pearson coefficient is assembled from
    EXACT int64 moments over the pairwise-complete rows (counts are
    integers, so c, Σx, Σy, Σx², Σy², Σxy are exact), and the only
    float ops are IEEE-deterministic on identical inputs: two
    correctly-rounded sqrts of exact ints, one multiply, one
    ``try_divide`` (NULL on zero variance and on no-complete-pairs,
    matching DuckDB) — bit-identical cross-engine, per the CLAUDE.md
    ulp-exact restructuring discipline. ``den1·den2`` would overflow
    2^53 as one product, so each factor takes its own sqrt first.
    The DECIMAL(18,8) cast before the final round is the exact-half
    round-divergence guard. Int64 headroom: safe through ~1e6 events
    per key-day over ~10k days (c·Σxy peaks ≈ 1e19 beyond that).
    """
    daily = df.groupBy(
        key_col, F.to_date(ts_col).alias("__day")
    ).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(key_col).orderBy("__day")
    lagged = daily.select(
        key_col,
        "__n",
        *[F.lag("__n", int(k)).over(w).alias(f"__l{k}") for k in lags],
    )
    aggs = []
    for k in lags:
        x, y = F.col("__n"), F.col(f"__l{k}")
        m = y.isNotNull()
        c = F.count(y)
        sx = F.sum(F.when(m, x))
        sy = F.sum(y)
        sxx = F.sum(F.when(m, x * x))
        syy = F.sum(y * y)
        sxy = F.sum(F.when(m, x) * y)
        num = (c * sxy - sx * sy).cast("double")
        den = F.sqrt((c * sxx - sx * sx).cast("double")) * F.sqrt(
            (c * syy - sy * sy).cast("double")
        )
        aggs.append(
            F.round(
                F.try_divide(num, den).cast("decimal(18,8)"), round_to
            ).cast("double").alias(f"acf_{k}")
        )
    return lagged.groupBy(key_col).agg(*aggs)


def window_funnel(
    df: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    stages: list,
    window: str = "7 days",
    round_to: int = 4,
) -> DataFrame:
    """Ordered conversion funnel with a completion deadline (the
    product-analytics ``windowFunnel``): per key, stage k counts only
    if it happens STRICTLY AFTER the key's stage k-1 time and within
    ``window`` of its stage-1 time; each stage binds to its earliest
    qualifying event (the canonical earliest-start greedy semantics).
    Returns one row per stage: ``(stage_idx, stage, users,
    pct_of_start)``.

    Dataflow — one keyed join chain, not a per-key sequence scan:
    every step filters the raw stream to ONE stage type (predicate
    pushed to the scan), equi-joins the previous per-key frame on the
    key, and min-aggregates — so each stage is a filtered scan plus a
    keyed shuffle that AQE plans independently, and per-key event
    counts never need to fit in an array (the collect-and-scan
    alternative dies on power users at stream scale). The per-stage
    frames are lazily localCheckpoint-ed: each is consumed by BOTH the
    next stage and the final counts union, and the union of dependent
    selects would otherwise re-execute stage 1's subtree once per
    stage (CLAUDE.md re-execution trap). The final pct window runs
    over the |stages|-row counts frame only.
    """
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    deadline = F.col("__t1") + F.expr(f"INTERVAL {window}")
    cur = (
        base.filter(F.col("__t") == stages[0])
        .groupBy("__k")
        .agg(F.min("__ts").alias("__tk"))
        .withColumn("__t1", F.col("__tk"))
        .transform(lazy_checkpoint)
    )
    per_stage = [cur]
    for stage in stages[1:]:
        ev = base.filter(F.col("__t") == stage)
        cur = (
            ev.join(cur, "__k")
            .filter((F.col("__ts") > F.col("__tk")) & (F.col("__ts") <= deadline))
            .groupBy("__k")
            .agg(F.min("__ts").alias("__tk"), F.min("__t1").alias("__t1"))
            .transform(lazy_checkpoint)
        )
        per_stage.append(cur)
    counts = None
    for idx, (stage, frame) in enumerate(zip(stages, per_stage), start=1):
        c = frame.agg(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("users"),
        )
        counts = c if counts is None else counts.unionByName(c)
    whole = Window.partitionBy()  # |stages| rows — post-agg, safe
    return counts.select(
        "stage_idx",
        "stage",
        "users",
        F.round(
            F.try_divide(F.col("users"), F.max("users").over(whole)), round_to
        ).alias("pct_of_start"),
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    day_col: str = "day",
) -> DataFrame:
    """Exact peak concurrent-interval count per calendar day — the
    sweep-line (+1 at start, −1 past end) over closed intervals
    ``[start, end]``.

    Scale shape: intervals spanning midnight are first SPLIT at day
    boundaries (row-local ``sequence``-of-days explode, fan-out =
    nights spanned), so the running-sum window partitions by DAY —
    never a global single-partition sweep. Each day's sweep runs over
    2 deltas per clipped interval; at volumes where one day outgrows a
    partition, sub-day splitting (same explode, hour grain) is the
    documented extension. Boundary deltas live at exact int64 epoch
    microseconds: the −1 lands at ``end + 1µs`` (closed interval) and
    equal-instant deltas order (−1 before +1), so a session ending
    exactly when another starts never inflates the peak.

    Returns one row per day: ``(day, n_intervals, peak)`` with ``day``
    a yyyy-MM-dd STRING (cross-engine date-hash contract) and
    ``n_intervals`` counting intervals ACTIVE that day (spanners count
    on each day they touch).
    """
    iv = intervals.select(
        F.col(start_col).alias("__s"), F.col(end_col).alias("__e")
    )
    days = iv.select(
        "__s",
        "__e",
        F.explode(
            F.sequence(F.to_date("__s"), F.to_date("__e"))
        ).alias("__d"),
    )
    day_start = F.unix_micros(F.col("__d").cast("timestamp"))
    day_end = day_start + F.lit(86_400_000_000 - 1)
    cs = F.greatest(F.unix_micros("__s"), day_start)
    ce = F.least(F.unix_micros("__e"), day_end)
    clipped = days.select(
        F.col("__d"), cs.alias("__cs"), (ce + F.lit(1)).alias("__ce")
    )
    deltas = clipped.select(
        "__d",
        F.explode(
            F.array(
                F.struct(F.col("__cs").alias("at"), F.lit(1).alias("delta")),
                F.struct(F.col("__ce").alias("at"), F.lit(-1).alias("delta")),
            )
        ).alias("__x"),
    ).select("__d", F.col("__x.at").alias("__at"), F.col("__x.delta").alias("__delta"))
    w = (
        Window.partitionBy("__d")
        .orderBy("__at", "__delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = deltas.withColumn("__run", F.sum("__delta").over(w))
    return (
        swept.groupBy(F.date_format("__d", "yyyy-MM-dd").alias(day_col))
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
            F.max("__run").cast("long").alias("peak"),
        )
    )
