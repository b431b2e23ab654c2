"""Governance & distribution-forensics queries: right-to-be-forgotten
purge accounting, l-diversity release audit, Benford first-digit
screen, and value-concentration (HHI) reporting — the compliance layer
a training-data pipeline needs around the cleaning/dedup stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkprep.functions import numeric
from sparkprep.operators import privacy, skew
from sparkprep.queries import t

# ~1% of customers file deletion requests: salted md5 uniform on the
# key (deterministic, engine-independent — same idiom as
# mix.grouped_split). Shared verbatim with every oracle below.
_REQ_PRED_SQL = (
    "('0x' || substr(md5(c_custkey::VARCHAR || 'purge'), 1, 15))::BIGINT "
    "% 100 = 0"
)


def _request_keys(cust: DataFrame) -> DataFrame:
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("purge"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return cust.filter(u % 100 == 0).select("c_custkey")


def q_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR deletion-request cascade accounting: ~1% of customers ask
    to be forgotten; the purge cascades customer -> their orders ->
    those orders' lineitems. One broadcast-join + map-combined
    aggregate per table (privacy.purge_audit) — the fact tables never
    shuffle, removed rows are counted rather than materialized."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    req = _request_keys(cust)
    okeys = privacy.derive_keys(
        orders, "o_custkey", "o_orderkey", req, "c_custkey"
    )
    return privacy.purge_audit(
        [
            ("customer", cust, "c_custkey", req, "c_custkey"),
            ("lineitem", li, "l_orderkey", okeys, "o_orderkey"),
            ("orders", orders, "o_custkey", req, "c_custkey"),
        ]
    ).orderBy("table_name")


_PURGE_AUDIT_SQL = f"""
WITH req AS (
  SELECT c_custkey FROM customer WHERE {_REQ_PRED_SQL}
),
ok AS (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM req)
),
a AS (
  SELECT 'customer' AS table_name, count(*) AS rows_before,
         count(*) FILTER (WHERE c_custkey IN (SELECT c_custkey FROM req)) AS rows_removed
  FROM customer
  UNION ALL
  SELECT 'lineitem', count(*),
         count(*) FILTER (WHERE l_orderkey IN (SELECT o_orderkey FROM ok))
  FROM lineitem
  UNION ALL
  SELECT 'orders', count(*),
         count(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM req))
  FROM orders
)
SELECT table_name, rows_before::BIGINT AS rows_before,
       rows_removed::BIGINT AS rows_removed,
       (rows_before - rows_removed)::BIGINT AS rows_after
FROM a ORDER BY table_name
"""


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity release audit over (nation x market segment) quasi-
    identifiers with the account-balance thousand-bucket as the
    sensitive attribute: class size, distinct sensitive values,
    at-risk flag (< 5 distinct) and the dataset-wide l_level."""
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("long")
        .alias("bal_bucket"),
    )
    return privacy.l_diversity_report(
        cust, ["c_nationkey", "c_mktsegment"], "bal_bucket", l=5
    ).orderBy("c_nationkey", "c_mktsegment")


_L_DIVERSITY_SQL = """
WITH cls AS (
  SELECT c_nationkey::BIGINT AS c_nationkey, c_mktsegment,
         count(*) AS class_size,
         count(DISTINCT floor(c_acctbal / 1000.0)::BIGINT) AS l_count
  FROM customer GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, class_size::BIGINT AS class_size,
       l_count::BIGINT AS l_count, (l_count < 5) AS at_risk,
       (min(l_count) OVER ())::BIGINT AS l_level
FROM cls ORDER BY c_nationkey, c_mktsegment
"""


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen on order totals: observed digit
    share vs log10(1+1/d) expectation with signed deviation — the
    classic fabricated-numbers detector, one 9-group aggregate."""
    orders = t(spark, sf_dir, "orders")
    return numeric.benford_report(orders, "o_totalprice").orderBy("digit")


_BENFORD_SQL = """
WITH pos AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS d
  FROM orders WHERE o_totalprice > 0
),
dig AS (
  SELECT regexp_extract(d::VARCHAR, '([1-9])', 1)::INT AS digit
  FROM pos WHERE d > 0
),
cnt AS (SELECT digit, count(*) AS n FROM dig GROUP BY digit),
sh AS (
  SELECT digit, n,
         round(n / (sum(n) OVER ())::DOUBLE, 4) AS share,
         round(log10(1 + 1.0 / digit), 4) AS expected
  FROM cnt
)
SELECT digit, n::BIGINT AS n, share, expected,
       round(share - expected, 4) AS deviation
FROM sh ORDER BY digit
"""


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration in one row: key count, exact
    decimal total, HHI, and the top-10 customers' share. Weighted-skew
    twin of key_skew — tells you whether one customer (or corpus
    source) dominates the spend before a mix plan trusts the shares."""
    orders = t(spark, sf_dir, "orders")
    return skew.concentration_report(
        orders, "o_custkey", "o_totalprice", top=10
    )


_CONCENTRATION_SQL = """
WITH per_key AS (
  SELECT o_custkey AS key,
         sum(CAST(o_totalprice AS DECIMAL(18,4))) AS v
  FROM orders GROUP BY 1
),
tot AS (
  SELECT count(*) AS n_keys, sum(v) AS total,
         sum(v::DECIMAL(19,4) * v::DECIMAL(19,4)) AS sumsq
  FROM per_key
),
topk AS (
  SELECT sum(v) AS topv
  FROM (SELECT v FROM per_key ORDER BY v DESC, key ASC LIMIT 10)
)
SELECT n_keys::BIGINT AS n_keys,
       round(total::DOUBLE, 2) AS total_value,
       round(sumsq::DOUBLE / (total::DOUBLE * total::DOUBLE), 6) AS hhi,
       round(topv::DOUBLE / total::DOUBLE, 6) AS top_share
FROM tot, topk
"""




def q_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over three FK edges, one with a
    PLANTED violation (the customer dimension truncated to nations
    < 20 — exactly what a partial dim load looks like): per edge,
    child rows, NULL keys, orphans, ok flag. One keys-only left join +
    map-combined aggregate per edge (expect.fk_checks)."""
    from sparkprep.operators import expect

    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust_truncated = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") < 20
    )
    return expect.fk_checks(
        [
            ("lineitem.orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
            ("nation.regionkey->region", nation, "n_regionkey", region, "r_regionkey"),
            ("orders.custkey->customer(truncated)", orders, "o_custkey", cust_truncated, "c_custkey"),
        ]
    ).orderBy("edge")


_FK_AUDIT_SQL = """
WITH e1 AS (
  SELECT 'lineitem.orderkey->orders' AS edge, count(*) AS child_rows,
         count(*) FILTER (WHERE l_orderkey IS NULL) AS null_keys,
         count(*) FILTER (WHERE l_orderkey IS NOT NULL
           AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphans
  FROM lineitem
),
e2 AS (
  SELECT 'nation.regionkey->region', count(*),
         count(*) FILTER (WHERE n_regionkey IS NULL),
         count(*) FILTER (WHERE n_regionkey IS NOT NULL
           AND n_regionkey NOT IN (SELECT r_regionkey FROM region))
  FROM nation
),
e3 AS (
  SELECT 'orders.custkey->customer(truncated)', count(*),
         count(*) FILTER (WHERE o_custkey IS NULL),
         count(*) FILTER (WHERE o_custkey IS NOT NULL
           AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_nationkey < 20))
  FROM orders
),
a AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
SELECT edge, child_rows::BIGINT AS child_rows, null_keys::BIGINT AS null_keys,
       orphans::BIGINT AS orphans, (orphans = 0) AS ok
FROM a ORDER BY edge
"""


_FD_PAIRS = [
    ("o_orderkey", "o_custkey"),       # key determines everything: holds
    ("o_custkey", "o_orderstatus"),    # customers reorder: violated
    ("o_orderstatus", "o_orderpriority"),  # two tiny domains: violated
]


def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over orders (profile.fd_audit): all
    candidates in ONE scan via explode-over-struct, violations from the
    two-phase count_distinct. NULL determinants excluded; a NULL
    dependent counts as a distinct value (mirrored in the oracle)."""
    from sparkprep.operators import profile

    orders = t(spark, sf_dir, "orders")
    return profile.fd_audit(orders, _FD_PAIRS)


def _fd_sql() -> str:
    blocks = []
    for a, b in _FD_PAIRS:
        blocks.append(f"""
SELECT '{a}->{b}' AS dependency,
       count(*)::BIGINT AS n_groups,
       sum(CASE WHEN vals > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
       sum(CASE WHEN vals > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (
  SELECT {a},
         count(DISTINCT {b}::VARCHAR)
         + CASE WHEN sum(CASE WHEN {b} IS NULL THEN 1 ELSE 0 END) > 0
                THEN 1 ELSE 0 END AS vals
  FROM orders WHERE {a} IS NOT NULL GROUP BY {a}
)""")
    return " UNION ALL ".join(blocks)


_KS_EDGES = [0.0] + [50000.0 * i for i in range(1, 10)] + [500000.0]


def q_sample_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling QC: binned two-sample KS between the deterministic 10%
    md5 sample of orders and the remaining 90% on o_totalprice
    (expect.ks_cohorts). A healthy sampler reads ~0 here; a biased one
    (e.g. sampling by a key correlated with price) jumps out. One scan,
    one keyed exchange; cumulative CDFs from exact int64 counts."""
    from sparkprep.operators import expect
    from sparkprep.operators.dedup import string_to_int_hash

    orders = t(spark, sf_dir, "orders")
    in_sample = (
        string_to_int_hash(F.col("o_orderkey").cast("string")) % 10 == 0
    )
    return expect.ks_cohorts(orders, in_sample, "o_totalprice", _KS_EDGES)


_SAMPLE_KS_SQL = """
WITH src AS (
  SELECT CASE WHEN (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
                    % 2147483647) % 10 = 0 THEN 1 ELSE 0 END AS grp,
         CASE WHEN o_totalprice >= 450000.0 THEN 9 WHEN o_totalprice >= 400000.0 THEN 8 WHEN o_totalprice >= 350000.0 THEN 7 WHEN o_totalprice >= 300000.0 THEN 6 WHEN o_totalprice >= 250000.0 THEN 5 WHEN o_totalprice >= 200000.0 THEN 4 WHEN o_totalprice >= 150000.0 THEN 3 WHEN o_totalprice >= 100000.0 THEN 2 WHEN o_totalprice >= 50000.0 THEN 1 ELSE 0 END AS bin_id
  FROM orders WHERE o_totalprice IS NOT NULL
),
c AS (
  SELECT bin_id,
         sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS nb,
         sum(grp) AS na
  FROM src GROUP BY bin_id
),
k AS (
  SELECT sum(nb) OVER (ORDER BY bin_id) AS cb,
         sum(na) OVER (ORDER BY bin_id) AS ca,
         sum(nb) OVER () AS tb,
         sum(na) OVER () AS ta
  FROM c
)
SELECT max(tb)::BIGINT AS n_before, max(ta)::BIGINT AS n_after,
       max(round(abs(cb::DOUBLE / tb - ca::DOUBLE / ta), 6)) AS ks_stat
FROM k
"""


def q_pseudonym_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization release gate (privacy.pseudonym_audit): every
    distinct events.user_id mapped to its salted md5 token — distinct
    keys vs distinct tokens and the collision count must reconcile
    before the pseudonymized table ships."""
    ev = t(spark, sf_dir, "events")
    return privacy.pseudonym_audit(ev, "user_id", salt="r3")


_PSEUDONYM_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id,
         substr(md5('r3' || user_id::VARCHAR), 1, 16) AS tok
  FROM events WHERE user_id IS NOT NULL
)
SELECT count(*)::BIGINT AS n_keys,
       count(DISTINCT tok)::BIGINT AS n_tokens,
       (count(*) - count(DISTINCT tok))::BIGINT AS collisions
FROM pairs
"""


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the same (nation × market segment)
    quasi-identifiers and thousand-dollar balance buckets as
    l_diversity — the gate that catches a class which is large AND
    diverse yet skewed toward one end of the balance scale. Ordered
    EMD with an exact integer numerator per class (|cum_c·N − cum_g·n|
    summed in DECIMAL(38,0)) and ONE final division
    (``privacy.t_closeness_report``); the bucket panel is a bounded
    driver collect, densification is a row-local literal-array explode
    (never a cross join)."""
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("long")
        .alias("bal_bucket"),
    )
    return privacy.t_closeness_report(
        cust, ["c_nationkey", "c_mktsegment"], "bal_bucket", t=0.2
    ).orderBy("c_nationkey", "c_mktsegment")


_T_CLOSENESS_SQL = """
WITH c AS (
  SELECT c_nationkey::BIGINT AS c_nationkey, c_mktsegment,
         floor(c_acctbal / 1000.0)::BIGINT AS b
  FROM customer WHERE c_acctbal IS NOT NULL
),
cb AS (
  SELECT c_nationkey, c_mktsegment, b, count(*) AS cnt
  FROM c GROUP BY 1, 2, 3
),
panel AS (
  SELECT b, sum(cnt) AS g,
         sum(sum(cnt)) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cg
  FROM cb GROUP BY b
),
tot AS (SELECT sum(g) AS N, count(*) AS nb FROM panel),
cls AS (
  SELECT c_nationkey, c_mktsegment, sum(cnt) AS nc
  FROM cb GROUP BY 1, 2
),
grid AS (
  SELECT cls.c_nationkey, cls.c_mktsegment, cls.nc, panel.b, panel.cg
  FROM cls CROSS JOIN panel
),
cum AS (
  SELECT grid.c_nationkey, grid.c_mktsegment, grid.nc, grid.b, grid.cg,
         sum(coalesce(cb.cnt, 0)) OVER (
           PARTITION BY grid.c_nationkey, grid.c_mktsegment
           ORDER BY grid.b ROWS UNBOUNDED PRECEDING) AS cc
  FROM grid LEFT JOIN cb
    ON grid.c_nationkey = cb.c_nationkey
   AND grid.c_mktsegment = cb.c_mktsegment
   AND grid.b = cb.b
),
per AS (
  SELECT c_nationkey, c_mktsegment, nc,
         sum(abs(cc * (SELECT N FROM tot) - cg * nc)::DECIMAL(38,0)) AS s
  FROM cum GROUP BY 1, 2, 3
),
scored AS (
  SELECT c_nationkey, c_mktsegment, nc::BIGINT AS class_size,
         round(s::DOUBLE / (nc::DOUBLE * (SELECT N FROM tot)
                            * ((SELECT nb FROM tot) - 1)), 6) AS t_closeness
  FROM per
)
SELECT c_nationkey, c_mktsegment, class_size, t_closeness,
       (t_closeness > 0.2) AS at_risk,
       max(t_closeness) OVER () AS t_level
FROM scored ORDER BY c_nationkey, c_mktsegment
"""



_DP_EPSILON = 1.0
_MERSENNE_P = 2147483647


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private event-type counts via the Laplace
    mechanism with a DETERMINISTIC noise draw — the release mechanism
    that completes the privacy suite (k-anon/l-div/t-closeness audit
    risk; this is the mitigation). Count queries have sensitivity 1,
    so noise ~ Laplace(1/ε). The draw replays on any engine: u comes
    from the md5 hash of the group key mapped into (0,1) (u =
    (h + 0.5)/P — never exactly 0 or 1, so the inverse CDF is always
    finite), noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|). No RNG, no float
    comparisons in the branch (the sign tests against exact integers).
    True counts emitted alongside for the demo/audit; a production
    release would drop them. ε = 1."""
    from sparkprep.operators.dedup import string_to_int_hash

    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n"))
    h = string_to_int_hash(F.col("event_type"))
    u = (h.cast("double") + 0.5) / float(_MERSENNE_P)
    half = u - 0.5
    mag = F.log(1.0 - 2.0 * F.abs(half))
    # noise = -(1/eps) * sign(half) * ln(1 - 2|half|): ln <= 0, so
    # u above the median draws POSITIVE noise (standard inverse CDF)
    noise = (
        F.when(half >= 0, 1.0).otherwise(-1.0) * mag / F.lit(-_DP_EPSILON)
    )
    return per.select(
        "event_type",
        F.col("__n").cast("long").alias("n_true"),
        F.round(noise.cast("decimal(18,8)"), 4).cast("double").alias("noise"),
        F.round(
            (F.col("__n").cast("double") + noise).cast("decimal(18,8)"), 4
        ).cast("double").alias("n_released"),
        F.lit(float(_DP_EPSILON)).alias("epsilon"),
    )


_DP_COUNTS_SQL = f"""
WITH per AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1
),
drawn AS (
  SELECT event_type, n,
         ((('0x' || substr(md5(event_type), 1, 15))::BIGINT
            % {_MERSENNE_P})::DOUBLE + 0.5) / {float(_MERSENNE_P)} AS u
  FROM per
),
noisy AS (
  SELECT event_type, n,
         (CASE WHEN u - 0.5 >= 0 THEN 1.0 ELSE -1.0 END)
           * ln(1.0 - 2.0 * abs(u - 0.5)) / (-{_DP_EPSILON}) AS noise
  FROM drawn
)
SELECT event_type,
       n::BIGINT AS n_true,
       round(noise::DECIMAL(18,8), 4)::DOUBLE AS noise,
       round((n::DOUBLE + noise)::DECIMAL(18,8), 4)::DOUBLE AS n_released,
       {float(_DP_EPSILON)} AS epsilon
FROM noisy
"""



_DP_HIST_WIDTH = 60_000
_DP_HIST_BUCKETS = 10


def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram of order value — dp_counts'
    sibling for numerics: 10 FIXED-width buckets (data-independent
    edges — learning edges from the data would itself leak), one count
    per bucket, Laplace(1/ε) noise from the md5-derived uniform of the
    bucket id (histogram sensitivity is 1: one individual lands in
    exactly one bucket). Same deterministic inverse CDF as dp_counts —
    replays identically on any engine, no RNG. ε = 1."""
    ev = t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _DP_HIST_WIDTH).cast("long"),
        F.lit(_DP_HIST_BUCKETS - 1),
    )
    per = ev.groupBy(bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    from sparkprep.operators.dedup import string_to_int_hash

    h = string_to_int_hash(F.concat_ws(":", F.lit("dph"), F.col("__b")))
    u = (h.cast("double") + 0.5) / float(_MERSENNE_P)
    half = u - 0.5
    noise = (
        F.when(half >= 0, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(half))
        / F.lit(-_DP_EPSILON)
    )
    return per.select(
        F.col("__b").cast("long").alias("bucket"),
        (F.col("__b") * _DP_HIST_WIDTH).cast("double").alias("lo"),
        ((F.col("__b") + 1) * _DP_HIST_WIDTH).cast("double").alias("hi"),
        F.col("__n").cast("long").alias("n_true"),
        F.round(noise.cast("decimal(18,8)"), 4).cast("double").alias("noise"),
        F.round(
            (F.col("__n").cast("double") + noise).cast("decimal(18,8)"), 4
        ).cast("double").alias("n_released"),
    )


_DP_HISTOGRAM_SQL = f"""
WITH per AS (
  SELECT least(floor(o_totalprice / {_DP_HIST_WIDTH})::BIGINT,
               {_DP_HIST_BUCKETS - 1}) AS b,
         count(*) AS n
  FROM orders GROUP BY 1
),
drawn AS (
  SELECT b, n,
         ((('0x' || substr(md5('dph:' || b::VARCHAR), 1, 15))::BIGINT
            % {_MERSENNE_P})::DOUBLE + 0.5) / {float(_MERSENNE_P)} AS u
  FROM per
),
noisy AS (
  SELECT b, n,
         (CASE WHEN u - 0.5 >= 0 THEN 1.0 ELSE -1.0 END)
           * ln(1.0 - 2.0 * abs(u - 0.5)) / (-{_DP_EPSILON}) AS noise
  FROM drawn
)
SELECT b::BIGINT AS bucket,
       (b * {_DP_HIST_WIDTH})::DOUBLE AS lo,
       ((b + 1) * {_DP_HIST_WIDTH})::DOUBLE AS hi,
       n::BIGINT AS n_true,
       round(noise::DECIMAL(18,8), 4)::DOUBLE AS noise,
       round((n::DOUBLE + noise)::DECIMAL(18,8), 4)::DOUBLE AS n_released
FROM noisy
"""


QUERIES = {
    "t_closeness": q_t_closeness,
    "fk_audit": q_fk_audit,
    "fd_audit": q_fd_audit,
    "sample_ks": q_sample_ks,
    "pseudonym_audit": q_pseudonym_audit,
    "purge_audit": q_purge_audit,
    "l_diversity": q_l_diversity,
    "benford": q_benford,
    "revenue_concentration": q_revenue_concentration,
    "dp_counts": q_dp_counts,
    "dp_histogram": q_dp_histogram,
}

ORACLES = {
    "t_closeness": _T_CLOSENESS_SQL,
    "fk_audit": _FK_AUDIT_SQL,
    "fd_audit": _fd_sql(),
    "sample_ks": _SAMPLE_KS_SQL,
    "pseudonym_audit": _PSEUDONYM_SQL,
    "purge_audit": _PURGE_AUDIT_SQL,
    "l_diversity": _L_DIVERSITY_SQL,
    "benford": _BENFORD_SQL,
    "revenue_concentration": _CONCENTRATION_SQL,
    "dp_counts": _DP_COUNTS_SQL,
    "dp_histogram": _DP_HISTOGRAM_SQL,
}


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder — round 8
# ---------------------------------------------------------------------------


def q_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anonymization trade-off curve: k-anonymity metrics at four
    quasi-identifier generalization levels (balance-bucket × nation ×
    segment → nation × segment → region × segment → region) — the
    table a privacy review reads to pick the coarsest release that
    still clears k ≥ 10 (k_anonymity audits ONE level; this is the
    search ladder above it).

    Per level: class count, k-level (min class size), rows at risk and
    the at-risk fraction (ONE exact int division). Each level is an
    independent aggregated subtree over the small dimension join
    (nation/region broadcast); the unioned branches re-scan only the
    customer dimension — cheap by construction, and the fact tables
    are never touched."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_bucket"),
    )
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    joined = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    )

    def level(label: str, cols: list) -> DataFrame:
        classes = joined.groupBy(*cols).agg(F.count(F.lit(1)).alias("sz"))
        return classes.agg(
            F.lit(label).alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("sz").cast("long").alias("k_level"),
            F.sum(F.when(F.col("sz") < 10, F.col("sz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.round(
                (
                    F.sum(F.when(F.col("sz") < 10, F.col("sz")).otherwise(0))
                    .cast("double")
                    / F.sum("sz").cast("double")
                ).cast("decimal(18,8)"),
                6,
            )
            .cast("double")
            .alias("at_risk_frac"),
        )

    return (
        level("L0:bucket+nation+segment", ["bal_bucket", "c_nationkey", "c_mktsegment"])
        .unionByName(level("L1:nation+segment", ["c_nationkey", "c_mktsegment"]))
        .unionByName(level("L2:region+segment", ["n_regionkey", "c_mktsegment"]))
        .unionByName(level("L3:region", ["n_regionkey"]))
        .orderBy("level")
    )


def _gl_level_sql(label: str, cols: str) -> str:
    return f"""
SELECT '{label}' AS level, count(*)::BIGINT AS n_classes,
       min(sz)::BIGINT AS k_level,
       sum(CASE WHEN sz < 10 THEN sz ELSE 0 END)::BIGINT AS rows_at_risk,
       round((sum(CASE WHEN sz < 10 THEN sz ELSE 0 END)::DOUBLE
              / sum(sz)::DOUBLE)::DECIMAL(18,8), 6)::DOUBLE AS at_risk_frac
FROM (SELECT {cols}, count(*) AS sz FROM gl_j GROUP BY {cols})"""


_GENERALIZATION_LADDER_SQL = (
    """
WITH gl_j AS MATERIALIZED (
  SELECT c_custkey, c_nationkey, c_mktsegment, n_regionkey,
         floor(c_acctbal / 1000.0)::BIGINT AS bal_bucket
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)"""
    + _gl_level_sql("L0:bucket+nation+segment", "bal_bucket, c_nationkey, c_mktsegment")
    + "\nUNION ALL" + _gl_level_sql("L1:nation+segment", "c_nationkey, c_mktsegment")
    + "\nUNION ALL" + _gl_level_sql("L2:region+segment", "n_regionkey, c_mktsegment")
    + "\nUNION ALL" + _gl_level_sql("L3:region", "n_regionkey")
    + "\nORDER BY level"
)


QUERIES["generalization_ladder"] = q_generalization_ladder
ORACLES["generalization_ladder"] = _GENERALIZATION_LADDER_SQL


# ---------------------------------------------------------------------------
# per-source Merkle-style integrity manifest — round 10
# ---------------------------------------------------------------------------


def q_merkle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evident per-source corpus manifest: each source's digest
    is md5 over its docs' per-text md5s concatenated in doc_id order —
    one 32-hex string per source that changes if ANY document is
    edited, dropped, or reordered, plus the row/char totals an auditor
    reconciles first. The 100 TB shape is per-SHARD manifests (this
    exact groupBy keyed on (source, shard)) rolled up the same way —
    the chain per group is bounded by shard size, never corpus size;
    here the group key is the source column (4 groups, ~kB of digest
    string per group). Ordered fold = array_sort(collect_list(struct))
    — one map-combined exchange, no window; md5 on both engines makes
    the digest engine-identical (the repo-wide hashing discipline)."""
    docs = t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "doc_id",
        F.md5(F.col("text")).alias("h"),
        F.length("text").alias("nc"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("total_chars"),
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "h"))
                        ),
                        lambda s: s["h"],
                    ),
                )
            ).alias("digest"),
        )
        .orderBy("source")
    )


_MERKLE_MANIFEST_SQL = """
SELECT source, count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS total_chars,
       md5(string_agg(md5(text), '' ORDER BY doc_id)) AS digest
FROM documents GROUP BY source ORDER BY source
"""


QUERIES["merkle_manifest"] = q_merkle_manifest
ORACLES["merkle_manifest"] = _MERKLE_MANIFEST_SQL
