"""Product-analytics report as a runnable job: the round-5 behavioral
block composed over the events table — ordered conversion funnel,
cohort retention triangle, session-quality panel, peak concurrent
sessions, engagement-lifetime life table, and the week-mix chi-square
— one session, one read of the fact table per query, every number
backed by the same oracle-checked operators the registry exposes.

    python examples/product_analytics.py [sf_dir]

Read-only; prints one report. Scale shape: every per-user stage is a
keyed shuffle on user_id; every global statistic folds an aggregated
frame (stages, sessions, cohorts) — nothing windows raw data globally.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkprep.queries.temporal_grouped import (  # noqa: E402
    q_chi_square,
    q_cohort_retention,
    q_peak_concurrency,
    q_session_stats,
    q_survival_table,
    q_window_funnel,
)
from sparkprep.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

if __name__ == "__main__":
    spark = build_session(app_name="product-analytics")
    spark.sparkContext.setLogLevel("ERROR")

    print("== conversion funnel (7-day deadline, ordered) ==")
    q_window_funnel(spark, SF_DIR).orderBy("stage_idx").show(truncate=False)

    print("== cohort retention (first 3 cohorts) ==")
    (
        q_cohort_retention(spark, SF_DIR)
        .orderBy("cohort_day", "day_offset")
        .show(15, truncate=False)
    )

    print("== session quality ==")
    q_session_stats(spark, SF_DIR).show(truncate=False)

    print("== peak concurrent sessions per day (top 5) ==")
    (
        q_peak_concurrency(spark, SF_DIR)
        .orderBy("peak", ascending=False)
        .show(5, truncate=False)
    )

    print("== engagement lifetime — KM life table head ==")
    lt = q_survival_table(spark, SF_DIR).orderBy("t_sec").limit(10).toPandas()
    # survival curve: the documented client-side fold over the table
    surv = 1.0
    for _, r in lt.iterrows():
        surv *= 1.0 - r["hazard"]
        print(
            f"  t={int(r['t_sec']):>8}s  at_risk={int(r['n_at_risk']):>4}"
            f"  d={int(r['n_events'])}  S(t)={surv:.4f}"
        )

    print("== traffic mix stability across the week ==")
    q_chi_square(spark, SF_DIR).show(truncate=False)

    spark.stop()
