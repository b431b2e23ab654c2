"""Experimentation & inference as a runnable job: the round-6 stats
block over the events/lineitem tables — classic two-proportion A/B,
CUPED variance-reduced readout, nonparametric rank tests
(Mann-Whitney / Kruskal-Wallis), robust trend (Theil-Sen +
Mann-Kendall), and the growth panel (cumulative reach, per-user
time-weighted averages). Every number is the same oracle-checked
operator the registry exposes.

    python examples/experiment_report.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkprep.queries.relational_ext import (  # noqa: E402
    q_kruskal_wallis,
    q_mann_whitney,
    q_weighted_median,
)
from sparkprep.queries.temporal_grouped import (  # noqa: E402
    q_ab_test,
    q_cumulative_reach,
    q_cuped,
    q_signed_rank,
    q_trend_robust,
    q_user_twa,
)
from sparkprep.session import build_session  # noqa: E402


def main(sf_dir: str) -> None:
    spark = build_session("experiment-report")

    print("== A/B conversion (two-proportion z) ==")
    q_ab_test(spark, sf_dir).show(truncate=False)

    print("== CUPED variance-reduced value readout ==")
    q_cuped(spark, sf_dir).show(truncate=False)

    print("== Mann-Whitney U: quantity, returned vs clean lines ==")
    q_mann_whitney(spark, sf_dir).show(truncate=False)

    print("== Kruskal-Wallis H: quantity across order priorities ==")
    q_kruskal_wallis(spark, sf_dir).show(truncate=False)

    print("== Wilcoxon signed-rank: did per-user activity shift? ==")
    q_signed_rank(spark, sf_dir).show(truncate=False)

    print("== Robust daily trend per event type ==")
    q_trend_robust(spark, sf_dir).orderBy("event_type").show(truncate=False)

    print("== Cumulative reach (first-touch growth) ==")
    q_cumulative_reach(spark, sf_dir).orderBy("day").show(truncate=False)

    print("== Revenue-weighted quantity quartiles ==")
    q_weighted_median(spark, sf_dir).orderBy("l_returnflag").show(
        truncate=False
    )

    print("== Per-user time-weighted value (top 10 by span) ==")
    q_user_twa(spark, sf_dir).orderBy(
        "span_s", ascending=False
    ).limit(10).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
