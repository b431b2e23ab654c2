"""Data-quality monitoring as a runnable job: declarative constraint
suite over the fact table, PSI drift between two snapshots, and the
same two checks re-run per micro-batch on a stream of the identical
data — demonstrating that the batch expressions ARE the streaming
monitor (unified API, no second implementation to trust).

    python examples/monitor_quality.py [sf_dir]

Read-only; prints one report. The monitoring shape that scales: the
reference distribution reduces ONCE to a K-row share table, and each
scored batch costs one map-combined groupBy on the bin id.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkprep import streaming as st  # noqa: E402
from sparkprep.operators import expect as ex  # noqa: E402
from sparkprep.queries import t  # noqa: E402
from sparkprep.session import build_session  # noqa: E402
from sparkprep.streaming import quality as sq  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
EDGES = [0.0, 10.0, 25.0, 50.0, 80.0, 350.0]

if __name__ == "__main__":
    spark = build_session(app_name="quality-monitor")
    spark.sparkContext.setLogLevel("ERROR")
    events = t(spark, SF_DIR, "events")

    # 1. batch constraint suite — every metric in ONE pass
    suite = ex.Suite(
        checks=[
            ex.completeness("value", 1.0),
            ex.completeness("user_id", 1.0),
            ex.in_range("value", 0.0, 400.0),
            ex.in_set(
                "event_type", ["view", "click", "purchase", "signup", "error"]
            ),
            ex.mean_between("value", 40.0, 60.0),
            # HLL path (the scale default): size the floor for the
            # sketch's ~2-5% rsd — a 0.999 floor on an approximate
            # cardinality is a guaranteed false alarm
            ex.uniqueness("event_id", 0.9),
        ]
    )
    print("== constraint suite ==")
    for r in suite.report_df(events).collect():
        flag = "PASS" if r["passed"] else "FAIL"
        print(f"  [{flag}] {r['check']:28s} metric={r['metric']}")

    # 2. PSI drift between user cohorts (stand-in for week-over-week)
    before = events.filter(F.col("user_id") % 2 == 0)
    after = events.filter(F.col("user_id") % 2 == 1)
    psi = ex.psi_drift(before, after, "value", EDGES).collect()[0]
    verdict = (
        "stable" if psi["psi"] < 0.1
        else "moderate shift" if psi["psi"] < 0.25
        else "ACTION NEEDED"
    )
    print(f"== PSI drift == {psi['psi']} over {psi['n_bins']} bins -> {verdict}")

    # 3. the same checks as a streaming monitor over the identical file
    ref = ex.reference_shares(events, "value", EDGES)
    records = []
    stream = st.read_events_stream(spark, os.path.join(SF_DIR, "events.parquet"))
    ckpt = tempfile.mkdtemp(prefix="monitor-ckpt-")
    try:
        st.run_available_now(
            stream,
            foreach_batch=sq.drift_monitor_sink(
                "value", EDGES, ref,
                lambda bid, n, p: records.append((bid, n, p)),
            ),
            checkpoint=os.path.join(ckpt, "drift"),
            output_mode="append",
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    print("== streaming drift (per micro-batch vs full-corpus reference) ==")
    for bid, n, p in records:
        print(f"  batch {bid}: rows={n} psi={p}")
    spark.stop()
