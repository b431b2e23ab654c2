"""Corpus quality report as a runnable job: rule gate → distilled
logistic score → calibration table → PII exposure audit, printed as one
health report. The read-only companion to prep_corpus.py — run it BEFORE
deciding thresholds, then feed the chosen cut to the prep pipeline.

    python examples/quality_report.py [sf_dir]

Every number here is oracle-checked in the registry (gopher_rules,
quality_logit, score_calibration, pii_census); this script just
composes them over one session (each block is one job; the gate
counts fuse into a single aggregate).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkprep.queries import registry  # noqa: E402
from sparkprep.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

if __name__ == "__main__":
    spark = build_session(app_name="quality-report")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    gate = queries["gopher_rules"](spark, SF_DIR)
    counts = gate.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("pass").cast("int")).alias("p")
    ).collect()[0]
    n_docs, n_pass = counts.n, counts.p
    print(f"rule gate: {n_pass}/{n_docs} documents pass "
          f"({100.0 * n_pass / n_docs:.1f}%)")

    print("\nscore calibration (logit bucket vs rule pass rate):")
    for r in queries["score_calibration"](spark, SF_DIR).collect():
        bar = "#" * int(r.pass_rate * 40)
        print(f"  [{r.score_bucket:>2}] n={r.n_docs:<5} pass_rate={r.pass_rate:<7} {bar}")

    print("\nPII exposure by source:")
    for r in queries["pii_census"](spark, SF_DIR).collect():
        print(f"  {r.source:<12} docs_with_pii={r.docs_with_pii}/{r.n_docs} "
              f"email={r.n_email} url={r.n_url} ip={r.n_ip} phone={r.n_phone}")

    spark.stop()
