"""Co-purchase graph analytics as a runnable job: the round-5 graph
block over the lineitem basket data — triangle census, degree
assortativity, association rules, 2-hop reach, and PageRank over the
part↔supplier bipartite graph. Every number is the same oracle-checked
operator the registry exposes.

    python examples/graph_report.py [sf_dir]

Read-only; prints one report. Scale shape: the support-thresholded
edge list is built once per query from capped row-local basket pair
explodes; triangles enumerate degree-ORIENTED wedges (O(m^1.5) under
hub skew); PageRank iterates integer fixed-point keyed shuffles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkprep.queries.relational_ext import (  # noqa: E402
    q_assoc_rules,
    q_assortativity,
    q_pagerank,
    q_triangle_count,
    q_two_hop_reach,
)
from sparkprep.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

if __name__ == "__main__":
    spark = build_session(app_name="graph-report")
    spark.sparkContext.setLogLevel("ERROR")

    print("== triangle census (co-purchase, support >= 2) ==")
    q_triangle_count(spark, SF_DIR).show(truncate=False)

    print("== degree assortativity ==")
    q_assortativity(spark, SF_DIR).show(truncate=False)

    print("== top association rules by lift ==")
    q_assoc_rules(spark, SF_DIR).show(10, truncate=False)

    print("== widest 2-hop reach ==")
    q_two_hop_reach(spark, SF_DIR).show(10, truncate=False)

    print("== PageRank head (part/supplier bipartite) ==")
    q_pagerank(spark, SF_DIR).orderBy("pr", ascending=False).show(
        10, truncate=False
    )

    spark.stop()
