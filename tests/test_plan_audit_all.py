"""Whole-registry plan audit: every one of the 100+ registered queries
must be free of the scale-killers, not just the 9 spot-checked in
test_plans_quality. A correct result from a bad plan fails here.

Checks per query (static optimized/physical plan, no execution):
- no CartesianProduct / BroadcastNestedLoopJoin (accidental cross)
- no BatchEvalPython (row-at-a-time Python UDF fell into the plan);
  Arrow nodes (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas /
  PythonMapInArrow) are the sanctioned Python paths
- no Window over a SinglePartition exchange of RAW (pre-aggregate)
  data; empty-frame windows are only allowed on post-aggregate frames,
  which show a HashAggregate below the single-partition exchange
"""

import pytest

from sparkprep.queries import registry

QUERIES, _ = registry()


def _simple(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    plans = {}
    for name, fn in QUERIES.items():
        plans[name] = _simple(fn(spark, sf_dir))
    return plans


def test_no_cartesian_anywhere(all_plans):
    bad = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian products in: {bad}"


# BNLJ is sanctioned ONLY as the tiny-broadcast cross-attach pattern:
# a <=5-row frame (scalar aggregate or the query-vector side) broadcast
# against the big side — no join key exists, and the broadcast side is
# O(1) rows by construction.
_TINY_BROADCAST_CROSS = {
    "cosine_topk",       # 5 query vectors broadcast x corpus (by design)
    "minmax_normalize",  # 1-row fused min/max scalar frame attach
    "ep1_prep",          # same scalar-attach inside the EP1 chain
    "hybrid_rrf",        # dense leg = 1 query vector broadcast x corpus
    "key_skew",          # 1-row totals frame attach to the top-k keys
    "revenue_concentration",  # 1-row totals x 1-row top-k sum attach
    "join_forecast",     # 1-row totals x (<=1)-row hottest-key attach
    "vocab_coverage",    # 1-row folded coverage x 1-row token total
    "quantile_normalize",  # 1-row reference-size scalar attach
    "retrieval_overlap",   # dense leg = 1 query vector broadcast x corpus
    "triangle_count",    # 1-row node/edge/triangle census frames attach
    "assortativity",     # 1-row Pearson sums x 1-row node count attach
    "user_migration",    # 1-row stream min/max bounds attach
    "basket_size_dist",  # 1-row order-total attach for the share column
    "rfm_segments",      # 1-row max-order-day attach for recency
}

# the one deliberate Python-row-path showcase: a Python UDTF (SURVEY
# extension); every other query must stay on the JVM/Arrow path.
_PYTHON_SHOWCASE = {"udtf_bigrams"}


def test_no_nested_loop_joins(all_plans):
    bad = [
        n for n, p in all_plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in _TINY_BROADCAST_CROSS
    ]
    assert not bad, f"nested-loop joins in: {bad}"


def test_no_row_python_udfs_anywhere(all_plans):
    bad = [
        n for n, p in all_plans.items()
        if "BatchEvalPython" in p and n not in _PYTHON_SHOWCASE
    ]
    assert not bad, f"row-at-a-time Python UDFs in: {bad}"


def test_single_partition_windows_only_post_agg(all_plans):
    # Window fed by Exchange SinglePartition is fatal on raw data; it is
    # acceptable only when the exchanged frame is already an aggregate
    # (HashAggregate/ObjectHashAggregate/SortAggregate appears below the
    # exchange in the tree, i.e., later in the plan string).
    offenders = []
    for name, plan in all_plans.items():
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            above = "\n".join(lines[:i])
            below = "\n".join(lines[i:])
            if "Window" in above and "Aggregate" not in below:
                offenders.append(name)
                break
    assert not offenders, f"single-partition window over raw data in: {offenders}"
