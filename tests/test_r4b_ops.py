"""Round-4 second-wave operators: integer fixed-point PageRank,
Pareto frontier, prefix-filtered exact Jaccard join, autocorrelation.
Semantics the sf0.001/sf0.01 oracle replay can't see: hand-computed
tiny graphs, tie handling, prefix-filter completeness vs brute force,
degenerate-series NULL contracts.
"""

import pytest
from pyspark.sql import functions as F

from sparkprep.operators import dedup as dd
from sparkprep.operators import graph, temporal, transform

SCALE = 10**12


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_two_cycle_exact(spark):
    # A <-> B, n=2: base = scale//2, teleport = base*15//100.
    # Symmetric, deg 1 each: each step r' = teleport + (r*85)//100
    # for both nodes — compute the recurrence in python and demand
    # bit-equality.
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    out = _ranks(graph.pagerank(edges, nodes, iterations=3))
    base = SCALE // 2
    teleport = (base * 15) // 100
    r = base
    for _ in range(3):
        r = teleport + (r * 85) // 100
    assert out == {1: r, 2: r}


def test_pagerank_dangling_leaks_and_sink_collects(spark):
    # 1 -> 2, node 2 dangling. After one step:
    #   r(1) = teleport (nothing points at it)
    #   r(2) = teleport + (r0 * 85)//100
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    out = _ranks(graph.pagerank(edges, nodes, iterations=1))
    base = SCALE // 2
    teleport = (base * 15) // 100
    assert out[1] == teleport
    assert out[2] == teleport + (base * 85) // 100
    # total mass strictly below scale: node 2's inflow is damped and
    # node 2's own mass left the system (dangling leak by contract)
    assert sum(out.values()) < SCALE


def test_pagerank_mass_bounded_and_isolated_node(spark):
    # a 3-cycle plus an isolated node: isolated node holds exactly the
    # teleport floor; mass never exceeds the initial total.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "node long")
    out = _ranks(graph.pagerank(edges, nodes, iterations=4))
    base = SCALE // 4
    teleport = (base * 15) // 100
    assert out[9] == teleport
    assert sum(out.values()) <= SCALE
    # cycle nodes are symmetric -> identical ranks, all above isolated
    assert out[1] == out[2] == out[3] > out[9]


def test_pareto_frontier_basic_and_ties(spark):
    rows = [
        # (id, price, size)
        (1, 10.0, 5),   # frontier
        (2, 10.0, 5),   # exact tie with 1 on both dims -> BOTH kept
        (3, 12.0, 5),   # dominated by 1 (same size, higher price)
        (4, 12.0, 7),   # frontier (bigger size than anything cheaper)
        (5, 9.0, 1),    # frontier (cheapest overall)
        (6, 15.0, 7),   # dominated by 4 (same size, higher price)
        (7, 15.0, 6),   # dominated by 4 (cheaper AND bigger)
    ]
    df = spark.createDataFrame(rows, "id long, price double, size int")
    kept = {
        r.id for r in transform.pareto_frontier(df, "price", "size").collect()
    }
    assert kept == {1, 2, 4, 5}


def test_pareto_frontier_single_row_and_all_equal(spark):
    df = spark.createDataFrame([(1, 5.0, 3)], "id long, price double, size int")
    assert transform.pareto_frontier(df, "price", "size").count() == 1
    eq = spark.createDataFrame(
        [(i, 5.0, 3) for i in range(4)], "id long, price double, size int"
    )
    # identical rows: none strictly dominated, all survive
    assert transform.pareto_frontier(eq, "price", "size").count() == 4


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),                             # exact dup of 1
        (3, base + " extra tail words here"),  # near dup of 1
        (4, "completely different content about spark shuffles and joins"),
        (5, "another unrelated document mentioning parquet footers only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_join_matches_brute_force(spark, near_dup_corpus):
    # the prefix filter must lose nothing: survivor PAIRS equal the
    # corpus-wide shingle-join brute force at the same threshold
    got = {
        (r.id_a, r.id_b)
        for r in dd.prefix_jaccard_join(
            near_dup_corpus, "text", "doc_id", k=3, threshold=0.3
        ).collect()
    }
    brute = {
        (r.id_a, r.id_b)
        for r in dd.jaccard_pairs(
            near_dup_corpus, "text", "doc_id", k=3, threshold=0.3
        ).collect()
    }
    assert got == brute
    assert (1, 2) in got and (1, 3) in got


def test_prefix_join_exact_dup_scores_one(spark, near_dup_corpus):
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.prefix_jaccard_join(
            near_dup_corpus, "text", "doc_id", k=3, threshold=0.5
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    # unrelated docs share no shingle -> never even candidates
    assert not any(4 in p or 5 in p for p in out)


def test_prefix_join_word_sets_k1(spark):
    # k=1 degrades to word-set Jaccard: same 4 words, different order
    # and multiplicity -> jaccard 1.0
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "d c b a a a"), (3, "x y z w")],
        "doc_id long, text string",
    )
    out = dd.prefix_jaccard_join(df, "text", "doc_id", k=1, threshold=0.9)
    rows = out.collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_autocorrelation_alternating_and_constant(spark):
    # type 'alt': counts alternate 1,2,1,2,... -> acf_1 = -1, acf_2 = 1
    # type 'flat': constant daily count -> zero variance -> NULL acf
    rows = []
    for d in range(8):
        day = f"2024-01-0{d + 1}"
        n = 2 if d % 2 else 1
        rows += [("alt", f"{day} 00:0{i}:00") for i in range(n)]
        rows += [("flat", f"{day} 01:00:00")]
    df = spark.createDataFrame(rows, "event_type string, ts string").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        r.event_type: r
        for r in temporal.autocorrelation(
            df, "event_type", "ts", lags=(1, 2)
        ).collect()
    }
    assert out["alt"].acf_1 == -1.0
    assert out["alt"].acf_2 == 1.0
    assert out["flat"].acf_1 is None and out["flat"].acf_2 is None


def test_autocorrelation_short_series_null(spark):
    # 2 observed days at lag 2 -> no complete pair -> NULL
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", "2024-01-02 00:00:00")],
        "event_type string, ts string",
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"))
    row = temporal.autocorrelation(
        df, "event_type", "ts", lags=(2,)
    ).collect()[0]
    assert row.acf_2 is None
