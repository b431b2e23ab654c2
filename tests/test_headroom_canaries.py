"""Headroom canaries for testdata-dependent constants (ADVICE r5 #2, #3).

Two families of queries bake in constants that are only correct while
the driver's synthetic testdata stays inside known bounds. The repo's
documented guard pattern for such assumptions is a drift canary
(tests/test_testdata_drift.py): assert the bound against EVERY testdata
generation on disk so a regeneration that breaks it fails loudly at
pytest time, never as a silent semantic change inside the driver run.

1. The dup-synthesis id offset (+10000): llmprep builds planted
   duplicates as ``doc_id + 10000`` / ``vec_id + 10000`` and selects
   sub-corpora via ``id % 10000``. If a regeneration ever emits ids
   >= 10000, twin ids collide with base ids — both engines compute
   identically (hash still matches) but the dedup semantics silently
   mix distinct rows under one id. Requires max(id) < 10000 with 2x
   headroom enforced here at the ERROR threshold, WARN at half.

2. The co-purchase pair cap (max_items_per_key=64, cap_by="id"):
   the four graph queries cap per-order fan-out at 64 parts while
   their DuckDB oracles build pairs from ALL distinct parts per
   order. The cap must never BIND on driver data (max basket 17 at
   sf0.1) or Spark silently drops pairs the oracle keeps.

Pure pyarrow/duckdb — no Spark session, runs in milliseconds.
"""

import glob
import os

import duckdb
import pytest

# llmprep's synthetic-dup id offset; see _corpus_near/_corpus_exact and
# the embedding twin builders in sparkprep/queries/llmprep.py.
DUP_ID_OFFSET = 10000
# graph queries' per-order fan-out cap; see q_triangle_count /
# q_two_hop_reach / q_assortativity / q_assoc_rules in relational_ext.py.
BASKET_CAP = 64
# q_two_hop_reach's hub guard (graph.directed_ends_capped max_degree):
# must never bind on driver data or the all-pairs oracle diverges.
# 256, not 64: the sf0.001 support->=2 graph is DENSER than sf0.01's
# (max degree 51 vs 13 — fewer orders over the same small part pool).
DEGREE_CAP = 256


def _all_sf_dirs():
    dirs = sorted(glob.glob("/root/testdata/sf*"))
    return [d for d in dirs if os.path.isdir(d)] or [
        os.environ.get("SPARKPREP_TEST_SF_DIR", "/root/testdata/sf0.001")
    ]


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_dup_offset_headroom(sfd):
    con = duckdb.connect()
    max_doc = con.execute(
        f"SELECT max(doc_id) FROM '{sfd}/documents.parquet'"
    ).fetchone()[0]
    max_vec = con.execute(
        f"SELECT max(vec_id) FROM '{sfd}/embeddings.parquet'"
    ).fetchone()[0]
    for name, mx in (("doc_id", max_doc), ("vec_id", max_vec)):
        assert mx < DUP_ID_OFFSET, (
            f"{sfd}: max({name}) = {mx} >= {DUP_ID_OFFSET} — the llmprep "
            "planted-dup twins now COLLIDE with base ids (silent semantic "
            "mix, hash still matches). Raise the offset in llmprep.py "
            "(Spark AND oracle SQL, including the `% 10000` sub-corpus "
            "selectors) before trusting any dedup/similarity query."
        )
        # early warning at the promised 2x line (sf0.1 doc_id tops out at
        # 4999 today — exactly on it), not just at the collision cliff
        assert mx <= DUP_ID_OFFSET // 2, (
            f"{sfd}: max({name}) = {mx} is within 2x of the dup-id offset "
            f"{DUP_ID_OFFSET} — raise the offset (and the `% 10000` "
            "selectors) before ids can collide."
        )


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_basket_cap_headroom(sfd):
    con = duckdb.connect()
    max_basket = con.execute(
        "SELECT max(c) FROM (SELECT count(DISTINCT l_partkey) AS c "
        f"FROM '{sfd}/lineitem.parquet' GROUP BY l_orderkey)"
    ).fetchone()[0]
    # error only when the cap would actually bind and diverge from the
    # oracle; warn (via assert message choice) well before that.
    assert max_basket < BASKET_CAP, (
        f"{sfd}: max basket size = {max_basket} >= cap {BASKET_CAP} — "
        "cooccurrence_pairs now silently drops pairs its oracles keep. "
        "Raise max_items_per_key in the relational_ext graph queries."
    )
    assert max_basket <= BASKET_CAP // 2, (
        f"{sfd}: max basket size {max_basket} is within 2x of the "
        f"fan-out cap {BASKET_CAP} — raise the cap before it binds."
    )


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_two_hop_degree_cap_headroom(sfd):
    """q_two_hop_reach's hub guard (directed_ends_capped, DEGREE_CAP=256)
    must stay a no-op on driver data: max degree of the support->=2
    co-purchase graph is 51 today (sf0.001 — the densest generation;
    sf0.01 is 13). If a regeneration pushes it past the cap, Spark
    silently drops neighbors the all-pairs oracle keeps."""
    con = duckdb.connect()
    max_deg = con.execute(
        f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
            FROM '{sfd}/lineitem.parquet'),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT coalesce(max(d), 0) FROM (
  SELECT count(*) AS d FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e
  ) GROUP BY node
)
"""
    ).fetchone()[0]
    assert max_deg <= DEGREE_CAP // 2, (
        f"{sfd}: co-purchase max degree {max_deg} is within 2x of "
        f"q_two_hop_reach's hub cap {DEGREE_CAP} — raise the cap (Spark "
        "AND re-audit the oracle) before it binds."
    )


# q_k_core's unrolled-oracle peel depth (graph.k_core max_rounds=16 and
# _k_core_sql(16, 2)): the fixed-depth CTE replay is exact only while
# the 2-core peel CONVERGES within the depth. Worst observed: 5 rounds
# (sf0.1); require <= depth/2 on every generation.
K_CORE_DEPTH = 16


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_k_core_peel_depth_headroom(sfd):
    from collections import defaultdict

    con = duckdb.connect()
    edges = con.execute(f"""
      WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey
        FROM '{sfd}/lineitem.parquet'
      )
      SELECT a.l_partkey, b.l_partkey
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    """).fetchall()
    e, rounds = set(edges), 0
    while True:
        deg = defaultdict(int)
        for u, v in e:
            deg[u] += 1
            deg[v] += 1
        e2 = {(u, v) for u, v in e if deg[u] >= 2 and deg[v] >= 2}
        if len(e2) == len(e):
            break
        e, rounds = e2, rounds + 1
    assert rounds <= K_CORE_DEPTH // 2, (
        f"{sfd}: 2-core peel needs {rounds} rounds — over half the "
        f"unrolled-oracle depth {K_CORE_DEPTH}; raise max_rounds and "
        "_k_core_sql's depth together"
    )


# q_signed_rank's single-partition window runs over the |d|
# value-frequency frame (d = per-user 2nd-half - 1st-half event-count
# diff). Its _BOUNDED_GLOBAL_WINDOW justification is data-shape-derived
# (VERDICT r6 #6): distinct |d| is 8/21/26 across today's generations.
# If a regeneration ever makes the diff column effectively continuous
# (entity-grain: one distinct |d| per user), the rank frame becomes the
# user frame and the window single-task-sorts it — fail loudly here.
SIGNED_RANK_RANK_FRAME_CAP = 1024


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_signed_rank_rank_frame_headroom(sfd):
    con = duckdb.connect()
    n_distinct, n_users = con.execute(
        f"""
WITH bounds AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS split
  FROM '{sfd}/events.parquet'
),
diffs AS (
  SELECT user_id,
         sum(CASE WHEN epoch_us(ts) >= (SELECT split FROM bounds)
                  THEN 1 ELSE 0 END)
         - sum(CASE WHEN epoch_us(ts) < (SELECT split FROM bounds)
                    THEN 1 ELSE 0 END) AS d
  FROM '{sfd}/events.parquet' GROUP BY user_id
)
SELECT count(DISTINCT abs(d)), count(*) FROM diffs WHERE d <> 0
"""
    ).fetchone()
    assert n_distinct <= SIGNED_RANK_RANK_FRAME_CAP // 2, (
        f"{sfd}: signed_rank's |d| rank frame has {n_distinct} distinct "
        f"values (of {n_users} users) — within 2x of the "
        f"{SIGNED_RANK_RANK_FRAME_CAP} boundedness cap its "
        "_BOUNDED_GLOBAL_WINDOW entry assumes. The frame is drifting "
        "toward entity grain; rebuild the rank map on "
        "ranks.global_cumsum (the distributed twin discipline) before "
        "trusting the single-partition window."
    )


# The value-domain boundedness a whole family of rank/contingency
# queries assumes: mann_whitney/kruskal_wallis/spearman/signed-rank
# doubled-rank maps, kendall_tau's |X|x|Y| grid, stump_split's split
# scan, and woe_iv's bucket frame all run windows over the quantity
# (50 distinct) and discount (11 distinct) value-frequency frames. If
# a regeneration ever makes those columns effectively continuous
# (entity-grain distinct values), every one of those "bounded" frames
# becomes the row frame and their single-partition windows melt.
VALUE_DOMAIN_CAP = 4096


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_value_domain_headroom(sfd):
    con = duckdb.connect()
    nq, nd = con.execute(
        f"""SELECT count(DISTINCT l_quantity), count(DISTINCT l_discount)
            FROM '{sfd}/lineitem.parquet'"""
    ).fetchone()
    for name, n in (("l_quantity", nq), ("l_discount", nd)):
        assert n <= VALUE_DOMAIN_CAP // 2, (
            f"{sfd}: {name} has {n} distinct values — within 2x of the "
            f"{VALUE_DOMAIN_CAP} value-domain cap the rank/contingency "
            "family (mann_whitney, kendall_tau, stump_split, woe_iv, "
            "spearman, equidepth bucket math) assumes. Rebuild their "
            "rank maps on ranks.global_cumsum (the distributed twin "
            "discipline) before trusting those windows."
        )


# repeat_purchase_curve's survival window runs over the DISTINCT
# per-user purchase-count frame (10/18/24 values across today's
# generations) — same class as signed_rank's |d| map.
PURCHASE_COUNT_FRAME_CAP = 1024


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_repeat_purchase_frame_headroom(sfd):
    con = duckdb.connect()
    n_distinct = con.execute(
        f"""SELECT count(DISTINCT c) FROM (
              SELECT user_id, count(*) AS c FROM '{sfd}/events.parquet'
              WHERE event_type = 'purchase' GROUP BY 1)"""
    ).fetchone()[0]
    assert n_distinct <= PURCHASE_COUNT_FRAME_CAP // 2, (
        f"{sfd}: repeat_purchase_curve's count frame has {n_distinct} "
        f"distinct values — within 2x of the {PURCHASE_COUNT_FRAME_CAP} "
        "cap its _BOUNDED_GLOBAL_WINDOW entry assumes. Rebuild the "
        "survival fold on ranks.global_cumsum before trusting the "
        "single-partition window."
    )


# spell_pairs' word-length cap (dedup.symspell_pairs max_word_len=30):
# words beyond the cap are DROPPED by the Spark operator while the
# brute-force oracle only length-filters at [4, 30] — both sides agree
# by construction, but if a testdata regeneration ever grew p_name
# tokens past ~15 chars the 2x headroom to the cap would be gone and
# a 31-char token would silently vanish from the Spark side of any
# future oracle that forgets the mirror filter.
SPELL_WORD_CAP = 30


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_spell_word_len_headroom(sfd):
    con = duckdb.connect()
    max_len = con.execute(
        f"""SELECT max(length(w)) FROM (
              SELECT unnest(string_split(p_name, ' ')) AS w
              FROM '{sfd}/part.parquet')"""
    ).fetchone()[0]
    assert max_len * 2 <= SPELL_WORD_CAP, (
        f"{sfd}: longest p_name token is {max_len} chars — within 2x of "
        f"symspell's {SPELL_WORD_CAP}-char cap; revisit the cap or the "
        "oracle mirror filter"
    )


# kmeans_assign's int64 distance headroom: q = Σⱼ(n·xⱼ − Sⱼ)² must stay
# far inside int64 (the operator docstring claims ~5·10¹¹ at sf0.1 vs
# 9.2·10¹⁸). Conservative bound: dims·(2·n·scale·max|x|)² with n the
# embeddings row count — assert 1000x headroom so a regeneration that
# grows the table or the value range two orders of magnitude still
# can't overflow before the canary trips.
KM_SCALE = 1000
KM_DIMS = 8


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_kmeans_int64_headroom(sfd):
    con = duckdb.connect()
    n, max_abs = con.execute(
        f"""SELECT count(*),
                   max(greatest(abs(list_min(embedding)),
                                abs(list_max(embedding))))
            FROM '{sfd}/embeddings.parquet'"""
    ).fetchone()
    worst = KM_DIMS * (2 * n * KM_SCALE * max_abs) ** 2
    assert worst * 1000 <= 2**63 - 1, (
        f"{sfd}: worst-case kmeans distance term {worst:.2e} is within "
        "1000x of int64 — switch the accumulators to DECIMAL(38,0)"
    )


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_event_calendar_pins_round8_constants(sfd):
    """group_sequential's look dates and capture_recapture's window cut
    are calendar literals (Jan 2024): both queries stay well-defined if
    the events calendar drifts (empty looks -> NULL on both engines),
    but the ANALYSES silently degenerate. Pin the assumption: every
    generation's event stream must straddle the mid-month cut and end
    inside the final look."""
    con = duckdb.connect()
    lo, hi = con.execute(
        f"SELECT min(ts), max(ts) FROM read_parquet('{sfd}/events.parquet')"
    ).fetchone()
    assert str(lo) >= "2024-01-01", f"{sfd}: events start {lo} before the look grid"
    assert str(lo) < "2024-01-16" < str(hi), f"{sfd}: mid-month cut outside data"
    assert str(hi) < "2024-01-31", f"{sfd}: events at {hi} spill past the final look"


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_order_calendar_pins_round8_periods(sfd):
    """growth_decomposition / top_movers / revenue_bridge compare 1995
    vs 1996 and pit_snapshot probes 1995-1998: both full years must
    exist in every generation's order calendar or the period panels
    silently go one-sided."""
    con = duckdb.connect()
    lo, hi = con.execute(
        f"SELECT min(o_orderdate), max(o_orderdate) FROM read_parquet('{sfd}/orders.parquet')"
    ).fetchone()
    assert str(lo) < "1995-01-02", f"{sfd}: orders start {lo} after 1995 opens"
    assert str(hi) >= "1997-01-01", f"{sfd}: orders end {hi} before 1996 closes"
    # q_pruning_sim's Morton day offsets subtract _PRUNE_DAY0 =
    # 1995-01-01: a generation whose calendar opens EARLIER would make
    # day offsets negative and silently wrap the 12-bit z-order block
    # assumption — pin the floor, not just the ceiling
    assert str(lo) >= "1995-01-01", f"{sfd}: orders open {lo} before the pruning-sim day floor"


# q_k_truss's unrolled-oracle peel depth (graph.k_truss max_rounds=8
# and _k_truss_sql(8, 3)): the fixed-depth CTE replay is exact only
# while the 3-truss edge peel CONVERGES within the depth. Worst
# observed: 1 peel round (all generations); require <= depth/2.
K_TRUSS_DEPTH = 8


@pytest.mark.parametrize("sfd", _all_sf_dirs())
def test_k_truss_peel_depth_headroom(sfd):
    from collections import defaultdict

    con = duckdb.connect()
    edges = con.execute(f"""
      WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey
        FROM '{sfd}/lineitem.parquet'
      )
      SELECT a.l_partkey, b.l_partkey
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    """).fetchall()
    e, rounds = set(edges), 0
    while True:
        nbr = defaultdict(set)
        for u, v in e:
            nbr[u].add(v)
            nbr[v].add(u)
        e2 = {(u, v) for u, v in e if len(nbr[u] & nbr[v]) >= 1}
        if len(e2) == len(e):
            break
        e, rounds = e2, rounds + 1
    assert rounds <= K_TRUSS_DEPTH // 2, (
        f"{sfd}: 3-truss peel needs {rounds} rounds — over half the "
        f"unrolled-oracle depth {K_TRUSS_DEPTH}; raise max_rounds and "
        "_k_truss_sql's depth together"
    )
