"""Round-3 operator semantics the oracles can't see: blocklist edge
cases and plan shape, tokenizer fertility hand math, quantile
normalization interpolation, covariance numpy parity (exact + Arrow),
PCA fit/projection parity."""

from pyspark.sql import functions as F

from sparkprep.operators import text as tx


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "Bad word bad WORD fine ok"),   # 'bad'x2 + 'word'x2 of 6
            (2, "totally clean text here"),      # zero hits
            (3, ""),                             # empty doc
        ],
        ["doc_id", "text"],
    )


def test_blocklist_counts_and_case_fold(spark):
    out = {
        r.doc_id: r
        for r in tx.blocklist_hits(
            _df(spark), "text", "doc_id", ["BAD", "word"], rate_threshold=0.5
        ).collect()
    }
    assert (out[1].n_hits, out[1].n_terms, out[1].n_tokens) == (4, 2, 6)
    assert out[1].hit_rate == round(4 / 6, 4)
    assert out[1].flagged is True
    # zero-hit doc survives the join-back with zeros, not NULLs
    assert (out[2].n_hits, out[2].n_terms) == (0, 0)
    assert out[2].hit_rate == 0.0
    assert out[2].flagged is False
    # empty doc: no tokens -> NULL rate (try_divide), never a /0 error
    assert out[3].n_tokens == 0
    assert out[3].hit_rate is None
    assert out[3].flagged is False


def test_blocklist_term_list_broadcasts(spark):
    plan = tx.blocklist_hits(
        _df(spark), "text", "doc_id", ["bad"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_token_fertility_hand_math(spark):
    df = spark.createDataFrame(
        [
            ("en", "hello world"),            # 2 words, 2 bpe tokens, 11 chars
            ("en", "it's x2!"),               # 2 words, 6 bpe tokens (it ' s x 2 !), 8 chars
            ("zz", ""),                       # empty group -> NULL ratios
        ],
        ["lang", "text"],
    )
    out = {r.lang: r for r in tx.token_fertility(df, "text", "lang").collect()}
    assert out["en"].n_docs == 2 and out["en"].n_tokens == 8
    assert out["en"].fertility == round(8 / 4, 4)
    assert out["en"].chars_per_token == round(19 / 8, 4)
    assert out["zz"].fertility is None and out["zz"].chars_per_token is None


def test_quantile_normalize_hand_math(spark):
    from sparkprep.functions import numeric

    rows = (
        [(i, "ref", float(v)) for i, v in enumerate([0, 10, 20, 30])]
        + [(10, "b", 100.0), (11, "b", 500.0), (12, "b", 200.0)]
        + [(20, "solo", 77.0), (21, "nul", None)]
    )
    df = spark.createDataFrame(rows, ["event_id", "grp", "value"])
    out = {
        r.event_id: r.qnorm
        for r in numeric.quantile_normalize(
            df, "value", "grp", "event_id", ref_group="ref"
        ).collect()
    }
    # b ranks [100, 200, 500] -> p in {0, .5, 1} -> pos {0, 1.5, 3}
    assert out[10] == 0.0
    assert out[12] == 15.0  # interpolated between ref[1]=10 and ref[2]=20
    assert out[11] == 30.0
    # the reference group maps onto itself exactly
    assert [out[i] for i in range(4)] == [0.0, 10.0, 20.0, 30.0]
    # a single-member group pins to the reference minimum, no /0
    assert out[20] == 0.0
    # NULL values are excluded, not ranked (engines order NULLs differently)
    assert 21 not in out


def test_embedding_covariance_numpy_parity(spark):
    import numpy as np
    from sparkprep.operators import similarity as sim

    rng = np.random.RandomState(7)
    X = rng.randn(40, 5).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        ["vec_id", "embedding"],
    )
    out = sim.embedding_covariance(df, "embedding", dim=5).collect()
    assert len(out) == 5 * 6 // 2
    C = np.cov(X, rowvar=False)  # sample covariance, ddof=1
    for r in out:
        assert abs(r.cov - C[r.i][r.j]) < 1e-6, (r.i, r.j, r.cov, C[r.i][r.j])


def test_embedding_covariance_single_vector_null(spark):
    from sparkprep.operators import similarity as sim

    df = spark.createDataFrame([(0, [1.0, 2.0])], ["vec_id", "embedding"])
    rows = sim.embedding_covariance(df, "embedding", dim=2).collect()
    assert all(r.cov is None for r in rows)  # n-1 = 0 -> NULL, not a crash


def test_embedding_covariance_arrow_matches_exact(spark):
    """The Arrow X^T X fast path reconciles with the decimal-exact
    operator at 1e-9 — float64 batch sums are order-dependent at
    ~1e-12, which the 1e-6 rounding absorbs."""
    import numpy as np
    from sparkprep.operators import similarity as sim

    rng = np.random.RandomState(11)
    X = rng.randn(60, 6).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        ["vec_id", "embedding"],
    ).repartition(4)
    exact = {
        (r.i, r.j): r.cov
        for r in sim.embedding_covariance(df, "embedding", dim=6).collect()
    }
    fast = {
        (r.i, r.j): r.cov
        for r in sim.embedding_covariance_arrow(df, "embedding", dim=6).collect()
    }
    assert set(fast) == set(exact) and len(fast) == 21
    for key, v in fast.items():
        assert abs(v - exact[key]) <= 1e-9, (key, v, exact[key])


def test_pca_fit_project_numpy_parity(spark):
    import numpy as np
    from sparkprep.operators import similarity as sim

    rng = np.random.RandomState(3)
    # anisotropic cloud so components are well-separated (no eigenvalue ties)
    X = (rng.randn(80, 4) * np.array([5.0, 2.0, 0.5, 0.1])).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        ["vec_id", "embedding"],
    )
    mean, comps = sim.fit_pca(df, "embedding", dim=4, n_components=2)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    # components orthonormal and matching numpy's eigh up to the pinned sign
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)
    C = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(C)
    for k, idx in enumerate(np.argsort(vals)[::-1][:2]):
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        assert np.allclose(comps[k], v, atol=1e-6), k
    out = {
        r.vec_id: (r.c0, r.c1)
        for r in sim.pca_project(df, "embedding", "vec_id", mean, comps).collect()
    }
    expected = (X - X.mean(axis=0)) @ comps.T
    for i in range(len(X)):
        assert abs(out[i][0] - round(expected[i, 0], 4)) <= 1e-3
        assert abs(out[i][1] - round(expected[i, 1], 4)) <= 1e-3


def test_fd_audit_null_semantics(spark):
    from sparkprep.operators import profile

    df = spark.createDataFrame(
        [
            (1, "x", 10),
            (1, "x", 10),      # same determinant, same dependent: fine
            (2, "y", 20),
            (2, "z", 20),      # a=2 maps to y AND z: violation
            (None, "q", 30),   # NULL determinant: excluded entirely
            (3, None, 40),     # NULL dependent counts as a value
            (3, "w", 40),      # ...so a=3 maps to {NULL, w}: violation
        ],
        ["a", "b", "c"],
    )
    out = {r.dependency: r for r in profile.fd_audit(df, [("a", "b"), ("a", "c")]).collect()}
    ab = out["a->b"]
    assert (ab.n_groups, ab.n_violating, ab.holds) == (3, 2, False)
    ac = out["a->c"]
    assert (ac.n_groups, ac.n_violating, ac.holds) == (3, 0, True)


def test_ks_cohorts_hand_math(spark):
    from pyspark.sql import functions as F
    from sparkprep.operators import expect

    # before: 4 rows in bin0, 4 in bin1; after: 8 rows all in bin1
    rows = [(0, float(v)) for v in [1, 2, 3, 4, 11, 12, 13, 14]] + [
        (1, float(v)) for v in [11, 12, 13, 14, 15, 16, 17, 18]
    ]
    df = spark.createDataFrame(rows, ["grp", "x"])
    out = expect.ks_cohorts(
        df, F.col("grp") == 1, "x", [0.0, 10.0, 20.0]
    ).collect()[0]
    # CDF gap at bin0: |4/8 - 0/8| = 0.5; at bin1: |1 - 1| = 0
    assert (out.n_before, out.n_after, out.ks_stat) == (8, 8, 0.5)
    same = expect.ks_cohorts(
        df.withColumn("grp", F.col("x") % 2), F.col("grp") == 1, "x",
        [0.0, 10.0, 20.0],
    ).collect()[0]
    assert same.ks_stat <= 0.25  # near-exchangeable split stays small


def test_did_report_hand_math(spark):
    from sparkprep.operators import features

    rows = (
        [(True, False, 10.0), (True, False, 12.0)]    # treated before: 11
        + [(True, True, 20.0), (True, True, 24.0)]    # treated after: 22
        + [(False, False, 5.0), (False, False, 7.0)]  # control before: 6
        + [(False, True, 8.0), (False, True, 10.0)]   # control after: 9
        + [(None, True, 99.0), (True, None, 99.0)]    # excluded
    )
    df = spark.createDataFrame(rows, ["arm", "period", "v"])
    out = features.did_report(df, "arm", "period", "v").collect()[0]
    assert (out.n_treated, out.n_control) == (4, 4)
    assert (out.treated_before, out.treated_after) == (11.0, 22.0)
    assert (out.control_before, out.control_after) == (6.0, 9.0)
    assert out.did_effect == (22.0 - 11.0) - (9.0 - 6.0)  # 8.0


def test_did_report_empty_cell_null(spark):
    from sparkprep.operators import features

    df = spark.createDataFrame(
        [(True, True, 1.0), (False, False, 2.0)], ["arm", "period", "v"]
    )
    out = features.did_report(df, "arm", "period", "v").collect()[0]
    assert out.treated_before is None and out.did_effect is None
    # counts must NOT null out when only one cell of an arm is empty:
    # each cell coalesces to 0 before the sum
    assert (out.n_treated, out.n_control) == (1, 1)


def test_pseudonym_joinability_and_rotation(spark):
    from sparkprep.operators import privacy

    df = spark.createDataFrame([(1,), (2,), (None,)], ["user_id"])
    a = {r.user_id: r.t for r in df.select(
        "user_id", privacy.pseudonym("user_id", "s1").alias("t")).collect()}
    b = {r.user_id: r.t for r in df.select(
        "user_id", privacy.pseudonym("user_id", "s1").alias("t")).collect()}
    assert a[1] == b[1] and a[2] == b[2]          # deterministic: joins survive
    assert a[None] is None                         # NULL key -> NULL token
    rot = {r.user_id: r.t for r in df.select(
        "user_id", privacy.pseudonym("user_id", "s2").alias("t")).collect()}
    assert rot[1] != a[1]                          # salt rotation re-keys
    audit = privacy.pseudonym_audit(df, "user_id", "s1").collect()[0]
    assert (audit.n_keys, audit.n_tokens, audit.collisions) == (2, 2, 0)
