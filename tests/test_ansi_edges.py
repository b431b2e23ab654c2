"""ANSI-mode degenerate-input hardening: empty text, zero-norm
embeddings, and empty tables must produce NULL/failed results, never a
DIVIDE_BY_ZERO that kills a corpus-wide job (Spark 4 default is ANSI)."""

from pyspark.sql import Row

from sparkprep.operators import profile, similarity as sim, text as tx


def test_empty_text_ratios_are_null_not_crash(spark):
    df = spark.createDataFrame([Row(t=""), Row(t=None), Row(t="hi the and")])
    rows = df.select(
        tx.avg_word_len("t").alias("awl"),
        tx.stopword_ratio("t", tx.EN_STOPWORDS).alias("sw"),
        tx.non_alpha_ratio("t").alias("na"),
        tx.quality_score("t").alias("q"),
    ).collect()
    empty, null, real = rows
    assert (empty.awl, empty.sw, empty.na, empty.q) == (None, None, None, None)
    assert (null.awl, null.sw, null.na, null.q) == (None, None, None, None)
    assert real.awl is not None and real.q is not None


def test_zero_norm_embedding_is_null_cosine_not_crash(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 0.0]),  # the poison row
            Row(vec_id=2, embedding=[0.5, 0.5]),
        ]
    )
    q = emb.filter("vec_id = 0")
    out = {r.neighbor_id: r.cosine for r in sim.cosine_topk_native(emb, q, k=5).collect()}
    assert out[2] is not None
    assert out[1] is None  # zero vector: undefined cosine, ranked last
    # near-dup bucketing survives and never pairs the zero vector
    pairs = sim.embedding_near_dup_pairs(
        emb, threshold=0.5, num_planes=2, dim=2
    ).collect()
    assert all(1 not in (r.id_a, r.id_b) for r in pairs)


def test_null_census_on_empty_table(spark):
    df = spark.createDataFrame([], "a double, b string")
    rows = profile.null_census_long(df).collect()
    assert {r["column"] for r in rows} == {"a", "b"}
    for r in rows:
        assert r["null_count"] == 0
        assert r["null_frac"] is None
