"""Property tests for the Gopher quality gate: signal bounds and the
pass ⇔ rule-conjunction identity on adversarial generated text."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkprep.operators.text import EN_STOPWORDS, gopher_quality_flags

TEXT = st.lists(
    st.sampled_from(
        ["the", "of", "and", "...", "#", "-", "*", "•", "…",
         "abc", "XY.Z", "12", "word...", "- item", "\n", "\t", ""]
    ),
    max_size=120,
).map(" ".join)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_gopher_signal_bounds_and_conjunction(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = gopher_quality_flags(
        df, "text", required_stopwords=EN_STOPWORDS
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert r["n_words"] >= 0
        for ratio in ("bullet_ratio", "ellipsis_ratio"):
            assert 0.0 <= r[ratio] <= 1.0
        if r["n_words"] > 0:
            assert 0.0 <= r["alpha_ratio"] <= 1.0
            assert r["symbol_ratio"] >= 0.0
            assert r["mean_word_len"] > 0.0
        else:
            assert r["mean_word_len"] is None
        assert 0 <= r["stop_hits"] <= len(EN_STOPWORDS)
        expected = (
            r["n_words"] is not None
            and 50 <= r["n_words"] <= 100_000
            and r["mean_word_len"] is not None
            and 3 <= r["mean_word_len"] <= 10
            and r["symbol_ratio"] is not None
            and r["symbol_ratio"] <= 0.1
            and r["bullet_ratio"] <= 0.9
            and r["ellipsis_ratio"] <= 0.3
            and r["alpha_ratio"] is not None
            and r["alpha_ratio"] >= 0.8
            and r["stop_hits"] >= 2
        )
        assert r["pass"] is expected, r
