"""blocklist_hits semantics the oracle can't see: case folding,
zero-hit survival, empty-doc NULL rate, broadcast plan shape."""

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
