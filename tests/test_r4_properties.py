"""Property-based invariants for the round-4 operators: preference
pairing, chat assembly, BPE encode round-trip. Example counts stay low
(every example is a Spark job); lists batch into one DataFrame each."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkprep.operators import bpe, mix
from sparkprep.operators import text as tx

_scores = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=25
)


@settings(max_examples=15, deadline=None)
@given(_scores, _scores)
def test_preference_pairs_invariants(spark, xs, ys):
    rows = [("a", i, s) for i, s in enumerate(xs)] + [
        ("b", 1000 + i, s) for i, s in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, ["grp", "id", "score"])
    pairs = mix.preference_pairs(df, ["grp"], "score", "id").collect()
    # pair count per group = floor(n/2); no id reused; margins >= 0
    by_grp = {}
    used = []
    for r in pairs:
        by_grp[r.grp] = by_grp.get(r.grp, 0) + 1
        used += [r.chosen_id, r.rejected_id]
        assert r.margin >= 0
    assert by_grp.get("a", 0) == len(xs) // 2
    assert by_grp.get("b", 0) == len(ys) // 2
    assert len(used) == len(set(used))


_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_words, min_size=1, max_size=5))
def test_bpe_encode_round_trip(spark, docs):
    # joining a word's BPE tokens and stripping the end marker must
    # reconstruct the original word stream for ANY merge list learned
    # from the same corpus (merges only ever concatenate adjacent
    # symbols — lossless by construction)
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe.bpe_train(bpe.word_vocab(df, "text"), num_merges=5,
                           min_count=2)
    enc = bpe.bpe_encode(df, "text", "doc_id", merges).collect()
    got = {r.doc_id: list(r.bpe_tokens) for r in enc}
    for i, ws in enumerate(docs):
        rebuilt = (
            "".join(got[i]).replace(bpe.END_OF_WORD, " ").strip().split(" ")
        )
        assert rebuilt == ws


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="xyz|", min_size=0, max_size=5),
                min_size=1, max_size=8))
def test_chat_assemble_turn_count_and_length(spark, msgs):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("conv", LongType()),
        StructField("pos", LongType()),
        StructField("msg", StringType()),
    ])
    df = spark.createDataFrame(
        [(1, i, m) for i, m in enumerate(msgs)], schema
    )
    out = tx.chat_assemble(df, "conv", ["pos"], "msg").collect()[0]
    assert out.n_turns == len(msgs)
    # every turn marker present exactly once per message, in order
    assert out.conversation.count("<|user|>") == (len(msgs) + 1) // 2
    assert out.conversation.count("<|assistant|>") == len(msgs) // 2
    assert out.conversation.split("\n")[0].endswith(msgs[0])
