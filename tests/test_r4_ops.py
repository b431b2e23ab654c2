"""Round-4 operator semantics the sf0.01 oracle can't see:
preference-pair construction edges, chat assembly ordering/null
handling, matryoshka truncation identities."""

import pytest
from pyspark.sql import functions as F


class TestPreferencePairs:
    def test_best_worst_pairing_and_odd_middle_sits_out(self, spark):
        from sparkprep.operators import mix

        # one group of 5: scores 50,40,30,20,10 -> pairs (50,10),(40,20);
        # the middle row (30) must appear in NO pair
        rows = [("g", i, s) for i, s in enumerate([50, 40, 30, 20, 10])]
        df = spark.createDataFrame(rows, ["grp", "id", "score"])
        got = sorted(
            (r.chosen_id, r.rejected_id, r.margin)
            for r in mix.preference_pairs(df, ["grp"], "score", "id").collect()
        )
        assert got == [(0, 4, 40), (1, 3, 20)]

    def test_no_row_appears_twice_and_margin_nonnegative(self, spark):
        from sparkprep.operators import mix

        rows = [("a", i, (i * 37) % 11) for i in range(8)] + [
            ("b", 100 + i, i) for i in range(3)
        ]
        df = spark.createDataFrame(rows, ["grp", "id", "score"])
        pairs = mix.preference_pairs(df, ["grp"], "score", "id").collect()
        used = [r.chosen_id for r in pairs] + [r.rejected_id for r in pairs]
        assert len(used) == len(set(used))
        assert all(r.margin >= 0 for r in pairs)
        # group sizes 8 and 3 -> 4 + 1 pairs
        assert len(pairs) == 5

    def test_null_group_key_pairs_with_itself(self, spark):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from sparkprep.operators import mix

        schema = StructType([
            StructField("grp", StringType()),
            StructField("id", LongType()),
            StructField("score", LongType()),
        ])
        df = spark.createDataFrame(
            [(None, 1, 10), (None, 2, 5)], schema
        )
        pairs = mix.preference_pairs(df, ["grp"], "score", "id").collect()
        assert [(r.chosen_id, r.rejected_id) for r in pairs] == [(1, 2)]

    def test_singleton_group_yields_no_pairs(self, spark):
        from sparkprep.operators import mix

        df = spark.createDataFrame([("g", 1, 10)], ["grp", "id", "score"])
        assert mix.preference_pairs(df, ["grp"], "score", "id").count() == 0


class TestChatAssemble:
    def test_order_roles_and_template(self, spark):
        from sparkprep.operators import text as tx

        # rows deliberately out of order: assembly must sort by (pos)
        rows = [(1, 2, "third"), (1, 0, "first"), (1, 1, "second")]
        df = spark.createDataFrame(rows, ["conv", "pos", "msg"])
        out = tx.chat_assemble(df, "conv", ["pos"], "msg").collect()[0]
        assert out.n_turns == 3
        assert out.conversation == (
            "<|user|>first\n<|assistant|>second\n<|user|>third"
        )

    def test_null_message_renders_empty_not_dropped(self, spark):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        from sparkprep.operators import text as tx

        schema = StructType([
            StructField("conv", LongType()),
            StructField("pos", LongType()),
            StructField("msg", StringType()),
        ])
        df = spark.createDataFrame([(1, 0, "hi"), (1, 1, None)], schema)
        out = tx.chat_assemble(df, "conv", ["pos"], "msg").collect()[0]
        # a NULL message must keep its turn marker (array_join would
        # silently drop a NULL element, losing the role alternation)
        assert out.n_turns == 2
        assert out.conversation == "<|user|>hi\n<|assistant|>"

    def test_tiebreak_on_second_order_col(self, spark):
        from sparkprep.operators import text as tx

        rows = [(1, 0, 5, "b"), (1, 0, 2, "a")]
        df = spark.createDataFrame(rows, ["conv", "pos", "seq", "msg"])
        out = tx.chat_assemble(df, "conv", ["pos", "seq"], "msg").collect()[0]
        assert out.conversation == "<|user|>a\n<|assistant|>b"


class TestMatryoshka:
    def test_energy_identity_and_bounds(self, spark):
        from sparkprep.operators import quantize

        df = spark.createDataFrame(
            [(1, [3.0, 4.0, 0.0, 0.0]), (2, [1.0, 1.0, 1.0, 1.0])],
            ["vec_id", "embedding"],
        )
        out = {
            r.vec_id: r
            for r in quantize.matryoshka_stats(df, "embedding", k=2).collect()
        }
        # vec 1: all energy in first 2 dims
        assert out[1].energy_k == pytest.approx(1.0)
        assert out[1].norm_k == pytest.approx(5.0)
        assert out[1].cos_trunc == pytest.approx(1.0)
        # vec 2: half the energy, cos = sqrt(1/2)
        assert out[2].energy_k == pytest.approx(0.5)
        assert out[2].cos_trunc == pytest.approx(0.5 ** 0.5)

    def test_zero_vector_yields_null_ratios(self, spark):
        from sparkprep.operators import quantize

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0])], ["vec_id", "embedding"]
        )
        r = quantize.matryoshka_stats(df, "embedding", k=2).collect()[0]
        assert r.energy_k is None and r.cos_trunc is None
        assert r.norm_k == 0.0

    def test_cos_equals_norm_ratio_on_real_embeddings(self, spark, sf_dir):
        from sparkprep.operators import quantize
        from sparkprep.queries import t

        emb = t(spark, sf_dir, "embeddings")
        stats = quantize.matryoshka_stats(emb, "embedding", k=16)
        # analytic identity: cos(full, padded-truncation) == norm_k/norm_full,
        # and energy_k == cos_trunc^2
        bad = stats.filter(
            F.abs(F.col("energy_k") - F.col("cos_trunc") * F.col("cos_trunc"))
            > 1e-9
        ).count()
        assert bad == 0


class TestTokenJs:
    def test_identical_slices_zero_disjoint_ln2(self, spark):
        import math

        from sparkprep.operators import text as tx

        # identical distributions -> JS 0
        same = spark.createDataFrame(
            [(True, "a b c"), (False, "a b c")], ["side", "text"]
        )
        r = tx.token_js_divergence(same, "text", F.col("side")).collect()[0]
        assert r.js == 0.0
        assert (r.vocab_a, r.vocab_b, r.vocab_shared) == (3, 3, 3)
        # disjoint vocabularies -> JS = ln 2
        disj = spark.createDataFrame(
            [(True, "a b"), (False, "x y")], ["side", "text"]
        )
        r = tx.token_js_divergence(disj, "text", F.col("side")).collect()[0]
        assert r.js == pytest.approx(math.log(2), abs=1e-3)
        assert r.vocab_shared == 0

    def test_empty_cohort_yields_null_not_error(self, spark):
        from sparkprep.operators import text as tx

        df = spark.createDataFrame([(True, "a b")], ["side", "text"])
        r = tx.token_js_divergence(df, "text", F.col("side")).collect()[0]
        # the other side has no mass: terms are NULL, not a
        # DIVIDE_BY_ZERO crash (ANSI mode)
        assert r.js is None
        assert (r.vocab_a, r.vocab_b) == (2, 0)


class TestClusterSplit:
    def test_near_dups_never_straddle_splits(self, spark, sf_dir):
        from sparkprep.queries.llmprep import q_cluster_split

        out = q_cluster_split(spark, sf_dir).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r.cluster_rep, set()).add(r.split)
        # group atomicity: every cluster lands in exactly one split
        assert all(len(s) == 1 for s in by_cluster.values())
        # every pair the LSH pass actually clustered shares a split BY
        # CONSTRUCTION (atomicity above); end-to-end, the planted
        # (doc, mutant) near-dups should mostly be caught and co-split
        # (threshold 0.8 legitimately misses some short docs — the
        # recall trade-off minhash_eval quantifies)
        cluster_of = {r.doc_id: r.cluster_rep for r in out}
        split_of = {r.doc_id: r.split for r in out}
        planted = [d for d in split_of if d + 10000 in split_of]
        assert planted
        caught = [d for d in planted if cluster_of[d] == cluster_of[d + 10000]]
        assert len(caught) > len(planted) / 2
        assert all(split_of[d] == split_of[d + 10000] for d in caught)
        # all three splits are populated at this corpus size
        assert {r.split for r in out} == {"train", "val", "test"}
