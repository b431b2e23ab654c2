"""char-entropy + grouped-split semantics the oracle can't see."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkprep.operators import mix
from sparkprep.operators import text as tx


def _expected_entropy(s: str) -> float:
    s = s.lower()[:1000]
    classes = [chr(o) for o in range(ord("a"), ord("z") + 1)] + [" "]
    counts = [s.count(ch) for ch in classes]
    digits = sum(1 for ch in s if ch.isdigit())
    other = len(s) - sum(counts) - digits
    n = len(s)
    h = 0.0
    for c in counts + [digits, other]:
        if c > 0:
            h -= (c / n) * math.log2(c / n)
    return round(h, 4)


class TestCharEntropy:
    def test_known_values(self, spark):
        rows = [
            Row(i=0, t="the quick brown fox jumps over the lazy dog"),
            Row(i=1, t="aaaaaaaaaaaaaaa"),              # single class -> 0.0
            Row(i=2, t="a1b2c3 d4e5!@#"),
            Row(i=3, t=""),                             # empty -> NULL
            Row(i=4, t=None),                           # null -> NULL
        ]
        df = tx.add_char_entropy(spark.createDataFrame(rows), "t")
        got = {r["i"]: r["char_entropy"] for r in df.collect()}
        assert got[0] == pytest.approx(_expected_entropy(rows[0].t), abs=1e-4)
        assert got[1] == 0.0  # positive zero, not -0.0
        assert str(got[1]) == "0.0"
        assert got[2] == pytest.approx(_expected_entropy(rows[2].t), abs=1e-4)
        assert got[3] is None
        assert got[4] is None

    def test_gibberish_scores_above_english_and_repetition_below(self, spark):
        import random

        rng = random.Random(3)
        noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(800))
        english = (
            "it was the best of times it was the worst of times it was the "
            "age of wisdom it was the age of foolishness it was the epoch "
            "of belief it was the epoch of incredulity " * 5
        )
        rep = "spam ham " * 100
        df = tx.add_char_entropy(
            spark.createDataFrame(
                [Row(i=0, t=noise), Row(i=1, t=english), Row(i=2, t=rep)]
            ),
            "t",
        )
        got = {r["i"]: r["char_entropy"] for r in df.collect()}
        assert got[0] > got[1] > got[2]
        assert got[0] > 4.5  # uniform 26-letter noise ~ log2(26) = 4.70

    def test_prefix_clamps_cost(self, spark):
        # identical 1000-char prefixes -> identical entropy regardless of tail
        a = "abc " * 250 + "z" * 100000
        b = "abc " * 250
        df = tx.add_char_entropy(
            spark.createDataFrame([Row(i=0, t=a), Row(i=1, t=b)]), "t"
        )
        got = {r["i"]: r["char_entropy"] for r in df.collect()}
        assert got[0] == got[1]

    def test_map_only_plan(self, spark):
        df = tx.add_char_entropy(
            spark.createDataFrame([Row(t="hello world")] * 10), "t"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestGroupedSplit:
    def _docs(self, spark, n_groups=40, per=25):
        rows = [
            Row(doc_id=g * 1000 + i, src=f"domain-{g}")
            for g in range(n_groups)
            for i in range(per)
        ]
        return spark.createDataFrame(rows)

    def test_groups_are_atomic(self, spark):
        out = mix.grouped_split(
            self._docs(spark), "src", {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        per_group = (
            out.groupBy("src")
            .agg(F.count_distinct("split").alias("k"))
            .agg(F.max("k"))
            .collect()[0][0]
        )
        assert per_group == 1

    def test_deterministic_and_salt_sensitive(self, spark):
        docs = self._docs(spark)
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = sorted((r.doc_id, r.split) for r in mix.grouped_split(docs, "src", fr).collect())
        b = sorted((r.doc_id, r.split) for r in mix.grouped_split(docs, "src", fr).collect())
        assert a == b
        c = sorted(
            (r.doc_id, r.split)
            for r in mix.grouped_split(docs, "src", fr, salt="other").collect()
        )
        assert a != c  # a re-deal moves at least one group

    def test_fractions_roughly_honored_at_group_level(self, spark):
        # 400 groups: group-count shares should land near the fractions
        out = mix.grouped_split(
            self._docs(spark, n_groups=400, per=2),
            "src",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        )
        shares = {
            r["split"]: r["n"]
            for r in out.select("src", "split")
            .distinct()
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert shares["train"] / 400 == pytest.approx(0.8, abs=0.07)
        assert shares.get("val", 0) / 400 == pytest.approx(0.1, abs=0.05)
        assert shares.get("test", 0) / 400 == pytest.approx(0.1, abs=0.05)

    def test_bad_fractions_raise(self, spark):
        with pytest.raises(ValueError):
            mix.grouped_split(self._docs(spark), "src", {"a": 0.5, "b": 0.4})

    def test_map_only_plan(self, spark):
        out = mix.grouped_split(
            self._docs(spark), "src", {"train": 0.9, "test": 0.1}
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestGroupedKfold:
    def test_folds_atomic_and_covering(self, spark):
        rows = [
            Row(doc_id=g * 100 + i, src=f"d{g}") for g in range(100) for i in range(5)
        ]
        out = mix.grouped_kfold(spark.createDataFrame(rows), "src", k=5)
        per_group = (
            out.groupBy("src")
            .agg(F.count_distinct("fold").alias("kk"))
            .agg(F.max("kk"))
            .collect()[0][0]
        )
        assert per_group == 1  # a group never straddles folds
        folds = {r["fold"] for r in out.select("fold").distinct().collect()}
        assert folds == set(range(5))  # 100 groups cover all 5 folds
        assert all(0 <= f <= 4 for f in folds)

    def test_k_validation(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, src="a")])
        import pytest as _pt

        with _pt.raises(ValueError):
            mix.grouped_kfold(df, "src", k=1)

    def test_null_group_gets_deterministic_fold_and_split(self, spark):
        """NULL group keys must land SOMEWHERE deterministic — a NULL
        fold/split silently drops those rows from both sides of every
        train/val filter."""
        df = spark.createDataFrame(
            [Row(doc_id=1, src=None), Row(doc_id=2, src="a")]
        )
        folds = {r.doc_id: r.fold for r in mix.grouped_kfold(df, "src", k=5).collect()}
        assert folds[1] is not None and 0 <= folds[1] <= 4
        splits = {
            r.doc_id: r.split
            for r in mix.grouped_split(df, "src", {"a": 0.5, "b": 0.5}).collect()
        }
        assert splits[1] in {"a", "b"}


def test_mutual_information_identical_and_independent(spark):
    import math

    from sparkprep.operators import profile

    # identical columns: MI == H(a) == H(b), NMI == 1
    rows = [("a", "a")] * 2 + [("b", "b")] * 2
    df = spark.createDataFrame(rows, ["x", "y"])
    r = profile.mutual_information(df, "x", "y").collect()[0]
    assert abs(r.mi - round(math.log(2), 4)) <= 1e-4
    assert r.h_a == r.h_b == r.mi
    assert abs(r.nmi - 1.0) <= 1e-4

    # independent columns (uniform 2x2): MI == 0, entropies ln 2
    rows = [("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")]
    df2 = spark.createDataFrame(rows, ["x", "y"])
    r2 = profile.mutual_information(df2, "x", "y").collect()[0]
    assert abs(r2.mi) <= 1e-4
    assert abs(r2.nmi) <= 1e-4
    assert abs(r2.h_a - round(math.log(2), 4)) <= 1e-4

    # constant column: zero entropy -> NMI NULL, not a divide error
    rows = [("a", "u"), ("a", "v")]
    r3 = profile.mutual_information(
        spark.createDataFrame(rows, ["x", "y"]), "x", "y"
    ).collect()[0]
    assert r3.mi == 0.0 and r3.nmi is None
