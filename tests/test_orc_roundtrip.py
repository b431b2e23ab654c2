"""ORC source/sink roundtrip: content-exact write/readback including the
embedding array column and events timestamps, plus predicate pushdown
reaching the ORC scan (the reason to use a columnar format at all)."""

import os

from pyspark.sql import functions as F

from sparkprep.sources.readers import read_orc
from sparkprep.sources.writers import write_orc


def _digest(df, cols):
    return (
        df.select(F.md5(F.concat_ws("\x01", *cols)).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
        .collect()[0][0]
    )


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = str(tmp_path / "docs_orc")
    write_orc(docs.repartition(3), out)
    back = read_orc(spark, out)
    assert back.count() == docs.count()
    assert dict(back.dtypes) == dict(docs.dtypes)
    cols = ["doc_id", "text", "lang", "source"]
    assert _digest(back, cols) == _digest(docs, cols)


def test_orc_array_and_timestamp_columns(spark, sf_dir, tmp_path):
    from sparkprep.queries import t

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = str(tmp_path / "emb_orc")
    write_orc(emb, out)
    back = read_orc(spark, out)
    assert dict(back.dtypes)["embedding"] == "array<float>"
    s = lambda df: df.agg(
        F.round(F.sum(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double"))), 4)
    ).collect()[0][0]
    assert s(back) == s(emb)

    ev = t(spark, sf_dir, "events").limit(200)
    out2 = str(tmp_path / "ev_orc")
    write_orc(ev, out2)
    back2 = read_orc(spark, out2)
    assert dict(back2.dtypes)["ts"] == "timestamp"
    a = ev.agg(F.sum(F.unix_micros("ts"))).collect()[0][0]
    b = back2.agg(F.sum(F.unix_micros("ts"))).collect()[0][0]
    assert a == b


def test_orc_predicate_pushdown_in_plan(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = str(tmp_path / "push_orc")
    write_orc(docs, out)
    plan = (
        read_orc(spark, out)
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "doc_id" in plan.split("PushedFilters")[1][:80]
    assert "ReadSchema" not in plan or "text" not in plan.split("ReadSchema")[1][:200]
