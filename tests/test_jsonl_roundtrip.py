"""JSONL source/sink roundtrip — the LLM-corpus interchange format:
content-exact write/readback, shard count = partitioning, explicit
schema-on-read, and malformed-line accounting."""

import glob
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sparkprep.sources.readers import read_jsonl
from sparkprep.sources.writers import write_jsonl

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def test_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text", "lang")
        .repartition(3)
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, compression=None)
    back = read_jsonl(spark, out, schema=DOC_SCHEMA)
    assert back.count() == docs.count()
    digest = lambda df: (
        df.select(F.md5(F.concat_ws("\x01", "doc_id", "text", "lang")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
        .collect()[0][0]
    )
    assert digest(back) == digest(docs)
    # shard layout = writer partitioning
    assert len(glob.glob(os.path.join(out, "part-*"))) == 3


def test_jsonl_gzip_shards(spark, tmp_path):
    df = spark.range(100).select(F.col("id").alias("doc_id")).repartition(2)
    out = str(tmp_path / "gz")
    write_jsonl(df, out)  # gzip default
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 2 and all(p.endswith(".gz") for p in parts)


def test_jsonl_malformed_line_accounting(spark, tmp_path):
    p = tmp_path / "corrupt.jsonl"
    p.write_text(
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"})
        + "\n{not json at all\n"
        + json.dumps({"doc_id": 2, "text": "also ok", "lang": "en"})
        + "\n"
    )
    schema = DOC_SCHEMA.add(StructField("_corrupt_record", StringType()))
    back = read_jsonl(spark, str(p), schema=schema).cache()
    try:
        assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 1
        assert back.filter(F.col("_corrupt_record").isNull()).count() == 2
    finally:
        back.unpersist()


def test_kafka_reader_raises_deploy_hint(spark):
    import pytest as _pytest

    from sparkprep.sources.readers import read_kafka_stream

    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "events")


def test_synthetic_docs_datasource(spark):
    # custom Python DataSource: partition-parallel, layout-independent
    # determinism (content depends only on (seed, doc_id))
    from sparkprep.operators import text as tx
    from sparkprep.sources.synthetic import register

    register(spark)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 500).option("partitions", 7).option("seed", 1).load())
    assert df.rdd.getNumPartitions() == 7
    rows = {r.doc_id: r.text for r in df.collect()}
    assert len(rows) == 500
    # different partitioning, same seed -> identical corpus
    df2 = (spark.read.format("synthetic_docs")
           .option("rows", 500).option("partitions", 3).option("seed", 1).load())
    assert {r.doc_id: r.text for r in df2.collect()} == rows
    # different seed -> different corpus
    df3 = (spark.read.format("synthetic_docs")
           .option("rows", 500).option("partitions", 7).option("seed", 2).load())
    assert {r.doc_id: r.text for r in df3.collect()} != rows
    # drop-in for corpus operators (documents schema)
    out = df.select(tx.token_count("text").alias("n")).agg({"n": "avg"}).collect()
    assert out[0][0] > 10


def test_manifest_jsonl_sink_commit_protocol(spark, tmp_path):
    import json
    import os

    from sparkprep.sources.manifest_sink import (
        MANIFEST, read_manifest_jsonl, register,
    )

    register(spark)
    out = str(tmp_path / "sink")
    df = spark.range(1000).selectExpr("id", "concat('doc ', id) AS text").repartition(6)
    df.write.format("manifest_jsonl").option("path", out).mode("append").save()

    man = json.load(open(os.path.join(out, MANIFEST)))
    assert man["total_rows"] == 1000
    assert len(man["files"]) == 6
    assert all(f["md5"] and f["bytes"] > 0 for f in man["files"])
    # no in-progress leftovers after a clean commit
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]

    # plant an ORPHAN (simulated failed/speculative task output): the
    # manifest-scoped read must not see it
    orphan = os.path.join(out, "part-99999.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"id": 777777, "text": "ghost"}\n')
    back = read_manifest_jsonl(spark, out)
    assert back.count() == 1000
    assert back.filter("id = 777777").count() == 0
    # content round-trips (ids intact)
    assert back.selectExpr("sum(cast(id AS bigint))").collect()[0][0] == 499500


def test_manifest_jsonl_append_never_clobbers_and_overwrite_replaces(spark, tmp_path):
    import json
    import os

    from sparkprep.sources.manifest_sink import (
        MANIFEST, read_manifest_jsonl, register,
    )

    register(spark)
    out = str(tmp_path / "sink2")
    a = spark.range(100).selectExpr("id", "'a' AS src").repartition(2)
    b = spark.range(100, 150).selectExpr("id", "'b' AS src").repartition(2)
    a.write.format("manifest_jsonl").option("path", out).mode("append").save()
    b.write.format("manifest_jsonl").option("path", out).mode("append").save()
    # append MERGES: both jobs' rows visible, distinct file names
    man = json.load(open(os.path.join(out, MANIFEST)))
    assert man["total_rows"] == 150
    assert len(man["files"]) == 4
    assert len({f["path"] for f in man["files"]}) == 4
    assert read_manifest_jsonl(spark, out).count() == 150

    # overwrite REPLACES: only the new job's rows remain, superseded
    # part files are gone from disk too
    c = spark.range(7).selectExpr("id", "'c' AS src").repartition(1)
    c.write.format("manifest_jsonl").option("path", out).mode("overwrite").save()
    man2 = json.load(open(os.path.join(out, MANIFEST)))
    assert man2["total_rows"] == 7 and len(man2["files"]) == 1
    assert read_manifest_jsonl(spark, out).count() == 7
    leftover = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(leftover) == 1


def test_manifest_read_verification_catches_truncation(spark, tmp_path):
    import pytest

    from sparkprep.sources.manifest_sink import read_manifest_jsonl, register

    register(spark)
    out = str(tmp_path / "sink3")
    spark.range(50).selectExpr("id").repartition(1).write.format(
        "manifest_jsonl"
    ).option("path", out).mode("append").save()
    # truncate the committed file AFTER commit — the documented
    # integrity case the manifest accounting exists to catch
    import os

    committed = [f for f in os.listdir(out) if f.endswith(".jsonl")][0]
    p = os.path.join(out, committed)
    lines = open(p).readlines()
    open(p, "w").writelines(lines[:20])
    with pytest.raises(ValueError, match="manifest verification failed"):
        read_manifest_jsonl(spark, out).count()
    # verify=False opts out for forensic reads
    assert read_manifest_jsonl(spark, out, verify=False).count() == 20
