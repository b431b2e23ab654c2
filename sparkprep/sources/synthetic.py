"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic document corpus, generated IN the executors.

    from sparkprep.sources.synthetic import register
    register(spark)
    docs = (spark.read.format("synthetic_docs")
            .option("rows", 1_000_000).option("partitions", 64)
            .option("seed", 42).load())

Why a real data source instead of ``spark.range().select(...)``:
- the generator is partition-parallel AND partition-deterministic — a
  given (seed, rows, partitions) triple yields the identical corpus on
  any cluster layout, so scale tests and repros never ship testdata;
- schema matches the driver's documents table (doc_id, text, lang,
  source, n_chars), so every corpus operator runs on it unmodified;
- it exercises the public DataSource extension point the engine's own
  sources would use for anything Spark lacks built-in.

Rows are produced row-at-a-time in Python — fine for test/bench corpora
(~100k rows/s/partition); for 100 TB you'd generate to parquet once, or
yield pyarrow RecordBatches from ``read`` (same API, columnar path).
Reference corpus comparison: the reference synthesizes nothing — it
downloads fixed CSVs; a seeded generator-source is the engine-native
replacement for that fixture workflow.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_LANGS = ["en", "en", "en", "de", "fr", "es"]  # en-heavy, like the testdata
_VOCAB = (
    "the a and of to in is it data spark table row scan key value part "
    "hash merge batch line sort window column join small query big group "
    "stream filter order vector model train corpus token"
).split()


def _doc(doc_id: int, seed: int, tokens_per_doc: int) -> tuple:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_tokens = 20 + h[0] % tokens_per_doc
    words = []
    x = int.from_bytes(h[:8], "big")
    for i in range(n_tokens):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        words.append(_VOCAB[x % len(_VOCAB)])
    text = " ".join(words)
    lang = _LANGS[h[1] % len(_LANGS)]
    return (doc_id, text, lang, f"src{h[2] % 20}", len(text))


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.tokens_per_doc = int(options.get("tokens_per_doc", 180))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        # round-robin id assignment: the corpus content depends only on
        # (seed, doc_id), never on the partition count — repartitioning
        # the read cannot change a single document
        for doc_id in range(partition.value, self.rows, self.num_partitions):
            yield _doc(doc_id, self.seed, self.tokens_per_doc)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars int"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)


def _event(event_id: int, seed: int) -> tuple:
    import datetime

    h = hashlib.md5(f"ev:{seed}:{event_id}".encode()).digest()
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=event_id * 7)
    types = ["view", "click", "purchase", "signup", "error"]
    return (
        event_id,
        ts,
        h[0] % 150,
        types[h[1] % len(types)],
        round(int.from_bytes(h[2:4], "big") / 655.35, 2),
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Exactly-once synthetic event stream: the offset IS the next
    event_id, so replays (``readBetweenOffsets`` after a restart)
    regenerate byte-identical rows — determinism is what makes the
    streaming reconcile tests meaningful."""

    def __init__(self, options):
        self.batch = int(options.get("events_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        i = start["next"]
        rows = [_event(x, self.seed) for x in range(i, i + self.batch)]
        return (iter(rows), {"next": i + self.batch})

    def readBetweenOffsets(self, start, end):
        return iter([_event(x, self.seed) for x in range(start["next"], end["next"])])


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double")

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
