"""Query registry backing ``__spark_entry__``.

Each submodule exports ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL). Keys missing from ORACLES get
the driver's weaker rows-only check (genuinely non-SQL-expressible ops).

Parity conventions (driver hashes values order-insensitively, columns
sorted by name):
- alias every computed column identically on both sides;
- ``round()`` float aggregates on both sides (engine summation order
  differs at ~1e-12);
- cast computed ints to BIGINT both sides;
- pin session TZ to UTC (``tune_for_engine``) before timestamp queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = _read(spark, os.path.join(sf_dir, f"{name}.parquet"))
    return df


def _read(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns.

    The events table is written as parquet timestamp[ns], which Spark's
    reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read nanos as
    LONG (legacy conf) and rebuild the timestamp with integer division
    (``div 1000`` — exact on int64; a double roundtrip would lose
    precision above 2^53 ns), truncating toward zero exactly like
    DuckDB's ns→us conversion.
    """
    from pyspark.sql import functions as F

    try:
        df = spark.read.parquet(path)
        # force schema resolution now; the error surfaces lazily otherwise
        df.schema
        probe_nanos = any(t == "bigint" and c == "ts" for c, t in df.dtypes)
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        probe_nanos = True
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true" and probe_nanos:
        for c, typ in df.dtypes:
            if c == "ts" and typ == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def registry():
    from sparkprep.queries import (
        cleaning,
        corpus,
        llmprep,
        relational,
        relational_ext,
        scale_ops,
        temporal_grouped,
        textops,
    )

    queries: dict = {}
    oracles: dict = {}
    # Merge order is deliberate: the correctness driver adjudicates the
    # first 50 registry entries per round. Modules whose queries lack a
    # driver verdict (r1 covered the first 50 = relational + cleaning
    # head) merge FIRST so they land inside the window; relational's
    # already-green rows move to the tail.
    # ROTATION (next round): once CORRECTNESS_r02 lands, move scale_ops
    # and the relational tail (market_share..calendar_features,
    # snapshot_diff..) to the front — they are the only queries without
    # a driver verdict — and retire this round's verified heads to the
    # tail. Every query keeps local sf0.001 oracle coverage regardless
    # (tests/test_entry_oracle.py).
    for mod in (textops, llmprep, temporal_grouped, relational_ext, cleaning, relational, scale_ops, corpus):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
