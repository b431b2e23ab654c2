"""Sinks K1-K3 (SURVEY.md §2.2).

Parquet is the default (the reference wrote CSV everywhere —
``loanStat.py:354``, ``nasa.py:161`` — which loses types and vectorized
scans); CSV/JDBC kept for surface parity; the BigQuery path
(``bq load`` via staged CSV + schema string, ``loanStat.py:372-382``) is
emulated locally as a staging contract so it is testable without GCP.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by=None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink. ``max_records_per_file`` bounds file size from the
    writer side (the task-level split Spark applies after partitioning)
    — the knob that keeps a skewed partition from emitting one 10 GB
    file that a downstream scan can't split."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    """ORC columnar sink (built-in). Same layout contract as parquet:
    one file per partition, optional hive-style partition dirs."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """K1 — ``df.write.mode('overwrite').format('csv').save(dir)``
    (loanStat.py:354). Header on by default (the reference wrote
    headerless CSV then re-supplied schema strings to ``bq load``)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    partition_by=None,
) -> None:
    """JSON-Lines sink — the LLM-corpus interchange format (one JSON
    object per line; what most open-data releases and tokenizer
    pipelines consume). Spark's native json source writes one file per
    partition, so writer parallelism and downstream shard count are the
    DataFrame's partitioning — ``repartition(n)`` upstream to pick the
    shard layout. Gzip by default: corpus text compresses ~5x and
    JSONL is line-splittable only when uncompressed, so choose gzip for
    archival hand-off and ``compression=None`` when the next reader is
    a parallel scan."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    batchsize: int = 10000,
    **options,
) -> None:
    """K2 — JDBC write (mssql.ipynb:862-867). ``batchsize`` matters at
    scale; the reference used the 1-row default. Writer parallelism =
    DataFrame partitions; coalesce upstream if the target DB can't take
    one connection per executor core."""
    w = df.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table)
    for k, v in {"user": user, "password": password, "driver": driver, "batchsize": batchsize}.items():
        if v is not None:
            w = w.option(k, str(v))
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Bucketed managed table (``bucketBy`` + optional ``sortBy``) — the
    co-located-join primitive: two tables bucketed by the same key into
    the same bucket count join with NO exchange (and with ``sortBy``, no
    sort either). At 100 TB this is how repeatedly-joined fact tables
    amortize their shuffle once at write time. Only ``saveAsTable``
    supports bucketing (plain ``save`` paths do not carry bucket specs).
    """
    w = df.write.mode(mode).format(format).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned layout: directory per partition value, so
    partition-key predicates prune entire directories at planning time
    (``PartitionFilters`` in the scan, zero I/O for pruned values).
    Choose LOW-cardinality keys; a high-cardinality partition column
    creates a small-files explosion."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


_BQ_TYPE_MAP = {
    "double": "FLOAT",
    "float": "FLOAT",
    "bigint": "INTEGER",
    "int": "INTEGER",
    "smallint": "INTEGER",
    "tinyint": "INTEGER",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "string": "STRING",
}


def bq_schema_string(df: DataFrame) -> str:
    """The ``col:TYPE,...`` schema string the reference hand-wrote for
    ``bq load`` (loanStat.py:374-382: ``loan_amnt:FLOAT,...``), derived
    from the DataFrame schema instead of hand-maintained."""
    parts = []
    for f in df.schema.fields:
        parts.append(f"{f.name}:{_BQ_TYPE_MAP.get(f.dataType.simpleString(), 'STRING')}")
    return ",".join(parts)


def bq_load_emulated(df: DataFrame, staging_dir: str, dataset: str, table: str) -> dict:
    """K3 — BigQuery load contract, emulated locally.

    Reference flow (loanStat.py:330-382, nasa.py:130-183): write CSV to a
    GCS staging dir derived from the Hadoop conf, then
    ``subprocess.check_call('bq load --source_format=CSV --replace
    --autodetect {ds}.{tbl} {files} {schema_string}')``.

    We produce the same artifacts — staged headerless CSV + schema string
    + the command line that WOULD run — and return them as a manifest so
    tests can assert the contract without GCP. In production the idiomatic
    path is the spark-bigquery-connector (``df.write.format('bigquery')``),
    which skips the CSV staging hop entirely.
    """
    out = os.path.join(staging_dir, dataset, table)
    write_csv(df, out, header=False)
    schema = bq_schema_string(df)
    # NOT --autodetect alongside the schema: real `bq load` rejects the
    # combination as mutually exclusive — the reference passed both and
    # relied on the CLI's leniency of the day; an executable contract
    # picks one (the explicit schema, since we derive it anyway)
    cmd = (
        f"bq load --source_format=CSV --replace "
        f"{dataset}.{table} {out}/part-* {schema}"
    )
    return {"staging_path": out, "schema_string": schema, "command": cmd}


def write_laid_out(
    df: DataFrame,
    path: str,
    cols: list[str],
    predicates: list[tuple],
    num_files: int = 32,
    bits: int = 12,
    mode: str = "overwrite",
    tiebreakers: list[str] | None = None,
) -> dict:
    """Advised layout write: run :func:`physical.layout_advisor` over
    the frame against the caller's predicate panel, apply the winning
    layout (linear sort or z-order), and write parquet. Returns the
    advisor verdict so callers can log WHY the table is laid out the
    way it is — the decision record a 100 TB rewrite should leave
    behind.

    Pass ``tiebreakers`` (the table's key columns) whenever ``cols``
    don't totally order rows — otherwise the simulated file assignment,
    and therefore the logged decision record, is nondeterministic
    (ADVICE r9). The written files' zone maps APPROXIMATELY reproduce
    the simulated scan counts: the apply path partitions with
    ``repartitionByRange`` (sampled boundaries) while the simulation
    used exact ntile, so per-file boundaries can differ by sampler
    slack (tests allow a few files of drift)."""
    from sparkprep.operators.physical import layout_advisor

    advice = layout_advisor(
        df, cols, predicates, num_files=num_files, bits=bits,
        tiebreakers=tiebreakers,
    )
    laid = advice["apply"][advice["recommended"]](df)
    laid.write.mode(mode).parquet(path)
    return advice
