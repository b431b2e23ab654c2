"""Physical-control operators (SURVEY.md §2.13 C1-C4), systematized.

The reference hard-codes ``repartition(60)`` three times
(loanStat.py:149,230,307) and sprinkles ``cache()`` as ritual. Policy
here (SURVEY §4): let AQE coalesce; when an explicit repartition IS
needed (e.g. before a partitioned write), derive the count from data
size, never a constant; cache only what is referenced more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401


def input_size_bytes(df: DataFrame) -> int | None:
    """Best-effort logical-plan size estimate (from file statistics for
    scans; Catalyst propagates through projections/filters)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def repartition_by_size(
    df: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024, min_partitions: int = 1
) -> DataFrame:
    """C1 done right: partition count = ceil(size / target), bounded
    below. 128 MB default matches ``spark.sql.files.maxPartitionBytes``
    — partitions that fit executor memory at any SF, instead of the
    reference's magic 60."""
    size = input_size_bytes(df)
    if size is None:
        return df
    n = max(min_partitions, -(-size // target_partition_bytes))
    return df.repartition(int(n))


def cache_if_reused(df: DataFrame, num_downstream_uses: int) -> DataFrame:
    """C2 as policy: cache exactly when a frame feeds >= 2 actions
    (e.g. the scalar-agg + main-flow pair in EP1); a cache used once
    only costs memory and a write pass."""
    return df.cache() if num_downstream_uses >= 2 else df


def partition_count(df: DataFrame) -> int:
    """C4 — ``df.rdd.getNumPartitions()`` (mssql.ipynb:184)."""
    return df.rdd.getNumPartitions()


def coalesce_for_write(df: DataFrame, max_files: int) -> DataFrame:
    """Writer-side small-files control: coalesce (no shuffle) down to a
    file budget — the missing half of the reference's CSV sinks, which
    emitted one file per task."""
    return df.coalesce(max_files)


def compact_files(
    spark,
    src_dir: str,
    dst_dir: str,
    fmt: str = "parquet",
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction — the table-maintenance op every long-lived
    100 TB layout needs (streaming sinks and per-trigger appends leave
    thousands of KB-sized files; scan cost becomes per-file overhead).

    Reads the directory, repartitions to the size-derived count
    (:func:`repartition_by_size`), writes to an EXPLICIT destination —
    never in-place: object stores have no atomic directory rename, so
    the safe pattern everywhere is write-new + flip pointers, and a
    local-FS "swap" would train users on a pattern that loses data on
    S3/GCS. Returns an accounting manifest (rows, files before/after).
    """
    import glob
    import os

    df = spark.read.format(fmt).load(src_dir)
    files_before = len(
        [p for p in glob.glob(os.path.join(src_dir, "part-*"))]
    )
    rows = df.count()
    out = repartition_by_size(df, target_partition_bytes)
    out.write.mode("overwrite").format(fmt).save(dst_dir)
    files_after = len([p for p in glob.glob(os.path.join(dst_dir, "part-*"))])
    return {
        "rows": rows,
        "files_before": files_before,
        "files_after": files_after,
        "src": src_dir,
        "dst": dst_dir,
    }


def plan_metrics(df: DataFrame) -> dict:
    """Post-action cost attribution from the executed plan's SQL metric
    registry — the per-query observability a 100 TB deployment bills
    by: rows scanned, shuffle volume, spill, peak operator memory.

    Call AFTER an action: metrics accumulate during execution. Under
    AQE, resolving the final plan on a not-yet-run query FORCES the
    remaining stages to execute (same as an action) — so this never
    reads zeros, but on an unexecuted frame you pay the run here.
    Resolves the AQE root to the final
    physical plan and descends through materialized query stages
    (``QueryStageExec.plan()``) so exchange metrics aren't hidden
    behind stage boundaries. Driver-side tooling over py4j — reads
    accumulators only, never touches data.
    """
    node = df._jdf.queryExecution().executedPlan()
    try:
        node = node.finalPhysicalPlan()
    except Exception:
        pass  # non-AQE plan: already physical

    totals = {
        "rows_scanned": 0,
        "scan_files_read": 0,
        "scan_bytes_read": 0,
        "shuffle_records_written": 0,
        "shuffle_bytes_written": 0,
        "spill_bytes": 0,
        "peak_operator_memory": 0,
        "output_rows": None,
    }

    def metric_values(n) -> dict:
        m = n.metrics()
        it = m.keySet().iterator()
        vals = {}
        while it.hasNext():
            k = it.next()
            vals[k] = m.get(k).get().value()
        return vals

    def walk(n, is_root=False):
        name = n.nodeName()
        vals = metric_values(n)
        if is_root and totals["output_rows"] is None and "numOutputRows" in vals:
            totals["output_rows"] = vals["numOutputRows"]
        if name.startswith("Scan"):
            totals["rows_scanned"] += vals.get("numOutputRows", 0)
            totals["scan_files_read"] += vals.get("numFiles", 0)
            totals["scan_bytes_read"] += vals.get("filesSize", 0)
        totals["shuffle_records_written"] += vals.get("shuffleRecordsWritten", 0)
        totals["shuffle_bytes_written"] += vals.get("shuffleBytesWritten", 0)
        totals["spill_bytes"] += vals.get("spillSize", 0)
        totals["peak_operator_memory"] = max(
            totals["peak_operator_memory"], vals.get("peakMemory", 0)
        )
        kids = []
        try:
            kids.append(n.plan())  # QueryStageExec: the materialized stage
        except Exception:
            pass
        ch = n.children()
        for i in range(ch.size()):
            kids.append(ch.apply(i))
        for k in kids:
            walk(k)

    walk(node, is_root=True)
    return totals
