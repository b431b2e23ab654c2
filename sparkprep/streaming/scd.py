"""Streaming dimension maintenance: CDC micro-batches SCD2-merged into
a versioned parquet snapshot store — the write-side twin of the batch
``transform.merge_scd2`` operator (reference surface: the staged
MSSQL→BQ upsert jobs, mssql.ipynb; here the updates arrive as a
stream).

Why snapshot-and-swap and never in-place: ``merge_scd2`` reads the
current dimension lazily, so overwriting the same parquet path would
have Spark scanning the very files it is deleting. Each batch writes a
NEW snapshot directory and then swaps a one-line pointer file — readers
only ever see a fully-committed snapshot, and a crashed merge leaves
the previous snapshot intact. On an object store the pointer swap
becomes a conditional put / manifest commit (see
``sources/manifest_sink`` for that pattern); the local form uses
``os.replace`` (atomic on POSIX).

Exactly-once across restarts: the pointer records the batch id it came
from; a replayed micro-batch (streaming restarts re-deliver the last
uncommitted batch) with id ≤ the committed id is skipped, so the merge
is idempotent without any engine-side transaction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkprep.operators import transform

_LATEST = "_LATEST"


def _read_pointer(store_dir: str) -> tuple[str, int]:
    with open(os.path.join(store_dir, _LATEST)) as fh:
        snap = fh.read().strip()
    # NOT rsplit("-"): the bootstrap id -1 would parse as +1 and
    # silently skip every real batch
    return snap, int(snap[len("snap-"):])


def _write_pointer(store_dir: str, snap: str) -> None:
    tmp = os.path.join(store_dir, _LATEST + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(snap)
    os.replace(tmp, os.path.join(store_dir, _LATEST))


def read_dimension(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current committed SCD2 snapshot (pointer → snapshot dir)."""
    snap, _ = _read_pointer(store_dir)
    return spark.read.parquet(os.path.join(store_dir, snap))


def init_dimension(initial: DataFrame, store_dir: str) -> None:
    """Bootstrap the store with snapshot id -1 (any first micro-batch,
    including a replayed batch 0, applies on top)."""
    os.makedirs(store_dir, exist_ok=True)
    snap = "snap--1"
    initial.write.mode("overwrite").parquet(os.path.join(store_dir, snap))
    _write_pointer(store_dir, snap)


def foreach_batch_scd2(
    store_dir: str,
    key_cols: list[str],
    effective_col: str = "effective_ts",
):
    """foreachBatch sink: SCD2-merge each CDC micro-batch into the
    versioned dimension store.

    Within a batch, only the LATEST change per key is applied (by
    ``effective_col``, remaining columns as a deterministic tie-break),
    so history is micro-batch-granular: versions a key burned through
    INSIDE one batch collapse to the last one — run smaller triggers if
    intra-batch history matters. The collapse also restores SQL MERGE's
    key-unique contract when the upstream CDC feed duplicates rows.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snap, committed_id = _read_pointer(store_dir)
        if batch_id <= committed_id:
            return  # replayed batch after a restart: already merged
        from pyspark.sql.window import Window

        others = [
            c
            for c in batch_df.columns
            if c not in key_cols and c != effective_col
        ]
        w = Window.partitionBy(*key_cols).orderBy(
            F.desc(effective_col), *[F.col(c) for c in others]
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        target = spark.read.parquet(os.path.join(store_dir, snap))
        merged = transform.merge_scd2(
            target, latest, key_cols, effective_col=effective_col
        )
        new_snap = f"snap-{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(store_dir, new_snap)
        )
        _write_pointer(store_dir, new_snap)
        _prune_snapshots(store_dir, keep_from=committed_id)

    return sink


def land_cdc_files(df: DataFrame, in_dir: str, name: str) -> None:
    """Land a CDC batch as FLAT parquet part-files in the stream's
    input dir. The file streaming source lists its directory
    NON-recursively, so the obvious ``df.write.parquet(in_dir/x)``
    creates a nested directory the stream silently never sees (zero
    batches fired) — stage the write elsewhere and copy the part-files
    up. One helper so every caller shares the workaround (and its
    removal, if the source ever gains recursive lookup)."""
    import glob
    import shutil

    stage = os.path.join(os.path.dirname(in_dir.rstrip("/")), f"__stage-{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    for i, part in enumerate(
        sorted(glob.glob(os.path.join(stage, "part-*.parquet")))
    ):
        shutil.copy(part, os.path.join(in_dir, f"{name}-{i}.parquet"))
    shutil.rmtree(stage)


def _prune_snapshots(store_dir: str, keep_from: int) -> None:
    """Delete snapshots older than the PREVIOUS commit (current +
    previous stay, for crash safety around the pointer swap) — without
    retention, a long-running stream holds one full dimension copy per
    micro-batch and the store grows without bound."""
    import shutil

    for name in os.listdir(store_dir):
        if not name.startswith("snap-"):
            continue
        try:
            sid = int(name[len("snap-"):])
        except ValueError:
            continue
        if sid < keep_from:
            shutil.rmtree(os.path.join(store_dir, name), ignore_errors=True)
