"""Custom Python DataSourceWriter: a manifest-committed JSONL sink.

    from sparkprep.sources.manifest_sink import register, read_manifest_jsonl
    register(spark)
    df.write.format("manifest_jsonl").option("path", out).mode("append").save()
    back = read_manifest_jsonl(spark, out)     # reads ONLY committed files

What the commit protocol buys (and plain ``df.write.json`` doesn't):
- each task writes to a ``*.inprogress`` name and reports a commit
  message (path, rows, bytes, md5); the driver's ``commit`` renames
  exactly the reported files and writes ``_MANIFEST.json`` listing them
  — a failed/speculative task's leftovers are never renamed, never
  listed, and therefore never read;
- the manifest is the read contract: consumers open the listed files
  only, so a partially-failed job is invisible rather than half-read;
- per-file row/byte/md5 accounting comes for free — the ingest audit
  the reference's CSV loads lacked entirely.

Mode semantics (both honored — a sink that ignores its mode clobbers):
- ``append``: file names carry a per-job token, so a second job can
  never overwrite a prior job's parts; commit MERGES the new entries
  into the existing manifest (totals recomputed).
- ``overwrite``: commit replaces the manifest with exactly this job's
  files and deletes the previously-committed files it superseded.

This is the integrity pattern table formats (Delta/Iceberg) implement
with transaction logs, expressed minimally over the public DataSource
API. JSONL because it's the LLM-corpus interchange format; the pattern
is format-agnostic.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

MANIFEST = "_MANIFEST.json"


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str
    rows: int
    n_bytes: int
    md5: str


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.dir = options["path"]
        self.overwrite = overwrite
        # one token per JOB: appended jobs get distinct part names, so
        # append can never silently clobber a prior job's files
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, rows):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self.dir, exist_ok=True)
        final = os.path.join(self.dir, f"part-{self.job_token}-{pid:05d}.jsonl")
        tmp = final + f".{attempt}-{uuid.uuid4().hex[:8]}.inprogress"
        n = 0
        h = hashlib.md5()
        with open(tmp, "wb") as fh:
            for r in rows:
                line = (json.dumps(r.asDict(), default=str, sort_keys=True) + "\n").encode()
                fh.write(line)
                h.update(line)
                n += 1
        return _FileCommit(
            tmp_path=tmp,
            final_path=final,
            rows=n,
            n_bytes=os.path.getsize(tmp),
            md5=h.hexdigest(),
        )

    def _load_manifest(self):
        p = os.path.join(self.dir, MANIFEST)
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return None

    def commit(self, messages):
        files = []
        for m in messages:
            os.replace(m.tmp_path, m.final_path)
            files.append(
                {"path": m.final_path, "rows": m.rows, "bytes": m.n_bytes, "md5": m.md5}
            )
        prior = self._load_manifest()
        if self.overwrite:
            # superseded committed files are removed so a raw directory
            # listing can't resurrect them either
            for f in (prior or {"files": []})["files"]:
                if f["path"] not in {x["path"] for x in files}:
                    try:
                        os.remove(f["path"])
                    except OSError:
                        pass
        elif prior is not None:
            files = prior["files"] + files
        manifest = {
            "format": "jsonl",
            "files": sorted(files, key=lambda f: f["path"]),
            "total_rows": sum(f["rows"] for f in files),
            "total_bytes": sum(f["bytes"] for f in files),
        }
        with open(os.path.join(self.dir, MANIFEST), "w") as fh:
            json.dump(manifest, fh, indent=1)

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class ManifestJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema, overwrite: bool):
        return ManifestJsonlWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(ManifestJsonlDataSource)


def read_manifest_jsonl(spark, path: str, schema=None, verify: bool = True):
    """Read ONLY the files the manifest committed (uncommitted leftovers
    are invisible by construction). With ``verify`` (default), per-file
    read-back row counts are checked against the manifest's accounting
    and a mismatch raises — the post-commit corruption/truncation case
    the manifest's rows/md5 bookkeeping exists to catch. The check is
    one extra count aggregate over the same read."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    files = [f["path"] for f in manifest["files"]]
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    df = r.json(files)
    if verify and files:
        from pyspark.sql import functions as F

        got = {
            row["f"]: row["n"]
            for row in df.groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # input_file_name yields URIs; compare by basename (unique by
        # construction: job token + partition id)
        got_by_base = {os.path.basename(k): v for k, v in got.items()}
        bad = []
        for f in manifest["files"]:
            base = os.path.basename(f["path"])
            if got_by_base.get(base, 0) != f["rows"]:
                bad.append((f["path"], f["rows"], got_by_base.get(base, 0)))
        if bad:
            raise ValueError(
                f"manifest verification failed (path, expected, got): {bad}"
            )
    return df
