"""Manifest-table source: lakehouse-style file skipping as a Spark 4
Python DataSource.

The reference's scan surface is "read whatever the path holds"
(main.py:44-49); table formats (Delta/Iceberg/Hudi) instead keep a
MANIFEST — the file list plus per-file column min/max stats — so a
selective query opens only the files whose stat range intersects its
predicates.  This module implements that pattern end-to-end with
public APIs only:

* ``ManifestArrowWriter`` — the write side, a real distributed commit
  protocol: each task streams its Arrow batches to a write-ahead file
  and accumulates min/max in the same pass (stats cost no extra scan),
  returning them in its ``WriterCommitMessage``; the driver's
  ``commit`` publishes files then manifest (manifest LAST — readers
  see old or new version, never a mix), ``abort`` removes the
  write-ahead files.  ``write_manifest_table`` is the DataFrame-API
  entry; ``build_manifest_from_footers`` backfills a manifest over a
  pre-existing parquet directory from footers (O(files) metadata).
* ``ManifestDataSource`` — reads a manifest table.  ``pushFilters``
  receives Catalyst's translated predicates, prunes the FILE LIST with
  them, and declares every filter unsupported so Spark still applies
  them row-wise: skipping is a strict optimization, never a
  correctness dependency (the same contract Delta data skipping has).
  ``partitions()`` returns one input partition per surviving file, so
  scan parallelism = surviving files; ``read`` yields Arrow record
  batches straight from the parquet file — no per-row Python.

Scale notes: the manifest is metadata (bytes per file); a 100 TB table
at 1 GB/file is ~100k manifest entries — a single JSON read on the
driver, the same order as a table format's snapshot load.  Timestamp
columns are deliberately excluded from stats (naive-vs-LTZ semantics
differ between engines); prune on int/float/string columns.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST_NAME = "manifest.json"


def write_manifest_table(df, path: str, stat_cols: list[str]) -> dict:
    """Write ``df`` as a manifest table through the distributed commit
    protocol (``ManifestArrowWriter``): each task streams its Arrow
    batches to a write-ahead file and returns (path, rows, min/max) in
    its commit message; ``commit()`` on the driver publishes the files
    and the manifest atomically-enough for a single-node FS (a
    lakehouse would write the same manifest to its log/commit
    service).  Returns the manifest dict."""
    register(df.sparkSession)
    (df.write.format("graft_manifest").mode("overwrite")
     .option("path", path).option("statCols", ",".join(stat_cols)).save())
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)


def build_manifest_from_footers(path: str, schema_json: str,
                                stat_cols: list[str]) -> dict:
    """Backfill a manifest over an EXISTING parquet directory from the
    file footers (row-group stats only; no data pages are read) —
    O(files) metadata, the onboarding path for tables written before
    manifest tracking.  The version is recovered from the highest
    ``part-vNNNN`` filename present, so a later append never reuses a
    live file name."""
    import re

    import pyarrow.parquet as pq

    version = 0
    files = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fpath = os.path.join(path, name)
        md = pq.ParquetFile(fpath).metadata
        schema_names = {md.schema.column(i).name: i
                        for i in range(len(md.schema))}
        stats: dict[str, dict] = {}
        for col in stat_cols:
            idx = schema_names[col]
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                stats[col] = {"min": lo, "max": hi}
        files.append({"path": fpath, "rows": md.num_rows, "stats": stats})
        m = re.match(r"part-v(\d+)-", name)
        if m:
            version = max(version, int(m.group(1)))
    manifest = {"schema": schema_json, "version": version, "files": files}
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh)
    return manifest


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str
    rows: int
    stats: dict = field(default_factory=dict)


class ManifestArrowWriter(DataSourceArrowWriter):
    """The write side of the table format: write-ahead data files +
    publish-on-commit manifest.

    Each task streams its record batches to ``.<name>.tmp`` and
    accumulates per-column min/max as it goes (one pass — stats cost
    nothing extra); the driver's ``commit`` renames the write-ahead
    files into place, drops files from any previous version, and
    writes ``manifest.json`` LAST — a reader that loads the manifest
    sees either the old version or the new one, never a half-written
    mix.  ``abort`` removes the write-ahead files; a retried task
    rewrites its own tmp file (same name), so task retries and
    speculation cannot double-publish.
    """

    def __init__(self, options, schema: StructType, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("graft_manifest requires option 'path'")
        raw = options.get("statcols") or ""
        self._stat_cols = [c for c in raw.split(",") if c]
        self._schema_json = schema.json()
        self._overwrite = overwrite
        # versioned file names make EVERY write (append or overwrite)
        # collision-free with the live table's files — an overwrite
        # that reused v0000 names would os.replace files the current
        # manifest still describes, breaking the readers-see-old-or-new
        # invariant mid-commit
        self._prior: list[dict] = []
        self._version = 0
        self._stale: list[str] = []
        mpath = os.path.join(self._path, MANIFEST_NAME)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                prev = json.load(fh)
            self._version = prev.get("version", 0) + 1
            if overwrite:
                self._stale = [f["path"] for f in prev["files"]]
            else:
                self._prior = prev["files"]

    def write(self, iterator) -> WriterCommitMessage | None:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self._path, exist_ok=True)
        name = f"part-v{self._version:04d}-{ctx.partitionId():05d}.parquet"
        final = os.path.join(self._path, name)
        # attempt-unique staging name: a speculative/zombie attempt of
        # the same partition must never stream into the same tmp file
        # (the Hadoop commit-protocol rule); only the attempt whose
        # commit message Spark accepts gets published
        tmp = os.path.join(self._path,
                           f".{name}.{ctx.taskAttemptId()}.tmp")
        writer = None
        rows = 0
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        try:
            for batch in iterator:
                if writer is None:
                    writer = pq.ParquetWriter(tmp, batch.schema)
                writer.write_batch(batch)
                rows += batch.num_rows
                for col in self._stat_cols:
                    try:
                        mm = pc.min_max(batch.column(col))
                        bmin, bmax = mm["min"].as_py(), mm["max"].as_py()
                    except (KeyError, TypeError, pa.ArrowInvalid,
                            pa.ArrowNotImplementedError):
                        continue  # absent or unstatable column
                    if bmin is None:
                        continue
                    lo[col] = bmin if col not in lo else min(lo[col], bmin)
                    hi[col] = bmax if col not in hi else max(hi[col], bmax)
        finally:
            if writer is not None:
                writer.close()
        if rows == 0:
            # empty partition: no file; the runtime requires a real
            # WriterCommitMessage (None is rejected), so send a
            # zero-row sentinel that commit/abort skip.  If the
            # iterator yielded only zero-row batches the staging file
            # was still created — remove it, nothing will publish it.
            if writer is not None and os.path.exists(tmp):
                os.remove(tmp)
            return _FileCommit(tmp_path="", final_path="", rows=0)
        stats = {c: {"min": lo[c], "max": hi[c]} for c in lo}
        return _FileCommit(tmp_path=tmp, final_path=final, rows=rows,
                           stats=stats)

    def commit(self, messages) -> None:
        msgs = [m for m in messages if m is not None and m.rows > 0]
        for m in msgs:
            os.replace(m.tmp_path, m.final_path)
        new_files = [{"path": m.final_path, "rows": m.rows,
                      "stats": m.stats}
                     for m in sorted(msgs, key=lambda m: m.final_path)]
        # append: the manifest file list is an append-only log — prior
        # entries keep their positions (the streaming reader's offsets
        # index into this list); overwrite: only the new version
        files = new_files if self._overwrite else self._prior + new_files
        manifest = {
            "schema": self._schema_json,
            "version": self._version,
            "files": files,
        }
        # the manifest IS the publish point: written after the data
        # files land (their names never collide with the previous
        # version), replaced atomically
        tmp_manifest = os.path.join(self._path, f".{MANIFEST_NAME}.tmp")
        with open(tmp_manifest, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp_manifest, os.path.join(self._path, MANIFEST_NAME))
        # vacuum the superseded version's files only AFTER the publish:
        # a crash anywhere above leaves the old manifest + old files
        # fully intact, never a manifest describing replaced contents
        for path in self._stale:
            if os.path.exists(path):
                os.remove(path)
        # sweep dead attempts' staging files (failed/speculative
        # attempts return no commit message, so nothing else removes
        # them); single-writer assumption — like any FS table format
        # without a lock service
        for name in os.listdir(self._path):
            if name.startswith(".") and name.endswith(".tmp"):
                os.remove(os.path.join(self._path, name))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.rows > 0 and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _file_survives(stats: dict, filters) -> bool:
    """False only when some pushed filter PROVABLY excludes every row
    of the file (stat range disjoint from the predicate).  Missing
    stats for a column → the file survives."""
    for f in filters:
        if not isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                              LessThan, LessThanOrEqual)):
            continue  # IsNotNull/In/string matchers etc: no pruning
        attr = getattr(f, "attribute", None)
        if attr is None or len(attr) != 1:
            continue
        s = stats.get(attr[0])
        if s is None:
            continue
        v = f.value
        try:
            if isinstance(f, EqualTo):
                if v < s["min"] or v > s["max"]:
                    return False
            elif isinstance(f, GreaterThan):
                if s["max"] <= v:
                    return False
            elif isinstance(f, GreaterThanOrEqual):
                if s["max"] < v:
                    return False
            elif isinstance(f, LessThan):
                if s["min"] >= v:
                    return False
            elif isinstance(f, LessThanOrEqual):
                if s["min"] > v:
                    return False
        except TypeError:
            # incomparable literal/stat types: never prune on doubt
            continue
    return True


class ManifestReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("graft_manifest requires option 'path'")
        mpath = path if path.endswith(".json") else os.path.join(
            path, MANIFEST_NAME)
        with open(mpath) as fh:
            self._manifest = json.load(fh)
        self._files = self._manifest["files"]

    def pushFilters(self, filters):
        self._files = [f for f in self._files
                       if _file_survives(f["stats"], filters)]
        # declare everything unsupported: Spark re-applies all filters
        # row-wise, so pruning can never change results — only IO
        yield from filters

    def partitions(self):
        return [_FilePartition(f["path"]) for f in self._files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(partition.path).iter_batches()


class ManifestStreamReader(DataSourceStreamReader):
    """Manifest-tail streaming: the manifest's append-only file list
    is the changelog, offsets are INDEXES into it — exactly how table
    formats expose a table as a stream (Delta/Iceberg streaming
    sources tail the transaction log).  Each microbatch plans one
    input partition per newly-appended file and reuses the batch
    reader's Arrow path.  Offsets live in the engine's checkpoint, so
    restart resumes at the first unprocessed file — exactly-once at
    file granularity; ``commit`` is a no-op because the manifest is
    the durable log (nothing to acknowledge).

    Requires append-mode writes: an overwrite rewrites history and
    invalidates outstanding offsets (same contract as any log-tailing
    source over a truncated log).
    """

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("graft_manifest requires option 'path'")
        self._mpath = path if path.endswith(".json") else os.path.join(
            path, MANIFEST_NAME)

    def _files(self) -> list[dict]:
        with open(self._mpath) as fh:
            return json.load(fh)["files"]

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()[start["index"]:end["index"]]
        return [_FilePartition(f["path"]) for f in files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(partition.path).iter_batches()

    def commit(self, end: dict) -> None:
        pass  # the manifest is the durable log; offsets checkpoint engine-side

    def stop(self) -> None:
        pass


class ManifestDataSource(DataSource):
    """``spark.read.format("graft_manifest").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "graft_manifest"

    def schema(self) -> StructType:
        path = self.options.get("path")
        mpath = path if path.endswith(".json") else os.path.join(
            path, MANIFEST_NAME)
        with open(mpath) as fh:
            return StructType.fromJson(json.loads(json.load(fh)["schema"]))

    def reader(self, schema: StructType) -> ManifestReader:
        return ManifestReader(self.options)

    def writer(self, schema: StructType,
               overwrite: bool) -> ManifestArrowWriter:
        return ManifestArrowWriter(self.options, schema, overwrite)

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration.

    Also enables ``spark.sql.python.filterPushdown.enabled``
    (default-off runtime conf): PySpark 4.1 REFUSES any batch read of
    a Python source that implements ``pushFilters`` while the conf is
    off, so registering the source without it would make every
    ``graft_manifest`` scan error.  Deliberate session-wide setting,
    owned here so no caller/test ordering can leave the source
    half-registered; it only affects Python data sources that push
    filters — this one."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ManifestDataSource)
