"""Manifest-table source: lakehouse-style file skipping as a Spark 4
Python DataSource.

The reference's scan surface is "read whatever the path holds"
(main.py:44-49); table formats (Delta/Iceberg/Hudi) instead keep a
MANIFEST — the file list plus per-file column min/max stats — so a
selective query opens only the files whose stat range intersects its
predicates.  This module implements that pattern end-to-end with
public APIs only:

* ``write_manifest_table(df, path, stat_cols)`` — a normal distributed
  parquet write, then one driver-side metadata pass over the parquet
  FOOTERS (row-group stats only; no data pages are read) to build
  ``manifest.json``.  Footer reads are O(files), not O(bytes) — this
  is exactly how table-format commit services build manifests; at
  cluster scale the footer pass distributes trivially (it is
  per-file independent).
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
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

MANIFEST_NAME = "manifest.json"


def write_manifest_table(df, path: str, stat_cols: list[str]) -> dict:
    """Distributed parquet write + footer-stats manifest build.

    ``stat_cols`` must be int/float/string columns (no timestamps —
    see module docstring).  Returns the manifest dict (also written to
    ``<path>/manifest.json``).
    """
    import pyarrow.parquet as pq

    df.write.mode("overwrite").parquet(path)
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
    manifest = {"schema": df.schema.json(), "files": files}
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh)
    return manifest


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


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(ManifestDataSource)
