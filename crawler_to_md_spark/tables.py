"""Snapshot-table layer: parquet datasets + atomic JSON manifest commits.

Iceberg-shaped storage without Iceberg jars (none are bundled in this
sandbox's Spark). Provides the subset of semantics the crawl engine needs —
the same subset the reference gets from its SQLite cache file
(cli.py:203-213, database_manager.py:19-35):

- append-only commits, each producing an immutable numbered snapshot with a
  parent pointer, a datafile list, and a summary dict (our "per-partition
  lineage and metrics");
- atomic publish via write-temp + ``os.replace`` of the CURRENT pointer
  (POSIX-atomic on one filesystem; production swaps this class for a real
  Iceberg catalog — the engine only calls ``append / read / snapshots /
  read_at / current_snapshot``);
- time travel (``read_at``) — the resume path re-opens the last committed
  wave's snapshot (reference resume: scraper.py:278-283).

PORTABILITY: this class is LOCAL-FILESYSTEM-ONLY by design (os.listdir /
os.replace / pyarrow footer reads on local paths). It stands in for a real
Iceberg catalog in this jar-less sandbox; on a cluster with hdfs/s3 table
roots you swap the class, not the engine (the engine touches only
``append / read / read_delta / snapshots / read_at / rollback_to``).

State updates are APPEND-ONLY LOGS, never in-place row updates: the
frontier's ``visited`` transition (reference ``UPDATE links SET visited``,
database_manager.py:93) is an append to a ``visited`` table and an
anti-join at read time — the scalable MERGE-free variant of SURVEY.md J2.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _footer_rows(files: list[str]) -> int:
    """Sum of num_rows across parquet footers — the Iceberg-manifest
    record-count analog, read driver-side in milliseconds. Non-local table
    roots (s3://, hdfs://) resolve through the pyarrow filesystem for the
    URI instead of assuming the local FS (ADVICE r2)."""
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        if "://" in f:
            from pyarrow import fs as pafs

            filesystem, path = pafs.FileSystem.from_uri(f)
            total += pq.ParquetFile(path, filesystem=filesystem).metadata.num_rows
        else:
            total += pq.ParquetFile(f).metadata.num_rows
    return total


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self._manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self._manifest_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self._manifest_dir, "CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir, f"v{version:06d}.json")) as f:
            return json.load(f)

    def current_snapshot(self) -> dict | None:
        v = self.current_version()
        return self._manifest(v) if v > 0 else None

    def snapshots(self) -> list[dict]:
        return [self._manifest(v) for v in range(1, self.current_version() + 1)]

    def _commit(self, files: list[str], summary: dict, schema_json: str,
                delta_files: list[str] | None = None) -> dict:
        parent = self.current_version()
        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "files": files,
            "delta_files": delta_files if delta_files is not None else files,
            "summary": summary,
            "schema": schema_json,
        }
        mpath = os.path.join(self._manifest_dir, f"v{version:06d}.json")
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        ctmp = self._current_path() + f".tmp-{uuid.uuid4().hex}"
        with open(ctmp, "w") as f:
            f.write(str(version))
        os.replace(ctmp, self._current_path())
        return manifest

    # -- writes ---------------------------------------------------------------

    def _write_datafiles(
        self, df: DataFrame, target_partitions: int | None = None
    ) -> tuple[list[str], str]:
        ddir = os.path.join(self.root, "data", f"snap-{uuid.uuid4().hex}")
        out = df.coalesce(target_partitions) if target_partitions else df
        out.write.mode("overwrite").parquet(ddir)
        files = [
            os.path.join(ddir, f)
            for f in os.listdir(ddir)
            if f.endswith(".parquet")
        ]
        return files, df.schema.json()

    def append(
        self, df: DataFrame, summary: dict | None = None,
        target_partitions: int | None = None,
    ) -> dict:
        files, schema_json = self._write_datafiles(df, target_partitions)
        cur = self.current_snapshot()
        all_files = (cur["files"] if cur else []) + files
        summary = dict(summary or {})
        # row count from parquet FOOTERS (driver-side metadata read, no
        # Spark job) — lets the engine know wave sizes without count()s
        summary.setdefault("rows", _footer_rows(files))
        return self._commit(all_files, summary, schema_json,
                            delta_files=files)

    def read_delta(self, spark: SparkSession, manifest: dict) -> DataFrame:
        """Read only the datafiles a specific append introduced — a
        lineage-free handle on that snapshot's delta."""
        files = manifest.get("delta_files") or manifest["files"]
        if not files:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(manifest["schema"]))
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*files)

    def overwrite(self, df: DataFrame, summary: dict | None = None) -> dict:
        files, schema_json = self._write_datafiles(df)
        return self._commit(files, summary or {}, schema_json)

    # -- reads ----------------------------------------------------------------

    def _read_manifest(self, spark: SparkSession, m: dict | None) -> DataFrame:
        if m is None or not m["files"]:
            if m is not None and m.get("schema"):
                from pyspark.sql.types import StructType

                schema = StructType.fromJson(json.loads(m["schema"]))
                return spark.createDataFrame([], schema)
            raise ValueError(f"table {self.root} has no snapshots yet")
        return spark.read.parquet(*m["files"])

    def read(self, spark: SparkSession) -> DataFrame:
        return self._read_manifest(spark, self.current_snapshot())

    def read_at(self, spark: SparkSession, version: int) -> DataFrame:
        return self._read_manifest(spark, self._manifest(version))

    def exists(self) -> bool:
        return self.current_version() > 0

    def rollback_to(self, version: int) -> None:
        """Point CURRENT back at an older snapshot (crash-recovery: discard
        a partially-committed wave's later tables)."""
        if version > self.current_version():
            raise ValueError("cannot roll forward")
        ctmp = self._current_path() + f".tmp-{uuid.uuid4().hex}"
        with open(ctmp, "w") as f:
            f.write(str(version))
        os.replace(ctmp, self._current_path())

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
