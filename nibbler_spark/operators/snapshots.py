"""Manifest-based snapshot versioning (time travel) over plain parquet.

A miniature lakehouse table format in the spirit of Delta/Iceberg,
built from first principles on the two primitives every object store
offers — immutable files and an atomic rename:

- a table is a directory of immutable parquet data files plus a
  ``_manifests/`` log; manifest N is a JSON list of the data files that
  make up snapshot N;
- writes are COPY-ON-WRITE at file granularity: a new snapshot writes
  only new files and a new manifest that mixes carried-over and new
  files — old snapshots stay readable forever (time travel) because
  their files are never mutated;
- manifest commits are write-temp-then-rename, so readers always see a
  complete snapshot (the cached_dir discipline applied to a commit log);
- reads resolve a snapshot id (or latest) to its file list and load
  exactly those files — at 100 TB this read path is O(files-in-snapshot)
  driver-side metadata plus a normal parallel parquet scan.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def latest_snapshot(table_dir: str) -> int:
    """Highest committed snapshot id, or -1 for an empty table."""
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return -1
    ids = [
        int(f[:-5])
        for f in os.listdir(mdir)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(ids, default=-1)


def _commit(table_dir: str, snapshot_id: int, files: list[str]) -> None:
    mdir = _manifest_dir(table_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{snapshot_id}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(sorted(files), fh)
    os.rename(tmp, os.path.join(mdir, f"{snapshot_id}.json"))


def snapshot_files(table_dir: str, snapshot_id: int) -> list[str]:
    with open(os.path.join(_manifest_dir(table_dir), f"{snapshot_id}.json")) as fh:
        return json.load(fh)


def write_snapshot(
    df: DataFrame, table_dir: str, carry_over: list[str] | None = None
) -> int:
    """Commit a new snapshot: ``df`` becomes new immutable data files;
    ``carry_over`` names files from prior snapshots that remain part of
    the table (copy-on-write — unchanged files are referenced, not
    rewritten). Returns the new snapshot id."""
    part = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, f"data-{part}")
    df.write.mode("overwrite").parquet(data_dir)
    new_files = [
        os.path.join(f"data-{part}", f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    files = sorted((carry_over or []) + new_files)
    sid = latest_snapshot(table_dir) + 1
    _commit(table_dir, sid, files)
    return sid


def read_snapshot(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Time-travel read: load exactly the files of ``snapshot_id``
    (default: latest)."""
    sid = (
        latest_snapshot(table_dir) if snapshot_id is None else snapshot_id
    )
    files = [
        os.path.join(table_dir, f) for f in snapshot_files(table_dir, sid)
    ]
    return spark.read.parquet(*files)


def read_changes(
    spark: SparkSession, table_dir: str, from_snapshot: int, to_snapshot: int
) -> DataFrame:
    """Incremental (CDC-style) read: rows in the files ADDED between two
    snapshots. For append commits this is exactly the appended rows; for
    copy-on-write commits it is the post-image of every rewritten file —
    the standard file-granularity change feed a downstream incremental
    pipeline consumes instead of re-scanning the table."""
    before = set(snapshot_files(table_dir, from_snapshot))
    added = [
        os.path.join(table_dir, f)
        for f in snapshot_files(table_dir, to_snapshot)
        if f not in before
    ]
    if not added:
        raise ValueError(
            f"no files added between snapshots {from_snapshot} and "
            f"{to_snapshot}"
        )
    return spark.read.parquet(*added)
