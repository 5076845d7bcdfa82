"""Tests for the manifest-based snapshot table format."""

from __future__ import annotations

import os

from nibbler_spark.operators.snapshots import (
    latest_snapshot,
    read_snapshot,
    snapshot_files,
    write_snapshot,
)


def test_append_and_cow_update_keep_old_snapshots_readable(spark, tmp_path):
    table = str(tmp_path / "t")
    os.makedirs(table)
    df0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    s0 = write_snapshot(df0, table)
    f0 = snapshot_files(table, s0)
    df1 = spark.createDataFrame([(3, 30.0)], "k long, v double")
    s1 = write_snapshot(df1, table, carry_over=f0)
    # COW: replace snapshot-0 files with doubled values, carry the rest
    carried = [f for f in snapshot_files(table, s1) if f not in f0]
    from pyspark.sql import functions as F

    s2 = write_snapshot(
        df0.withColumn("v", F.col("v") * 2), table, carry_over=carried
    )
    assert (s0, s1, s2) == (0, 1, 2)
    assert latest_snapshot(table) == 2

    def vals(sid):
        return sorted(
            (r["k"], r["v"]) for r in read_snapshot(spark, table, sid).collect()
        )

    assert vals(0) == [(1, 10.0), (2, 20.0)]
    assert vals(1) == [(1, 10.0), (2, 20.0), (3, 30.0)]
    assert vals(2) == [(1, 20.0), (2, 40.0), (3, 30.0)]
    # time travel after the rewrite: snapshot 0 is bit-identical still
    assert vals(0) == [(1, 10.0), (2, 20.0)]


def test_manifest_commit_is_atomic_rename(spark, tmp_path):
    """No .tmp manifest may survive a successful commit, and a stray
    orphaned tmp from a crashed commit is invisible to readers."""
    table = str(tmp_path / "t2")
    os.makedirs(table)
    df = spark.createDataFrame([(1,)], "k long")
    write_snapshot(df, table)
    mdir = os.path.join(table, "_manifests")
    assert [f for f in os.listdir(mdir) if f.endswith(".tmp")] == []
    # simulate a crashed commit: orphan tmp must not affect resolution
    open(os.path.join(mdir, ".1.deadbeef.tmp"), "w").write("[]")
    assert latest_snapshot(table) == 0
