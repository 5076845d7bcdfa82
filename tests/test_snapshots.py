"""Tests for the manifest-based snapshot table format."""

from __future__ import annotations

import json
import os
import threading

import pytest

from nibbler_spark.operators.snapshots import (
    _commit,
    commit_snapshot,
    latest_snapshot,
    merge_into_snapshot,
    prune_entries,
    read_changes,
    read_snapshot,
    read_snapshot_pruned,
    snapshot_entries,
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


def test_manifest_entries_carry_column_stats(spark, tmp_path):
    table = str(tmp_path / "t3")
    os.makedirs(table)
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (5, None, "m"), (9, 30.0, "z")],
        "k long, v double, s string",
    )
    sid = write_snapshot(df.coalesce(1), table)
    entries = snapshot_entries(table, sid)
    assert len(entries) == 1
    e = entries[0]
    assert e["rows"] == 3
    assert e["columns"]["k"] == {"min": 1, "max": 9, "nulls": 0}
    assert e["columns"]["v"] == {"min": 10.0, "max": 30.0, "nulls": 1}
    assert e["columns"]["s"]["min"] == "a" and e["columns"]["s"]["max"] == "z"


def test_prune_entries_matches_brute_force():
    entries = [
        {"path": "f1", "rows": 10, "columns": {"k": {"min": 0, "max": 9, "nulls": 0}}},
        {"path": "f2", "rows": 10, "columns": {"k": {"min": 10, "max": 19, "nulls": 2}}},
        {"path": "f3", "rows": 10, "columns": {"k": {"min": 20, "max": 29, "nulls": 0}}},
        {"path": "f4", "rows": 5, "columns": {"k": {"min": None, "max": None, "nulls": 5}}},
        {"path": "f5", "rows": 5, "columns": {}},  # no stats: never pruned
    ]

    def surviving(filters):
        return [e["path"] for e in prune_entries(entries, filters)]

    assert surviving([("k", ">=", 15)]) == ["f2", "f3", "f5"]
    assert surviving([("k", "<", 10)]) == ["f1", "f5"]
    assert surviving([("k", "=", 10)]) == ["f2", "f5"]
    assert surviving([("k", ">", 9), ("k", "<=", 19)]) == ["f2", "f5"]
    assert surviving([("k", ">=", 30)]) == ["f5"]
    # boundary inclusivity
    assert surviving([("k", ">", 29)]) == ["f5"]
    assert surviving([("k", ">=", 29)]) == ["f3", "f5"]
    assert surviving([("k", "<", 0)]) == ["f5"]
    assert surviving([("k", "<=", 0)]) == ["f1", "f5"]
    # unknown column: nothing pruned
    assert surviving([("z", ">=", 1)]) == ["f1", "f2", "f3", "f4", "f5"]


def test_read_snapshot_pruned_skips_files_and_keeps_results(spark, tmp_path):
    table = str(tmp_path / "t4")
    os.makedirs(table)
    df = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
    sid = write_snapshot(df.repartitionByRange(8, "k"), table)
    got, scanned, total = read_snapshot_pruned(
        spark, table, sid, filters=[("k", ">=", 100), ("k", "<", 200)]
    )
    assert total == 8
    assert scanned < total  # data skipping actually happened
    rows = sorted(r["k"] for r in got.collect())
    assert rows == list(range(100, 200))
    # empty-result pruning keeps schema
    got2, scanned2, _ = read_snapshot_pruned(
        spark, table, sid, filters=[("k", ">=", 10_000)]
    )
    assert got2.columns == ["k", "v"] and got2.count() == 0
    assert scanned2 == 0


def test_commit_is_put_if_absent(tmp_path):
    table = str(tmp_path / "t5")
    _commit(table, 0, [{"path": "a", "rows": 1, "columns": {}}])
    with pytest.raises(FileExistsError):
        _commit(table, 0, [{"path": "b", "rows": 1, "columns": {}}])
    # the loser did NOT clobber the winner
    assert snapshot_files(table, 0) == ["a"]
    # and no tmp files linger from either attempt
    mdir = os.path.join(table, "_manifests")
    assert [f for f in os.listdir(mdir) if f.endswith(".tmp")] == []


def test_concurrent_commits_never_lose_an_update(tmp_path):
    table = str(tmp_path / "t6")
    n = 8
    barrier = threading.Barrier(n)
    ids = [None] * n

    def committer(i):
        barrier.wait()
        ids[i] = commit_snapshot(
            table, [{"path": f"file-{i}", "rows": 1, "columns": {}}]
        )

    threads = [threading.Thread(target=committer, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every writer won a distinct snapshot id; every manifest survives
    assert sorted(ids) == list(range(n))
    committed = {snapshot_files(table, s)[0] for s in range(n)}
    assert committed == {f"file-{i}" for i in range(n)}


def test_v1_manifest_list_still_readable(spark, tmp_path):
    table = str(tmp_path / "t7")
    os.makedirs(table)
    df = spark.createDataFrame([(1, 10.0)], "k long, v double")
    sid = write_snapshot(df.coalesce(1), table)
    # rewrite the manifest in the round-3 v1 format (bare path list)
    mpath = os.path.join(table, "_manifests", f"{sid}.json")
    files = snapshot_files(table, sid)
    os.unlink(mpath)
    with open(mpath, "w") as fh:
        json.dump(files, fh)
    assert snapshot_files(table, sid) == files
    assert [e["columns"] for e in snapshot_entries(table, sid)] == [{}]
    assert read_snapshot(spark, table, sid).collect()[0]["v"] == 10.0
    # filters still correct (no stats → no skipping, predicate applied)
    got, scanned, total = read_snapshot_pruned(
        spark, table, sid, filters=[("k", ">=", 2)]
    )
    assert (scanned, total) == (1, 1) and got.count() == 0


def test_merge_into_snapshot_cow(spark, tmp_path):
    table = str(tmp_path / "t8")
    os.makedirs(table)
    # two deterministic files: keys 0-4 and 5-9
    lo = spark.createDataFrame([(k, float(k)) for k in range(5)], "k long, v double")
    hi = spark.createDataFrame([(k, float(k)) for k in range(5, 10)], "k long, v double")
    s0 = write_snapshot(lo.coalesce(1), table)
    s1 = write_snapshot(hi.coalesce(1), table, carry_over=snapshot_files(table, s0))
    # changes touch ONLY the low file: update k=1, delete k=3,
    # insert k=100; U on absent key 42 and I on present key 7 are no-ops
    changes = spark.createDataFrame(
        [(1, "U", 111.0), (3, "D", None), (100, "I", 100.0),
         (42, "U", 420.0), (7, "I", 777.0)],
        "k long, op string, v double",
    )
    s2 = merge_into_snapshot(spark, table, changes, key="k", value_cols=["v"])
    got = sorted((r["k"], r["v"]) for r in read_snapshot(spark, table, s2).collect())
    expect = [(0, 0.0), (1, 111.0), (2, 2.0), (4, 4.0)] + [
        (k, float(k)) for k in range(5, 10)
    ] + [(100, 100.0)]
    assert got == sorted(expect)
    # copy-on-write: the hi file was carried over untouched
    f1, f2 = set(snapshot_files(table, s1)), set(snapshot_files(table, s2))
    carried = f1 & f2
    assert len(carried) == 1
    hi_rows = sorted(
        r["k"] for r in spark.read.parquet(
            os.path.join(table, next(iter(carried)))
        ).collect()
    )
    assert hi_rows == list(range(5, 10))
    # CDC feed of the merge = post-image of rewritten file + inserts
    feed = sorted((r["k"], r["v"]) for r in read_changes(spark, table, s1, s2).collect())
    assert feed == [(0, 0.0), (1, 111.0), (2, 2.0), (4, 4.0), (100, 100.0)]
    # old snapshots still time-travel readable
    assert sorted(r["k"] for r in read_snapshot(spark, table, s1).collect()) == list(range(10))


def test_merge_into_snapshot_no_touched_files(spark, tmp_path):
    """Insert-only merge: no file rewritten, base file carried over."""
    table = str(tmp_path / "t9")
    os.makedirs(table)
    base = spark.createDataFrame([(1, 1.0)], "k long, v double")
    s0 = write_snapshot(base.coalesce(1), table)
    changes = spark.createDataFrame([(9, "I", 9.0)], "k long, op string, v double")
    s1 = merge_into_snapshot(spark, table, changes, key="k", value_cols=["v"])
    assert set(snapshot_files(table, s0)) < set(snapshot_files(table, s1))
    got = sorted((r["k"], r["v"]) for r in read_snapshot(spark, table, s1).collect())
    assert got == [(1, 1.0), (9, 9.0)]


def test_compaction_preserves_contents_and_shrinks_files(spark, tmp_path):
    from nibbler_spark.operators.snapshots import compact_snapshot

    table = str(tmp_path / "t10")
    os.makedirs(table)
    df = spark.range(0, 100).selectExpr("id AS k", "id * 1.5 AS v")
    s0 = write_snapshot(df.repartition(8), table)
    assert len(snapshot_files(table, s0)) == 8
    s1 = compact_snapshot(spark, table, target_files=2)
    assert len(snapshot_files(table, s1)) == 2
    pre = sorted(r["k"] for r in read_snapshot(spark, table, s0).collect())
    post = sorted(r["k"] for r in read_snapshot(spark, table, s1).collect())
    assert pre == post == list(range(100))
    # pre-compaction snapshot still time-travel readable
    assert read_snapshot(spark, table, s0).count() == 100


def test_vacuum_reclaims_only_unreferenced_files(spark, tmp_path):
    from nibbler_spark.operators.snapshots import vacuum_snapshots

    table = str(tmp_path / "t11")
    os.makedirs(table)
    df0 = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    s0 = write_snapshot(df0.coalesce(1), table)
    # COW rewrite: replace the file entirely
    from pyspark.sql import functions as F

    s1 = write_snapshot(df0.withColumn("v", F.col("v") * 10).coalesce(1), table)
    old_files = snapshot_files(table, s0)
    deleted = vacuum_snapshots(table, keep_from=s1)
    assert deleted == old_files  # the rewritten-away file is reclaimed
    for p in deleted:
        assert not os.path.exists(os.path.join(table, p))
    # retained snapshot unaffected
    got = sorted((r["k"], r["v"]) for r in read_snapshot(spark, table, s1).collect())
    assert got == [(1, 10.0), (2, 20.0)]
    # expired snapshot no longer resolvable
    with pytest.raises(FileNotFoundError):
        snapshot_files(table, s0)


def test_vacuum_keeps_files_shared_with_retained_snapshots(spark, tmp_path):
    from nibbler_spark.operators.snapshots import vacuum_snapshots

    table = str(tmp_path / "t12")
    os.makedirs(table)
    base = spark.createDataFrame([(1, 1.0)], "k long, v double")
    s0 = write_snapshot(base.coalesce(1), table)
    shared = snapshot_files(table, s0)
    extra = spark.createDataFrame([(2, 2.0)], "k long, v double")
    s1 = write_snapshot(extra.coalesce(1), table, carry_over=shared)
    deleted = vacuum_snapshots(table, keep_from=s1)
    assert deleted == []  # s0's file is still referenced by s1
    assert read_snapshot(spark, table, s1).count() == 2


def test_idempotent_append_dedupes_by_txn_id(spark, tmp_path):
    from nibbler_spark.operators.snapshots import idempotent_append

    table = str(tmp_path / "t13")
    os.makedirs(table)
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    s0, c0 = idempotent_append(spark, table, df, "epoch-0")
    assert c0 is True
    # retry of the SAME epoch (crash between commit and checkpoint)
    s0b, c0b = idempotent_append(spark, table, df, "epoch-0")
    assert (s0b, c0b) == (s0, False)
    assert read_snapshot(spark, table).count() == 1  # no duplicate rows
    # next epoch appends on top
    df2 = spark.createDataFrame([(2, 2.0)], "k long, v double")
    s1, c1 = idempotent_append(spark, table, df2, "epoch-1")
    assert c1 is True and s1 == s0 + 1
    assert read_snapshot(spark, table).count() == 2


def test_bloom_skipping_prunes_and_preserves_results(spark, tmp_path):
    """Bloom bitsets: absent values prune files (up to false positives),
    present values never do (no false negatives — the Bloom contract),
    and carried-over entries keep their blooms across commits without
    re-reading footers."""
    from nibbler_spark.operators.snapshots import (
        prune_entries,
        snapshot_entries,
        snapshot_files,
        write_snapshot,
    )

    table = str(tmp_path / "bloomtab")
    df = spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS v")
    sid = write_snapshot(
        df.repartition(4, "k"), table, bloom_cols=["k"], bloom_m=1 << 14
    )
    entries = snapshot_entries(table, sid)
    assert all("blooms" in e for e in entries)
    # no false negatives: every present key keeps >= 1 file, and the
    # kept set must include the file that truly holds the key
    for k in (0, 17, 999, 1999):
        kept = prune_entries(entries, [("k", "=", k)])
        assert kept, k
    # absent keys prune to (almost always) zero files at this sizing
    misses = [prune_entries(entries, [("k", "=", k)]) for k in range(3000, 3050)]
    assert sum(len(m) for m in misses) <= 8  # ~4 files * 50 probes * fp%
    # carry-over preserves blooms verbatim (no footer re-read, no loss)
    sid2 = write_snapshot(
        spark.range(5000, 5100).selectExpr("id AS k", "id * 2 AS v"),
        table,
        carry_over=snapshot_files(table, sid),
        bloom_cols=["k"],
        bloom_m=1 << 14,
    )
    e2 = {e["path"]: e for e in snapshot_entries(table, sid2)}
    for e in entries:
        assert e2[e["path"]]["blooms"] == e["blooms"]


def test_deletion_vectors_lifecycle(spark, tmp_path):
    """DV semantics the query flags can't fully state: deleting an
    already-deleted row is a no-op on the result, DV application
    composes with stats pruning + filters, and time travel BETWEEN the
    two deletes sees exactly the first delete."""
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        delete_from_snapshot,
        read_snapshot,
        write_snapshot,
    )

    table = str(tmp_path / "dvtab")
    df = spark.range(0, 1000).selectExpr("id AS k", "id % 10 AS grp")
    write_snapshot(df.repartitionByRange(4, "k"), table)
    s1 = delete_from_snapshot(spark, table, F.col("grp") == 3)
    assert read_snapshot(spark, table, s1).count() == 900
    # overlapping re-delete: grp 3 already gone, grp 4 newly gone
    s2 = delete_from_snapshot(spark, table, F.col("grp").isin(3, 4))
    assert read_snapshot(spark, table, s2).count() == 800
    # time travel between deletes
    assert read_snapshot(spark, table, s1).count() == 900
    # DV + stats pruning + residual filter compose
    got = read_snapshot(
        spark, table, s2, filters=[("k", ">=", 500), ("k", "<", 600)]
    )
    ks = sorted(r["k"] for r in got.collect())
    assert ks == [k for k in range(500, 600) if k % 10 not in (3, 4)]


def test_merge_into_respects_deletion_vectors(spark, tmp_path):
    """A MERGE on a DV-carrying table must not resurrect masked rows
    when it rewrites a touched file, and a DV-deleted key must be
    insertable again (it is NOT MATCHED in the MoR view)."""
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        delete_from_snapshot,
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    table = str(tmp_path / "dvmerge")
    df = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    write_snapshot(df.repartitionByRange(2, "k"), table)
    # mask k in [10, 20)
    delete_from_snapshot(
        spark, table, (F.col("k") >= 10) & (F.col("k") < 20)
    )
    changes = spark.createDataFrame(
        [(5, "U", 500.0), (15, "I", 150.0), (60, "D", None)],
        "k LONG, op STRING, v DOUBLE",
    )
    sid = merge_into_snapshot(spark, table, changes, key="k", value_cols=["v"])
    got = {r["k"]: r["v"] for r in read_snapshot(spark, table, sid).collect()}
    # masked rows stay gone even though their file was rewritten for k=5
    assert all(k not in got for k in range(10, 20) if k != 15)
    assert got[5] == 500.0  # update applied
    assert got[15] == 150.0  # re-insert of a DV-deleted key works
    assert 60 not in got  # merge delete
    assert len(got) == 100 - 10 - 1 + 1


@pytest.mark.parametrize("seed", [20260814, 7, 99991])
def test_snapshot_format_model_based_random_ops(spark, tmp_path, seed):
    """Model-based check of the whole table-format surface: a random
    (seeded) sequence of append / DV-delete / MoR-update / merge /
    compact / rollback / orphan-clean / RENAME operations runs against
    BOTH the real format and a plain in-memory dict model; after every
    op the snapshot read must equal the model exactly (including the
    logical column name), and at the end every historical snapshot id
    must still resolve."""
    import random

    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        delete_from_snapshot,
        latest_snapshot,
        merge_into_snapshot,
        read_snapshot,
        snapshot_files,
        update_snapshot_mor,
        write_snapshot,
    )

    rng = random.Random(seed)
    table = str(tmp_path / "modeltab")
    model: dict[int, int] = {}
    # the value column's LOGICAL name — renames re-point it; the
    # physical on-disk name stays "v" forever (writers emit physical)
    vcol = "v"

    def commit_append(lo: int, hi: int) -> None:
        rows = [(k, k * 10) for k in range(lo, hi)]
        df = spark.createDataFrame(rows, "k LONG, v LONG")
        last = latest_snapshot(table)
        carry = snapshot_files(table, last) if last >= 0 else []
        write_snapshot(df.repartition(2), table, carry_over=carry)
        model.update(dict(rows))

    def check() -> None:
        cur = read_snapshot(spark, table)
        assert set(cur.columns) == {"k", vcol}, (cur.columns, vcol)
        got = {r["k"]: r[vcol] for r in cur.collect()}
        assert got == model, (
            f"divergence: {len(got)} real vs {len(model)} model rows; "
            f"sample diff {dict(list((got.items() ^ model.items()))[:5])}"
        )

    # some ops commit >1 snapshot (MoR update = DV-delete + append), so
    # the model history maps REAL snapshot ids -> (state, logical name),
    # and rollback only ever targets a recorded id
    history: dict[int, tuple[dict[int, int], str]] = {}

    def snap() -> None:
        history[latest_snapshot(table)] = (dict(model), vcol)

    commit_append(0, 200)
    snap()
    check()
    for step in range(9):
        op = rng.choice(
            ["append", "delete", "update", "merge", "compact",
             "rollback", "orphans", "rename"]
        )
        if op == "append":
            base = 1000 * (step + 1)
            commit_append(base, base + rng.randrange(20, 60))
        elif op == "delete":
            m = rng.randrange(3, 9)
            r = rng.randrange(m)
            delete_from_snapshot(spark, table, F.col("k") % m == r)
            model = {k: v for k, v in model.items() if k % m != r}
        elif op == "update":
            m = rng.randrange(3, 9)
            r = rng.randrange(m)
            update_snapshot_mor(
                spark,
                table,
                F.col("k") % m == r,
                {vcol: F.col(vcol) + 7},
            )
            model = {
                k: (v + 7 if k % m == r else v) for k, v in model.items()
            }
        elif op == "merge":
            keys = sorted(model)
            upd = [k for k in keys if k % 5 == 1][:10]
            dels = [k for k in keys if k % 5 == 2][:10]
            ins_base = 50_000 + step * 100
            ins = list(range(ins_base, ins_base + 5))
            changes = spark.createDataFrame(
                [(k, "U", k * 10 + 1) for k in upd]
                + [(k, "D", None) for k in dels]
                + [(k, "I", k * 10) for k in ins],
                f"k LONG, op STRING, {vcol} LONG",
            )
            merge_into_snapshot(
                spark, table, changes, key="k", value_cols=[vcol]
            )
            for k in upd:
                model[k] = k * 10 + 1
            for k in dels:
                model.pop(k, None)
            for k in ins:
                model[k] = k * 10
        elif op == "compact":
            from nibbler_spark.operators.snapshots import compact_snapshot

            compact_snapshot(spark, table, target_files=2)
        elif op == "rollback":
            from nibbler_spark.operators.snapshots import rollback_snapshot

            target = rng.choice(sorted(history))
            rollback_snapshot(table, target)
            model, vcol = dict(history[target][0]), history[target][1]
        elif op == "rename":
            from nibbler_spark.operators.snapshots import rename_columns

            new = f"v_{step}"
            rename_columns(table, {vcol: new})
            vcol = new  # values unchanged; only the logical name moves
        else:  # orphans: plant an uncommitted dir, clean it, no-op on state
            import os as _os

            from nibbler_spark.operators.snapshots import (
                remove_orphan_files,
            )

            orphan = _os.path.join(table, "data-orphan%04d" % step)
            spark.createDataFrame(
                [(1, 1)], "k LONG, v LONG"
            ).write.mode("overwrite").parquet(orphan)
            removed = remove_orphan_files(table)
            assert any(r.startswith("data-orphan") for r in removed)
        snap()
        check()
    # every historical snapshot still resolves (nothing vacuumed here)
    for sid in range(latest_snapshot(table) + 1):
        assert snapshot_files(table, sid) is not None


def test_rollback_preserves_history_and_refs_move_atomically(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        get_ref,
        read_ref,
        read_snapshot,
        rollback_snapshot,
        set_ref,
        snapshot_files,
        snapshot_meta,
        write_snapshot,
    )
    from nibbler_spark.sources import load_table

    table = tempfile.mkdtemp(prefix="nibbler-rbt-")
    shutil.rmtree(table)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    s1 = write_snapshot(o, table)
    s2 = write_snapshot(o.where(F.col("o_orderkey") % 3 == 0), table)
    s3 = rollback_snapshot(table, s1)
    assert snapshot_files(table, s3) == snapshot_files(table, s1)
    assert snapshot_meta(table, s3) == {
        "operation": "rollback",
        "rolled_back_to": s1,
    }
    # the bad snapshot remains readable for forensics
    n_full = read_snapshot(spark, table, s1).count()
    assert read_snapshot(spark, table, s2).count() < n_full
    assert read_snapshot(spark, table, s3).count() == n_full

    assert get_ref(table, "main") is None
    set_ref(table, "main", s1)
    assert get_ref(table, "main") == s1
    set_ref(table, "main", s3)
    assert get_ref(table, "main") == s3
    assert read_ref(spark, table, "main").count() == n_full
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_ref(spark, table, "nope")


def test_vacuum_on_shallow_clone_never_touches_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        clone_snapshot,
        read_snapshot,
        snapshot_files,
        vacuum_snapshots,
        write_snapshot,
    )

    src = str(tmp_path / "src")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_snapshot(df.repartition(2), src)
    clone = str(tmp_path / "clone")
    clone_snapshot(src, clone, 0, deep=False)
    # advance the clone so snapshot 0 becomes vacuum-eligible
    write_snapshot(spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ), clone)
    removed = vacuum_snapshots(clone, keep_from=1)
    assert removed == []  # all candidates were source-owned
    # the SOURCE table must be fully intact
    assert read_snapshot(spark, src, 0).count() == 100
    import os

    for rel in snapshot_files(src, 0):
        assert os.path.exists(os.path.join(src, rel))


def test_rename_columns_is_metadata_only_and_composes(spark, tmp_path):
    """Two successive renames compose to one logical→ORIGINAL-physical
    mapping; no commit rewrites a data file; filters keep pruning
    through the rename."""
    from nibbler_spark.operators.snapshots import (
        read_snapshot,
        read_snapshot_pruned,
        rename_columns,
        snapshot_files,
        snapshot_meta,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    # two files with disjoint k ranges so pruning has something to skip
    s0 = write_snapshot(df.where("k < 50").coalesce(1), table)
    s0b = write_snapshot(
        df.where("k >= 50").coalesce(1),
        table,
        carry_over=snapshot_files(table, s0),
    )
    s1 = rename_columns(table, {"v": "val"})
    s2 = rename_columns(table, {"val": "amount"})
    assert snapshot_files(table, s0b) == snapshot_files(table, s2)
    assert snapshot_meta(table, s2)["column_mapping"] == {"amount": "v"}
    cur = read_snapshot(spark, table, s2)
    assert set(cur.columns) == {"k", "amount"}
    # pruning on the ORIGINAL physical stats still works via logical k
    _, scanned, total = read_snapshot_pruned(
        spark, table, filters=[("k", "<", 10)]
    )
    assert total == 2 and scanned == 1
    # time travel before the rename serves the old logical name
    assert set(read_snapshot(spark, table, s1).columns) == {"k", "val"}
    assert set(read_snapshot(spark, table, s0b).columns) == {"k", "v"}


def test_read_row_changes_requires_cdc_commit(spark, tmp_path):
    """The row-level feed is per-commit opt-in: reading it from a plain
    commit raises instead of silently returning nothing."""
    import pytest as _pytest

    from nibbler_spark.operators.snapshots import (
        read_row_changes,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    write_snapshot(spark.range(10).selectExpr("id AS k", "id AS v"), table)
    with _pytest.raises(ValueError, match="no row-level"):
        read_row_changes(spark, table, 0)


def test_merge_cdc_feed_reconstructs_merge(spark, tmp_path):
    """Applying the row-level CDF to the pre-merge table reproduces the
    post-merge table exactly — the incremental-consumer contract."""
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        merge_into_snapshot,
        read_row_changes,
        read_snapshot,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    base = spark.range(40).selectExpr("id AS k", "id * 10 AS v")
    write_snapshot(base.repartition(2), table)
    changes = spark.createDataFrame(
        [(1, "U", 111), (2, "D", None), (100, "I", 1000)],
        "k long, op string, v long",
    )
    sid = merge_into_snapshot(
        spark, table, changes, key="k", value_cols=["v"], cdc=True
    )
    feed = read_row_changes(spark, table, sid)
    pre = read_snapshot(spark, table, sid - 1)
    retract = feed.where(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select("k")
    apply_rows = feed.where(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("k", "v")
    reconstructed = (
        pre.join(retract, "k", "left_anti").unionByName(apply_rows)
    )
    post = read_snapshot(spark, table, sid)
    assert sorted(map(tuple, reconstructed.collect())) == sorted(
        map(tuple, post.collect())
    )


def test_merge_and_append_survive_column_rename(spark, tmp_path):
    """The full interplay the mapping must survive: rename → append
    (mapping inherited, physical schema written) → MERGE with LOGICAL
    names (translated to physical, CDC feed rendered back logical) →
    reads keep serving logical names with pruning intact."""
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        merge_into_snapshot,
        read_row_changes,
        read_snapshot,
        rename_columns,
        snapshot_files,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    base = spark.range(20).selectExpr("id AS k", "id * 10 AS v")
    s0 = write_snapshot(base.coalesce(1), table)
    rename_columns(table, {"v": "amount"})
    # append AFTER the rename: physical schema on disk, logical on read
    extra = spark.range(20, 30).selectExpr("id AS k", "id * 10 AS v")
    s2 = write_snapshot(
        extra.coalesce(1),
        table,
        carry_over=snapshot_files(table, s0),
    )
    cur = read_snapshot(spark, table, s2)
    assert set(cur.columns) == {"k", "amount"}
    assert cur.count() == 30
    # MERGE speaks the logical name end-to-end
    changes = spark.createDataFrame(
        [(5, "U", 999), (25, "D", None), (100, "I", 1)],
        "k long, op string, amount long",
    )
    sid = merge_into_snapshot(
        spark, table, changes, key="k", value_cols=["amount"], cdc=True
    )
    post = read_snapshot(spark, table, sid)
    assert set(post.columns) == {"k", "amount"}
    got = {r["k"]: r["amount"] for r in post.collect()}
    assert got[5] == 999 and 25 not in got and got[100] == 1
    feed = read_row_changes(spark, table, sid)
    assert set(feed.columns) == {"k", "amount", "_change_type"}
    kinds = {
        (r["_change_type"], r["k"]) for r in feed.collect()
    }
    assert ("update_postimage", 5) in kinds
    assert ("delete", 25) in kinds and ("insert", 100) in kinds


def test_compact_and_mor_update_write_physical_schema_after_rename(
    spark, tmp_path
):
    """Compaction and MoR update read the LOGICAL view but must write
    PHYSICAL column names — otherwise post-rename files lack the
    physical column every mapped read and stats filter targets."""
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        compact_snapshot,
        read_snapshot,
        read_snapshot_pruned,
        rename_columns,
        update_snapshot_mor,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    base = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    write_snapshot(base.repartition(4), table)
    rename_columns(table, {"v": "amount"})
    update_snapshot_mor(
        spark, table, F.col("k") == 7, {"amount": F.lit(777).cast("long")}
    )
    compact_snapshot(spark, table, target_files=2)
    cur = read_snapshot(spark, table)
    assert set(cur.columns) == {"k", "amount"}
    got = {r["k"]: r["amount"] for r in cur.collect()}
    assert got[7] == 777 and got[3] == 6 and len(got) == 100
    # stats filters on the logical name still resolve (physical col
    # exists in the compacted files, so the translated filter applies)
    df, scanned, total = read_snapshot_pruned(
        spark, table, filters=[("amount", ">", 150)]
    )
    assert df.count() == sum(1 for k in got if got[k] > 150)


def test_rollback_preserves_column_mapping(spark, tmp_path):
    """Rolling back to a post-rename snapshot keeps the renamed
    logical schema (the mapping is table state, like DVs)."""
    from nibbler_spark.operators.snapshots import (
        read_snapshot,
        rename_columns,
        rollback_snapshot,
        snapshot_files,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    write_snapshot(
        spark.range(10).selectExpr("id AS k", "id AS v"), table
    )  # s0
    s1 = rename_columns(table, {"v": "amount"})
    write_snapshot(
        spark.range(10, 20).selectExpr("id AS k", "id AS v"),
        table,
        carry_over=snapshot_files(table, s1),
    )  # s2 (appends physical, inherits mapping)
    rollback_snapshot(table, s1)  # back to the 10-row renamed state
    cur = read_snapshot(spark, table)
    assert set(cur.columns) == {"k", "amount"}
    assert cur.count() == 10


def test_clone_preserves_deletion_vectors_and_mapping(spark, tmp_path):
    """A clone (shallow AND deep) of a table with MoR deletes and a
    rename must not resurrect deleted rows nor revert logical names."""
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        clone_snapshot,
        delete_from_snapshot,
        latest_snapshot,
        read_snapshot,
        rename_columns,
        write_snapshot,
    )

    import shutil

    src = str(tmp_path / "src")
    write_snapshot(
        spark.range(30).selectExpr("id AS k", "id * 2 AS v"), src
    )
    delete_from_snapshot(spark, src, F.col("k") < 10)
    rename_columns(src, {"v": "amount"})
    sid = latest_snapshot(src)
    for deep, name in ((False, "shallow"), (True, "deep")):
        dst = str(tmp_path / f"clone_{name}")
        clone_snapshot(src, dst, sid, deep=deep)
        got = read_snapshot(spark, dst)
        assert set(got.columns) == {"k", "amount"}, name
        keys = {r["k"] for r in got.collect()}
        assert keys == set(range(10, 30)), (name, sorted(keys)[:5])
    # deep clone survives source deletion
    shutil.rmtree(src)
    survivors = read_snapshot(spark, str(tmp_path / "clone_deep"))
    assert survivors.count() == 20


def test_replace_where_constraint_aborts_and_dv_interplay(spark, tmp_path):
    """replaceWhere: (1) replacement rows outside the predicate abort
    pre-manifest; (2) replacing over a deletion-vector table must not
    resurrect MoR-deleted rows in the rewritten region."""
    from pyspark.sql import functions as F

    from nibbler_spark.operators.snapshots import (
        SnapshotConstraintError,
        delete_from_snapshot,
        latest_snapshot,
        read_snapshot,
        replace_where_snapshot,
        write_snapshot,
    )

    table = os.path.join(str(tmp_path), "rw")
    df = spark.createDataFrame(
        [(i, "A" if i < 50 else "B", i * 10) for i in range(100)],
        "id long, seg string, v long",
    )
    write_snapshot(df.coalesce(1), table)

    # (1) constraint: new rows must satisfy the predicate
    bad = spark.createDataFrame(
        [(999, "B", 1)], "id long, seg string, v long"
    )
    before = latest_snapshot(table)
    with pytest.raises(SnapshotConstraintError):
        replace_where_snapshot(spark, table, "seg", "=", "A", bad)
    assert latest_snapshot(table) == before  # no manifest appeared

    # (2) MoR delete id=10 (an A row), then replace the A segment —
    # the rewrite must go through the DV view
    delete_from_snapshot(spark, table, F.col("id") == 10)
    new_a = spark.createDataFrame(
        [(i, "A", i * 1000) for i in range(5)],
        "id long, seg string, v long",
    )
    replace_where_snapshot(spark, table, "seg", "=", "A", new_a)
    back = read_snapshot(spark, table)
    rows = {r["id"]: (r["seg"], r["v"]) for r in back.collect()}
    assert len([k for k, (s, _) in rows.items() if s == "A"]) == 5
    assert rows[3] == ("A", 3000)
    assert 10 not in rows  # the DV-deleted row did not resurrect
    assert rows[60] == ("B", 600)  # B region untouched


def test_replace_where_prunes_untouched_files(spark, tmp_path):
    from nibbler_spark.operators.snapshots import (
        latest_snapshot,
        replace_where_snapshot,
        snapshot_entries,
        snapshot_files,
        write_snapshot,
    )

    table = os.path.join(str(tmp_path), "rwp")
    carry = []
    for seg in ("A", "B", "C"):
        df = spark.createDataFrame(
            [(i, seg, i) for i in range(20)], "id long, seg string, v long"
        )
        sid = write_snapshot(df.coalesce(1), table, carry_over=carry)
        carry = snapshot_files(table, sid)
    base_files = set(snapshot_files(table, latest_snapshot(table)))
    new_b = spark.createDataFrame(
        [(0, "B", 123)], "id long, seg string, v long"
    )
    sid = replace_where_snapshot(spark, table, "seg", "=", "B", new_b)
    after = snapshot_entries(table, sid)
    carried = [e["path"] for e in after if e["path"] in base_files]
    # A and C files carried untouched; only B was rewritten
    assert len(carried) == 2


def _race_committer(table: str, worker: int, rounds: int, out_path: str, barrier):
    """Module-level worker for the multi-process commit race (spawn-
    picklable).  Records (latest-before, won-id) per round so the parent
    can count OBSERVED collisions (won > latest+1 means another process
    claimed an id first and this writer retried onto a later one).  The
    barrier aligns the two processes past their interpreter start-up so
    the commit loops genuinely overlap."""
    import json as _json

    from nibbler_spark.operators.snapshots import (
        commit_snapshot as _cs,
        latest_snapshot as _ls,
    )

    barrier.wait(timeout=120)
    results = []
    for r in range(rounds):
        before = _ls(table)
        won = _cs(
            table,
            [{"path": f"w{worker}-r{r}", "rows": 1, "columns": {}}],
            meta={"worker": worker, "round": r},
        )
        results.append((before, won))
    with open(out_path, "w") as fh:
        _json.dump(results, fh)


def test_multiprocess_commit_race_no_lost_updates(tmp_path):
    """r4 verdict #3: the put-if-absent commit under TRUE filesystem
    concurrency — two separate OS processes hammer one table with 50
    commits each (no GIL serialization, unlike the thread test above).
    Invariants: all 100 commits survive (no lost updates), snapshot ids
    are exactly 0..99 (contiguous, each won by exactly one writer), and
    at least one genuine collision-retry was observed (a writer's won
    id exceeded latest+1 at its read — the loser landing on N+1)."""
    import multiprocessing as mp

    table = str(tmp_path / "race")
    rounds = 50
    outs = [str(tmp_path / f"out-{w}.json") for w in range(2)]
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    procs = [
        ctx.Process(
            target=_race_committer,
            args=(table, w, rounds, outs[w], barrier),
        )
        for w in range(2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=300)
        assert p.exitcode == 0
    per_worker = [json.load(open(o)) for o in outs]
    all_won = [won for res in per_worker for (_b, won) in res]
    # no lost updates: 100 distinct contiguous ids
    assert sorted(all_won) == list(range(2 * rounds))
    # every manifest readable, carrying its writer's file entry
    from nibbler_spark.operators.snapshots import snapshot_meta

    for w, res in enumerate(per_worker):
        for r, (_b, won) in enumerate(res):
            assert snapshot_files(table, won) == [f"w{w}-r{r}"]
            assert snapshot_meta(table, won)["worker"] == w
    # the race was real: somebody lost an id claim and retried onto a
    # later one (overwhelmingly likely with 2x50 interleaved commits;
    # if this ever flakes the processes never truly overlapped)
    collisions = sum(
        won > before + 1 for res in per_worker for (before, won) in res
    )
    assert collisions >= 1
