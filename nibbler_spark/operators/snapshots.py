"""Manifest-based snapshot versioning (time travel) over plain parquet.

A miniature lakehouse table format in the spirit of Delta/Iceberg,
built from first principles on the two primitives every object store
offers — immutable files and an atomic create:

- a table is a directory of immutable parquet data files plus a
  ``_manifests/`` log; manifest N describes the data files that make up
  snapshot N;
- manifest entries carry per-file, per-column MIN/MAX/NULL-COUNT stats
  harvested from the parquet footers at commit time, so a filtered read
  can PRUNE the file list driver-side before the scan ever starts —
  the same data-skipping contract Iceberg manifests / Delta
  ``stats`` provide. At 100 TB this is the difference between
  scanning a snapshot and scanning the 2% of its files a predicate
  can touch;
- writes are COPY-ON-WRITE at file granularity: a new snapshot writes
  only new files and a new manifest that mixes carried-over and new
  files — old snapshots stay readable forever (time travel) because
  their files are never mutated;
- manifest commits are write-temp-then-PUT-IF-ABSENT (``os.link`` onto
  the final name, which fails if it exists): readers always see a
  complete snapshot AND two concurrent writers can never silently
  clobber each other — the loser's commit retries under the next
  snapshot id, exactly the optimistic-concurrency loop Delta/Iceberg
  run against object-store conditional puts;
- reads resolve a snapshot id (or latest) to its file list, prune it
  against the caller's predicates using the manifest stats, and load
  exactly the surviving files — O(files-in-snapshot) driver-side
  metadata plus a normal parallel parquet scan;
- :func:`merge_into_snapshot` is row-level MERGE INTO on top of the
  format: stats-prune candidate files by the change set's key
  envelope, detect the exact touched files with one key-column
  semi-join, rewrite ONLY those files, and commit rewritten + inserted
  rows as the new snapshot's added files — which makes the
  :func:`read_changes` feed of a merge commit exactly the post-image
  of the rewritten files plus the inserted rows.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_VERSION = 2


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


def _json_safe(v):
    """Parquet footer stats → JSON-storable bound values. Types we can't
    compare faithfully after a JSON roundtrip are dropped (the file is
    then simply never pruned on that column — always safe)."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        return None
    return None


def file_stats(abs_path: str) -> dict:
    """Harvest per-column min/max/null-count from a parquet footer.

    Pure metadata read (no data pages) — the commit-time cost is
    O(files) footer reads, the same work any engine's manifest writer
    does. Columns whose stats are absent or not JSON-faithful are
    omitted; pruning treats a missing column as "cannot skip"."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    rows = md.num_rows
    stats: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaves: skip, prune on top-level only
                continue
            s = col.statistics
            if s is None:
                stats[name] = {"ok": False}
                continue
            cur = stats.setdefault(
                name, {"ok": True, "min": None, "max": None, "nulls": 0}
            )
            if not cur.get("ok", False):
                continue
            nulls = s.null_count if s.has_null_count else None
            if nulls is None:
                cur["ok"] = False
                continue
            cur["nulls"] += nulls
            if s.has_min_max:
                mn, mx = _json_safe(s.min), _json_safe(s.max)
                if mn is None or mx is None:
                    # non-representable bound type: unusable unless the
                    # row group holds no values for this column at all
                    if s.num_values > 0:
                        cur["ok"] = False
                    continue
                cur["min"] = mn if cur["min"] is None else min(cur["min"], mn)
                cur["max"] = mx if cur["max"] is None else max(cur["max"], mx)
            elif nulls < g.num_rows:
                cur["ok"] = False  # values exist but no bounds → can't skip
    out = {}
    for name, cur in stats.items():
        if cur.get("ok"):
            out[name] = {
                "min": cur["min"],
                "max": cur["max"],
                "nulls": cur["nulls"],
            }
    return {"rows": rows, "columns": out}


def _entry(table_dir: str, rel_path: str) -> dict:
    st = file_stats(os.path.join(table_dir, rel_path))
    return {"path": rel_path, **st}


def _commit(
    table_dir: str,
    snapshot_id: int,
    entries: list[dict],
    meta: dict | None = None,
) -> None:
    """Atomic PUT-IF-ABSENT commit of one manifest.

    ``os.link(tmp, final)`` fails with FileExistsError when the target
    manifest already exists — unlike ``os.rename``, which on POSIX
    silently replaces it and would let two concurrent writers both
    "win" snapshot N with one commit lost. Raises FileExistsError to
    the caller, who retries under the next id (optimistic concurrency).

    ``meta`` is application metadata stored in the manifest (e.g. a
    transaction id for idempotent streaming commits — the Delta
    ``txn appId/version`` pattern).
    """
    mdir = _manifest_dir(table_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{snapshot_id}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": MANIFEST_VERSION,
                "meta": meta or {},
                "files": sorted(entries, key=lambda e: e["path"]),
            },
            fh,
        )
    try:
        os.link(tmp, os.path.join(mdir, f"{snapshot_id}.json"))
    finally:
        os.unlink(tmp)


def commit_snapshot(
    table_dir: str, entries: list[dict], meta: dict | None = None
) -> int:
    """Commit ``entries`` as the next snapshot, retrying on collision:
    if another writer claims snapshot N first, this commit lands at
    N+1 (or later) — no commit is ever silently lost."""
    while True:
        sid = latest_snapshot(table_dir) + 1
        try:
            _commit(table_dir, sid, entries, meta)
            return sid
        except FileExistsError:
            continue


def snapshot_meta(table_dir: str, snapshot_id: int) -> dict:
    """Application metadata stored with a snapshot's commit (empty for
    v1 manifests)."""
    with open(
        os.path.join(_manifest_dir(table_dir), f"{snapshot_id}.json")
    ) as fh:
        doc = json.load(fh)
    if isinstance(doc, list):
        return {}
    return doc.get("meta", {})


def _load_manifest(table_dir: str, snapshot_id: int) -> list[dict]:
    with open(
        os.path.join(_manifest_dir(table_dir), f"{snapshot_id}.json")
    ) as fh:
        doc = json.load(fh)
    if isinstance(doc, list):  # v1 manifests: bare path list, no stats
        return [{"path": p, "rows": None, "columns": {}} for p in doc]
    if doc.get("shards"):
        # two-level manifest: flatten shard entry lists so every
        # single-level reader (time travel, vacuum, lineage) keeps
        # working; shard-pruned access goes through read_sharded_pruned
        entries: list[dict] = []
        for s in doc["shards"]:
            with open(
                os.path.join(_manifest_dir(table_dir), s["shard"])
            ) as fh:
                entries.extend(json.load(fh)["files"])
        return entries
    return doc["files"]


def snapshot_entries(table_dir: str, snapshot_id: int) -> list[dict]:
    """Manifest entries (path + rows + per-column stats) of a snapshot."""
    return _load_manifest(table_dir, snapshot_id)


def snapshot_files(table_dir: str, snapshot_id: int) -> list[str]:
    return [e["path"] for e in _load_manifest(table_dir, snapshot_id)]


class SnapshotConstraintError(ValueError):
    """A CHECK constraint failed at commit time; the snapshot was NOT
    committed and the staged data files were removed."""


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    carry_over: list[str] | None = None,
    meta: dict | None = None,
    bloom_cols: list[str] | None = None,
    bloom_m: int = 1 << 18,
    bloom_k: int = 4,
    constraints: list[tuple[str, str]] | None = None,
    schema_contract: dict[str, str] | None = None,
) -> int:
    """Commit a new snapshot: ``df`` becomes new immutable data files;
    ``carry_over`` names files from prior snapshots that remain part of
    the table (copy-on-write — unchanged files are referenced, not
    rewritten). ``bloom_cols`` additionally attaches a per-file Bloom
    bitset over those columns to each NEW file's manifest entry, giving
    point-lookup skipping on high-cardinality keys where MIN/MAX stats
    are blind (hash-distributed layouts). Carried-over files reuse
    their previous manifest entry verbatim — stats and blooms survive
    every commit without re-reading a footer. Returns the new snapshot
    id."""
    if schema_contract:
        # schema contracts gate BEFORE any write: every required column
        # must exist with the exact declared type (a dropped or retyped
        # column silently breaks every downstream reader — fail the
        # producer instead). Pure metadata check, zero execution.
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        bad = {
            c: f"missing (want {t})" if c not in actual
            else f"{actual[c]} (want {t})"
            for c, t in schema_contract.items()
            if actual.get(c) != t
        }
        if bad:
            raise SnapshotConstraintError(
                f"schema contract violations, commit aborted: {bad}"
            )
    part = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, f"data-{part}")
    df.write.mode("overwrite").parquet(data_dir)
    if constraints:
        # CHECK constraints gate the COMMIT, not the write: validate the
        # files as they actually landed (one distributed aggregate over
        # the staged data — NULL passes, per SQL CHECK semantics), and on
        # any violation remove the staged files and raise BEFORE a
        # manifest exists. Readers can never observe a constraint-
        # violating snapshot; the table's prior state is untouched.
        import shutil

        staged = df.sparkSession.read.parquet(data_dir)
        counts = staged.agg(
            *[
                F.sum(
                    F.when(~F.coalesce(F.expr(cond), F.lit(True)), 1)
                    .otherwise(0)
                ).alias(f"c{i}")
                for i, (_, cond) in enumerate(constraints)
            ]
        ).first()
        bad = {
            name: int(counts[f"c{i}"])
            for i, (name, _) in enumerate(constraints)
            if counts[f"c{i}"]
        }
        if bad:
            shutil.rmtree(data_dir)
            raise SnapshotConstraintError(
                f"constraint violations, commit aborted: {bad}"
            )
    new_files = [
        os.path.join(f"data-{part}", f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    ]
    prev: dict[str, dict] = {}
    last = latest_snapshot(table_dir)
    if last >= 0 and carry_over:
        prev = {e["path"]: e for e in _load_manifest(table_dir, last)}
        # carrying files forward must also carry the deletion vectors
        # that mask rows inside them — DVs key on (file, position), so
        # they can never touch the newly appended files
        inherited = snapshot_meta(table_dir, last).get("deletion_vectors")
        if inherited and "deletion_vectors" not in (meta or {}):
            meta = {**(meta or {}), "deletion_vectors": inherited}
    if last >= 0:
        # the column mapping is TABLE state, not a commit's quirk — it
        # survives every commit (even a full rewrite with no carry-over,
        # e.g. a merge that touches all files): writers emit the
        # PHYSICAL schema, so dropping the mapping would silently
        # revert every logical name
        cmap = snapshot_meta(table_dir, last).get("column_mapping")
        if cmap and "column_mapping" not in (meta or {}):
            meta = {**(meta or {}), "column_mapping": cmap}
    new_entries = {p: _entry(table_dir, p) for p in new_files}
    if bloom_cols:
        blooms = _build_blooms(
            df.sparkSession, table_dir, new_files, bloom_cols, bloom_m, bloom_k
        )
        for p, by_col in blooms.items():
            new_entries[p]["blooms"] = by_col
    entries = [
        prev.get(p) or new_entries.get(p) or _entry(table_dir, p)
        for p in sorted((carry_over or []) + new_files)
    ]
    return commit_snapshot(table_dir, entries, meta)


def _build_blooms(
    spark: SparkSession,
    table_dir: str,
    new_files: list[str],
    cols: list[str],
    m_bits: int,
    k: int,
) -> dict[str, dict]:
    """Per-file Bloom bitsets, built DISTRIBUTED: one job per column
    computes every value's k md5-derived bit positions, packs them into
    64-bit words with a ``bit_or`` aggregate keyed on (file, word) —
    so at most m/64 tiny rows per file cross the shuffle regardless of
    row count — and the driver only assembles the final ≤ m/8-byte
    bitset per file. The position function (md5 of ``"j:value"``) is
    engine-portable; :func:`_bloom_may_contain` replays it in pure
    Python at prune time."""
    base = spark.read.parquet(
        *[os.path.join(table_dir, p) for p in new_files]
    )
    by_base = {os.path.basename(p): p for p in new_files}
    out: dict[str, dict] = {p: {} for p in new_files}
    for col in cols:
        src = base.select(
            F.input_file_name().alias("f"),
            F.col(col).cast("string").alias("v"),
        ).where(F.col("v").isNotNull())
        exploded = src.select(
            "f",
            "v",
            F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j"),
        )
        pos = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("j"), F.col("v"))), 1, 12
                ),
                16,
                10,
            ).cast("bigint")
            % m_bits
        )
        words = (
            exploded.select("f", pos.alias("p"))
            .select(
                "f",
                F.expr("p div 64").alias("w"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
                ).alias("b"),
            )
            .groupBy("f", "w")
            .agg(F.expr("bit_or(b)").alias("bits"))
            .collect()
        )
        per_file: dict[str, bytearray] = {}
        for r in words:
            rel = by_base[os.path.basename(r["f"])]
            buf = per_file.setdefault(rel, bytearray(m_bits // 8))
            word = r["bits"] & ((1 << 64) - 1)
            buf[r["w"] * 8 : r["w"] * 8 + 8] = word.to_bytes(8, "little")
        for rel in new_files:
            buf = per_file.get(rel, bytearray(m_bits // 8))
            out[rel][col] = {"m": m_bits, "k": k, "bits": bytes(buf).hex()}
    return out


def _bloom_may_contain(bl: dict, value) -> bool:
    """Replay the k md5 bit positions for ``value`` against a stored
    bitset. False ⇒ the file PROVABLY does not contain the value."""
    import hashlib

    m, k = bl["m"], bl["k"]
    bits = bytes.fromhex(bl["bits"])
    for j in range(k):
        p = (
            int(
                hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:12], 16
            )
            % m
        )
        w, b = p // 64, p % 64
        if not (bits[w * 8 + b // 8] >> (b % 8)) & 1:
            return False
    return True


def idempotent_append(
    spark: SparkSession, table_dir: str, df: DataFrame, txn_id: str
) -> tuple[int, bool]:
    """Exactly-once APPEND under retries: if any committed snapshot
    already carries ``txn_id``, the append is a no-op (the retry of an
    epoch whose commit DID land must not duplicate rows). Returns
    ``(snapshot_id, committed)`` — the existing snapshot id with
    ``committed=False`` on replay. This is the Delta ``txn`` /
    Iceberg snapshot-summary dedup pattern a streaming foreachBatch
    sink needs: the sink keys ``txn_id`` on the epoch id, so a batch
    replayed after a crash between commit and checkpoint advances the
    stream without double-appending. Scan cost is O(snapshots)
    driver-side manifest metadata."""
    for sid in range(latest_snapshot(table_dir), -1, -1):
        if snapshot_meta(table_dir, sid).get("txn_id") == txn_id:
            return sid, False
    carry = (
        snapshot_files(table_dir, latest_snapshot(table_dir))
        if latest_snapshot(table_dir) >= 0
        else []
    )
    sid = write_snapshot(
        df, table_dir, carry_over=carry, meta={"txn_id": txn_id}
    )
    return sid, True


def _to_physical(df: DataFrame, table_dir: str) -> DataFrame:
    """Rename a LOGICAL-schema frame (as served by read_snapshot) back
    to the table's PHYSICAL column names before writing — every writer
    must emit the physical schema or a later mapped read would look
    for physical columns that no longer exist in the new files."""
    cmap = snapshot_meta(table_dir, latest_snapshot(table_dir)).get(
        "column_mapping"
    ) or {}
    return df.withColumnsRenamed(cmap) if cmap else df


def delete_from_snapshot(spark: SparkSession, table_dir: str, predicate) -> int:
    """Merge-on-read DELETE via deletion vectors (the Delta/Iceberg v2
    positional-delete design): instead of rewriting every data file that
    contains a matching row (copy-on-write — write amplification
    proportional to FILE size for a row-level delete), the matching
    positions are recorded as (file, row_index) pairs in a deletion-
    vector parquet written alongside the data, and the commit carries
    the SAME data files plus the accumulated DV list in its manifest
    meta. Readers anti-join the DV on Spark's stable per-file
    ``_metadata.row_index``. Deletes are O(matched rows) IO; the debt
    is repaid at :func:`compact_snapshot`, which materializes the
    DV-applied rows and commits DV-free files. ``predicate`` is a
    pyspark Column over the table schema. Returns the new snapshot id."""
    sid = latest_snapshot(table_dir)
    entries = snapshot_entries(table_dir, sid)
    meta = snapshot_meta(table_dir, sid)
    raw = spark.read.parquet(
        *[os.path.join(table_dir, e["path"]) for e in entries]
    )
    hits = (
        raw.select(
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("_f"),
            F.col("_metadata.row_index").alias("_pos"),
            "*",
        )
        .where(predicate)
        .select("_f", "_pos")
    )
    dv_rel = f"dv-{uuid.uuid4().hex[:12]}"
    hits.write.parquet(os.path.join(table_dir, dv_rel))
    new_meta = {
        **meta,
        "deletion_vectors": list(meta.get("deletion_vectors", []))
        + [dv_rel],
    }
    return commit_snapshot(table_dir, entries, new_meta)


def update_snapshot_mor(
    spark: SparkSession, table_dir: str, predicate, assignments: dict
) -> int:
    """Merge-on-read UPDATE, composed from the two MoR primitives: the
    matched rows' CURRENT versions (deletion vectors applied) are
    rewritten with ``assignments`` and APPENDED as new files, while the
    old versions are masked by a new deletion vector — no existing data
    file is rewritten, total IO is O(matched rows). The updated-rows
    frame is built against the pre-update snapshot's immutable file and
    DV lists, so the late evaluation during the append still reads the
    pre-delete view. Returns the final snapshot id (one DV commit plus
    one append commit — atomicity is per-commit; a crash between them
    leaves a pure delete, never a duplicate)."""
    cur = read_snapshot(spark, table_dir)
    updated = _to_physical(
        cur.where(predicate).withColumns(assignments), table_dir
    )
    delete_from_snapshot(spark, table_dir, predicate)
    carry = snapshot_files(table_dir, latest_snapshot(table_dir))
    return write_snapshot(updated, table_dir, carry_over=carry)


def compact_snapshot(
    spark: SparkSession, table_dir: str, target_files: int
) -> int:
    """OPTIMIZE-style compaction: rewrite the LATEST snapshot's data
    into ``target_files`` files and commit the result as a new
    snapshot (no carry-over — every small file is replaced). Contents
    are bit-identical; only the layout changes. Old snapshots remain
    time-travel readable until :func:`vacuum_snapshots` reclaims them.
    At 100 TB compaction batches by size; here the repartition count
    stands in for the size-based bin packing."""
    sid = latest_snapshot(table_dir)
    df = _to_physical(read_snapshot(spark, table_dir, sid), table_dir)
    return write_snapshot(df.repartition(target_files), table_dir)


def vacuum_snapshots(table_dir: str, keep_from: int) -> list[str]:
    """Reclaim storage: delete data files referenced ONLY by snapshots
    older than ``keep_from``, then drop those snapshots' manifests.
    Returns the deleted data file paths. Snapshots >= ``keep_from``
    are untouched and stay exactly readable — the retention contract
    every lakehouse VACUUM documents (time travel works within the
    retention window, never past it)."""
    last = latest_snapshot(table_dir)
    if not 0 <= keep_from <= last:
        raise ValueError(f"keep_from {keep_from} outside [0, {last}]")
    keep: set[str] = set()
    for sid in range(keep_from, last + 1):
        keep.update(snapshot_files(table_dir, sid))
    doomed: set[str] = set()
    expired = [
        sid
        for sid in range(keep_from)
        if os.path.exists(
            os.path.join(_manifest_dir(table_dir), f"{sid}.json")
        )
    ]
    for sid in expired:
        doomed.update(
            p for p in snapshot_files(table_dir, sid) if p not in keep
        )
    # shallow-clone guard: entries reaching OUTSIDE the table dir
    # (relative ``..`` paths from clone_snapshot) belong to the source
    # table — vacuuming a clone must never delete them
    doomed = {p for p in doomed if not p.startswith("..")}
    for p in sorted(doomed):
        os.unlink(os.path.join(table_dir, p))
    for sid in expired:
        os.unlink(os.path.join(_manifest_dir(table_dir), f"{sid}.json"))
    return sorted(doomed)


# --- stats-based data skipping -------------------------------------------

_OPS = ("=", "==", "<", "<=", ">", ">=")


def _may_match(entry: dict, col: str, op: str, value) -> bool:
    """Can any row of this file satisfy ``col op value``? Conservative:
    missing/incomparable stats → True (never skip incorrectly). The
    predicates are null-rejecting, so an all-null column can be skipped."""
    if op in ("=", "=="):
        bl = entry.get("blooms", {}).get(col)
        if bl is not None and not _bloom_may_contain(bl, value):
            return False
    st = entry.get("columns", {}).get(col)
    if st is None:
        return True
    rows = entry.get("rows")
    if rows is not None and st.get("nulls") == rows:
        return False  # every value null: no null-rejecting predicate matches
    mn, mx = st.get("min"), st.get("max")
    if mn is None or mx is None:
        return True
    num = lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)
    if not (
        (num(value) and num(mn) and num(mx))
        or (isinstance(value, str) and isinstance(mn, str) and isinstance(mx, str))
    ):
        return True  # type mismatch after JSON roundtrip: don't skip
    if op in ("=", "=="):
        return mn <= value <= mx
    if op == "<":
        return mn < value
    if op == "<=":
        return mn <= value
    if op == ">":
        return mx > value
    if op == ">=":
        return mx >= value
    raise ValueError(f"unsupported op {op!r} (use one of {_OPS})")


def prune_entries(
    entries: list[dict], filters: list[tuple[str, str, object]]
) -> list[dict]:
    """Drop entries whose stats PROVE no row can satisfy ALL filters
    (filters are AND-ed, each ``(column, op, value)``)."""
    return [
        e
        for e in entries
        if all(_may_match(e, c, op, v) for (c, op, v) in filters)
    ]


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    filters: list[tuple[str, str, object]] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Time-travel read: load exactly the files of ``snapshot_id``
    (default: latest). With ``filters``, the file list is first pruned
    against the manifest stats (data skipping) and the filters are then
    applied to the scan as ordinary predicates — pruning is an IO
    optimization, never a semantics change. ``merge_schema`` unions the
    file schemas across commit generations (schema evolution: rows from
    files lacking a later-added column surface NULL for it)."""
    df, _, _ = read_snapshot_pruned(
        spark, table_dir, snapshot_id, filters, merge_schema
    )
    return df


def read_snapshot_pruned(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    filters: list[tuple[str, str, object]] | None = None,
    merge_schema: bool = False,
) -> tuple[DataFrame, int, int]:
    """Like :func:`read_snapshot` but also reports
    ``(df, files_scanned, files_total)`` so callers (and tests) can
    assert that skipping actually happened."""
    sid = latest_snapshot(table_dir) if snapshot_id is None else snapshot_id
    entries = snapshot_entries(table_dir, sid)
    total = len(entries)
    # column mapping: filters arrive in LOGICAL names; stats and data
    # files carry PHYSICAL names — translate before pruning/scanning,
    # rename after.
    mapping = snapshot_meta(table_dir, sid).get("column_mapping") or {}
    phys = lambda c: mapping.get(c, c)
    filters = [(phys(c), op, v) for (c, op, v) in filters or []]
    if filters:
        entries = prune_entries(entries, filters)
    reader = spark.read.option("mergeSchema", str(merge_schema).lower())
    if not entries:
        # all files pruned: empty frame with the snapshot's schema
        all_files = [
            os.path.join(table_dir, e["path"])
            for e in snapshot_entries(table_dir, sid)
        ]
        df = reader.parquet(*all_files).limit(0)
        if mapping:
            df = df.withColumnsRenamed(
                {p: logical for logical, p in mapping.items()}
            )
        return df, 0, total
    df = reader.parquet(
        *[os.path.join(table_dir, e["path"]) for e in entries]
    )
    dvs = snapshot_meta(table_dir, sid).get("deletion_vectors") or []
    if dvs:
        # merge-on-read: anti-join the accumulated deletion vectors on
        # (file basename, stable row position). DVs are bounded by rows
        # deleted since the last compaction — broadcast the small side.
        dvf = spark.read.parquet(
            *[os.path.join(table_dir, p) for p in dvs]
        ).select("_f", "_pos")
        df = (
            df.select(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("_f"),
                F.col("_metadata.row_index").alias("_pos"),
                "*",
            )
            .join(F.broadcast(dvf), ["_f", "_pos"], "left_anti")
            .drop("_f", "_pos")
        )
    for c, op, v in filters or []:
        column = F.col(c)
        df = df.where(
            {
                "=": column == v,
                "==": column == v,
                "<": column < v,
                "<=": column <= v,
                ">": column > v,
                ">=": column >= v,
            }[op]
        )
    if mapping:
        df = df.withColumnsRenamed(
            {p: logical for logical, p in mapping.items()}
        )
    return df, len(entries), total


def read_changes(
    spark: SparkSession, table_dir: str, from_snapshot: int, to_snapshot: int
) -> DataFrame:
    """Incremental (CDC-style) read: rows in the files ADDED between two
    snapshots. For append commits this is exactly the appended rows; for
    copy-on-write commits (including MERGE) it is the post-image of
    every rewritten file plus any inserted rows — the standard
    file-granularity change feed a downstream incremental pipeline
    consumes instead of re-scanning the table."""
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


# --- MERGE INTO -----------------------------------------------------------


def merge_into_snapshot(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key: str,
    value_cols: list[str],
    op_col: str = "op",
    cdc: bool = False,
) -> int:
    """Row-level MERGE INTO the latest snapshot (copy-on-write).

    ``changes`` carries ``key``, ``value_cols`` and ``op_col``:
    - ``'U'``: WHEN MATCHED THEN UPDATE (no-op for an absent key);
    - ``'D'``: WHEN MATCHED THEN DELETE (no-op for an absent key);
    - ``'I'``: WHEN NOT MATCHED THEN INSERT (no-op for a present key).

    Plan, in 100 TB order of importance:
    1. stats-prune: only files whose ``key`` min/max range intersects
       the change set's key envelope can contain a matched row — the
       manifest answers this driver-side before any scan;
    2. exact touch detection: scan ONLY the candidate files' key
       column, left-semi join against the U/D keys, collect the
       distinct file names (O(files) driver data, never O(rows));
    3. rewrite ONLY the touched files (update/delete applied via a
       single keyed left join), union the insert rows (anti join
       against the table's key column — a column-pruned scan), write
       the result as the commit's new files, carry every untouched
       file over by reference.

    Returns the new snapshot id. :func:`read_changes` over
    (previous, new) yields the post-image of rewritten files plus the
    inserted rows.
    """
    base_sid = latest_snapshot(table_dir)
    if base_sid < 0:
        raise ValueError(f"no snapshot to merge into at {table_dir}")
    entries = snapshot_entries(table_dir, base_sid)
    all_paths = [e["path"] for e in entries]
    abs_path = lambda p: os.path.join(table_dir, p)

    # column mapping: callers speak LOGICAL names, data files carry
    # PHYSICAL ones — translate the change set and all key/value refs
    # up front; the rewritten files are committed in the physical
    # schema (the same contract appends follow), and write_snapshot's
    # meta inheritance keeps the mapping alive on the merge commit.
    cmap = snapshot_meta(table_dir, base_sid).get("column_mapping") or {}
    if cmap:
        changes = changes.select(
            F.col(key).alias(cmap.get(key, key)),
            F.col(op_col).alias(op_col),
            *[F.col(v).alias(cmap.get(v, v)) for v in value_cols],
        )
        key = cmap.get(key, key)
        value_cols = [cmap.get(v, v) for v in value_cols]

    # deletion-vector-aware scans: every read the merge takes (touch
    # detection, the rewrite base, the not-matched guard) must see the
    # MoR view, not the raw files — rewriting a file from its raw bytes
    # would resurrect rows a DV masks, and a DV-deleted key must not
    # block a fresh insert of the same key.
    dv_paths = snapshot_meta(table_dir, base_sid).get(
        "deletion_vectors"
    ) or []
    dvf = (
        spark.read.parquet(*[abs_path(p) for p in dv_paths]).select(
            "_f", "_pos"
        )
        if dv_paths
        else None
    )

    def scan(paths: list[str], cols: list):
        raw = spark.read.parquet(*[abs_path(p) for p in paths])
        if dvf is None:
            return raw.select(*cols)
        return (
            raw.select(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("_f"),
                F.col("_metadata.row_index").alias("_pos"),
                *cols,
            )
            .join(F.broadcast(dvf), ["_f", "_pos"], "left_anti")
            .drop("_f", "_pos")
        )

    ud_keys = (
        changes.where(F.col(op_col).isin("U", "D")).select(key).distinct()
    )
    env = ud_keys.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).first()
    if env["lo"] is None:
        candidates = []
    else:
        candidates = [
            e["path"]
            for e in prune_entries(
                entries,
                [(key, ">=", env["lo"]), (key, "<=", env["hi"])],
            )
        ]

    touched: list[str] = []
    if candidates:
        cand_scan = scan(
            candidates, [F.col(key), F.input_file_name().alias("_file")]
        )
        touched_uris = [
            r["_file"]
            for r in cand_scan.join(ud_keys, key, "left_semi")
            .select("_file")
            .distinct()
            .collect()  # bounded: one row per touched FILE
        ]
        # input_file_name returns URIs; map back to manifest paths
        touched = [
            p
            for p in candidates
            if any(u.endswith("/" + os.path.basename(p)) for u in touched_uris)
        ]

    cols = [key, *value_cols]
    if touched:
        base_touched = scan(touched, [F.col(c) for c in cols])
        ch = changes.where(F.col(op_col).isin("U", "D")).select(
            F.col(key).alias("_k"),
            F.col(op_col).alias("_op"),
            *[F.col(v).alias(f"_c_{v}") for v in value_cols],
        )
        joined = base_touched.join(
            ch, base_touched[key] == ch["_k"], "left"
        )
        rewritten = joined.where(
            F.col("_op").isNull() | (F.col("_op") != "D")
        ).select(
            F.col(key),
            *[
                F.when(F.col("_op") == "U", F.col(f"_c_{v}"))
                .otherwise(F.col(v))
                .alias(v)
                for v in value_cols
            ],
        )
    else:
        rewritten = None

    inserts = changes.where(F.col(op_col) == "I").select(*cols)
    # WHEN NOT MATCHED guard: a key-column-pruned scan of the table
    table_keys = scan(all_paths, [F.col(key)])
    inserts = inserts.join(table_keys, key, "left_anti")

    meta = None
    if cdc:
        # row-level CHANGE DATA FEED (the Delta CDF contract): the merge
        # already evaluates every changed row — update pre/post images
        # from the rewrite join, delete pre-images, guarded inserts — so
        # emitting them costs one extra sidecar write, not a second
        # table diff. Readers get exact row deltas; the file-granularity
        # read_changes feed stays available for consumers that only
        # need post-images.
        ct = lambda t: F.lit(t).alias("_change_type")
        parts = [
            inserts.select(F.col(key), *value_cols, ct("insert"))
        ]
        if touched:
            upd = joined.where(F.col("_op") == "U")
            parts.append(
                upd.select(
                    F.col(key),
                    *[F.col(v) for v in value_cols],
                    ct("update_preimage"),
                )
            )
            parts.append(
                upd.select(
                    F.col(key),
                    *[F.col(f"_c_{v}").alias(v) for v in value_cols],
                    ct("update_postimage"),
                )
            )
            parts.append(
                joined.where(F.col("_op") == "D").select(
                    F.col(key),
                    *[F.col(v) for v in value_cols],
                    ct("delete"),
                )
            )
        cdc_df = parts[0]
        for p in parts[1:]:
            cdc_df = cdc_df.unionByName(p)
        cdc_rel = f"cdc-{uuid.uuid4().hex[:12]}"
        cdc_df.write.parquet(os.path.join(table_dir, cdc_rel))
        meta = {"row_cdc": cdc_rel}
    new_rows = inserts if rewritten is None else rewritten.unionByName(inserts)
    carried = [p for p in all_paths if p not in set(touched)]
    return write_snapshot(new_rows, table_dir, carry_over=carried, meta=meta)


def read_row_changes(
    spark: SparkSession, table_dir: str, snapshot_id: int
) -> DataFrame:
    """Row-level change feed of a MERGE commit made with ``cdc=True``:
    every changed row tagged ``_change_type`` ∈ {insert, delete,
    update_preimage, update_postimage} — the Delta CDF read contract.
    O(changed rows) IO regardless of table size."""
    meta = snapshot_meta(table_dir, snapshot_id)
    rel = meta.get("row_cdc")
    if not rel:
        raise ValueError(
            f"snapshot {snapshot_id} of {table_dir} has no row-level "
            "change feed (merge was not run with cdc=True)"
        )
    df = spark.read.parquet(os.path.join(table_dir, rel))
    cmap = meta.get("column_mapping") or {}
    if cmap:  # feed is stored physical; consumers speak logical
        df = df.withColumnsRenamed(
            {p: logical for logical, p in cmap.items()}
        )
    return df


def commit_snapshot_sharded(
    table_dir: str,
    entries: list[dict],
    shard_key: str,
    files_per_shard: int,
) -> int:
    """TWO-LEVEL manifest commit (the Iceberg manifest-list design):
    file entries sort by their ``shard_key`` MIN stat and chunk into
    shard manifests of ``files_per_shard`` entries; the top-level
    manifest stores only one row per shard — its path, file count and
    the shard-wide [min, max] envelope of ``shard_key``. A filtered
    read prunes SHARDS before it ever parses a file entry, so
    metadata cost scales as O(shards + surviving-shard entries), not
    O(all files) — the difference between a 10 ms and a 10 s planning
    step on a million-file table. Data files themselves are untouched;
    this is purely a metadata layout. Scope: sharded commits carry no
    deletion-vector or column-mapping state — they serve append-only
    range-partitioned tables (the single-level commit path owns the
    full state machine)."""
    import math

    mdir = os.path.join(_manifest_dir(table_dir), "shards")
    os.makedirs(mdir, exist_ok=True)
    key = lambda e: e["columns"].get(shard_key, {}).get("min")
    entries = sorted(entries, key=lambda e: (key(e) is None, key(e)))
    shard_rows = []
    part = uuid.uuid4().hex[:8]
    n_shards = math.ceil(len(entries) / files_per_shard)
    for i in range(n_shards):
        chunk = entries[i * files_per_shard : (i + 1) * files_per_shard]
        rel = f"shards/{part}-{i}.json"
        with open(os.path.join(_manifest_dir(table_dir), rel), "w") as fh:
            json.dump({"files": chunk}, fh)
        mins = [key(e) for e in chunk if key(e) is not None]
        maxs = [
            e["columns"].get(shard_key, {}).get("max")
            for e in chunk
            if e["columns"].get(shard_key, {}).get("max") is not None
        ]
        shard_rows.append(
            {
                "shard": rel,
                "n_files": len(chunk),
                "min": min(mins) if mins else None,
                "max": max(maxs) if maxs else None,
            }
        )
    while True:
        sid = latest_snapshot(table_dir) + 1
        tmp = os.path.join(
            _manifest_dir(table_dir), f".{sid}.{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": MANIFEST_VERSION,
                    "meta": {"sharded_on": shard_key},
                    "shards": shard_rows,
                    "files": [],
                },
                fh,
            )
        try:
            os.link(
                tmp, os.path.join(_manifest_dir(table_dir), f"{sid}.json")
            )
            os.unlink(tmp)
            return sid
        except FileExistsError:
            os.unlink(tmp)
            continue


def read_sharded_pruned(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int,
    filters: list[tuple[str, str, object]] | None = None,
) -> tuple[DataFrame, int, int, int, int]:
    """Read a two-level snapshot with shard-then-file pruning. Returns
    ``(df, shards_loaded, shards_total, files_scanned, files_total)``.
    Shards prune on the top-level [min, max] envelope of the shard
    key; only surviving shards' entry lists are even PARSED, then the
    usual per-file stats pruning applies within them."""
    with open(
        os.path.join(_manifest_dir(table_dir), f"{snapshot_id}.json")
    ) as fh:
        doc = json.load(fh)
    shard_key = doc["meta"]["sharded_on"]
    shards = doc["shards"]
    total_shards = len(shards)
    total_files = sum(s["n_files"] for s in shards)
    keep = []
    for s in shards:
        pseudo = {
            "rows": None,
            "columns": {
                shard_key: {"min": s["min"], "max": s["max"], "nulls": 0}
            },
        }
        if all(
            _may_match(pseudo, c, op, v)
            for (c, op, v) in (filters or [])
            if c == shard_key
        ):
            keep.append(s)
    entries: list[dict] = []
    for s in keep:
        with open(
            os.path.join(_manifest_dir(table_dir), s["shard"])
        ) as fh:
            entries.extend(json.load(fh)["files"])
    if filters:
        entries = prune_entries(entries, filters)
    if not entries:
        raise ValueError("all files pruned; no schema source")
    df = spark.read.parquet(
        *[os.path.join(table_dir, e["path"]) for e in entries]
    )
    for c, op, v in filters or []:
        column = F.col(c)
        df = df.where(
            {
                "=": column == v,
                "==": column == v,
                "<": column < v,
                "<=": column <= v,
                ">": column > v,
                ">=": column >= v,
            }[op]
        )
    return df, len(keep), total_shards, len(entries), total_files


def file_lineage(table_dir: str) -> list[dict]:
    """Provenance of the LATEST snapshot's data files: for each live
    file, the earliest snapshot whose manifest lists it (``added_in``)
    plus its manifest row count — the Iceberg `files`-table lineage
    view. Pure driver-side manifest metadata, zero data IO: the scan
    is O(snapshots × files-per-manifest) JSON entries."""
    last = latest_snapshot(table_dir)
    added: dict[str, int] = {}
    for sid in range(last + 1):
        for p in snapshot_files(table_dir, sid):
            added.setdefault(p, sid)
    return [
        {"path": e["path"], "added_in": added[e["path"]], "rows": e["rows"]}
        for e in snapshot_entries(table_dir, last)
    ]


def rename_columns(table_dir: str, renames: dict[str, str]) -> int:
    """METADATA-ONLY column rename (the Delta column-mapping design):
    data files keep their physical column names forever; the commit
    stores a logical→physical mapping in the manifest meta and the
    read path renames at scan time. Zero data IO at any table size —
    the manifest commit is the entire cost. Renames compose across
    commits (renaming an already-renamed column re-points the logical
    name at the original physical name). Appends AFTER a rename must
    write the PHYSICAL schema (as Delta's writers do); time travel to
    pre-rename snapshots naturally yields the old logical names since
    the mapping lives in each snapshot's own meta."""
    sid = latest_snapshot(table_dir)
    entries = snapshot_entries(table_dir, sid)
    meta = snapshot_meta(table_dir, sid)
    mapping = dict(meta.get("column_mapping", {}))
    for old, new in renames.items():
        mapping[new] = mapping.pop(old, old)
    return commit_snapshot(
        table_dir, entries, {**meta, "column_mapping": mapping}
    )


def rollback_snapshot(table_dir: str, to_snapshot_id: int) -> int:
    """Iceberg-style rollback: commit a NEW snapshot whose file set is
    exactly the target snapshot's. History is preserved — the bad
    snapshot remains readable for forensics, the rollback is itself an
    auditable commit (meta records the target), and concurrent-writer
    safety comes from the same put-if-absent commit path."""
    entries = snapshot_entries(table_dir, to_snapshot_id)
    meta = {"operation": "rollback", "rolled_back_to": to_snapshot_id}
    # the restored state includes the target's deletion vectors — a
    # rollback that dropped them would resurrect every MoR-deleted row
    # — and its column mapping: rolling back to a post-rename snapshot
    # must keep serving the renamed logical schema (found by extending
    # the rename interplay audit, same bug class as the r4 DV one)
    tmeta = snapshot_meta(table_dir, to_snapshot_id)
    for inherited in ("deletion_vectors", "column_mapping"):
        if tmeta.get(inherited):
            meta[inherited] = tmeta[inherited]
    return commit_snapshot(table_dir, entries, meta)


def _refs_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_refs")


def set_ref(table_dir: str, name: str, snapshot_id: int) -> None:
    """Atomically move a named branch pointer (write-temp-then-rename;
    unlike manifest commits a ref MOVE is the intended operation, so
    rename's replace semantics are correct here)."""
    rd = _refs_dir(table_dir)
    os.makedirs(rd, exist_ok=True)
    tmp = os.path.join(rd, f".{name}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"snapshot_id": snapshot_id}, fh)
    os.rename(tmp, os.path.join(rd, f"{name}.json"))


def get_ref(table_dir: str, name: str) -> int | None:
    """Snapshot id a branch points at, or None if the ref doesn't
    exist."""
    p = os.path.join(_refs_dir(table_dir), f"{name}.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)["snapshot_id"]


def read_ref(spark: SparkSession, table_dir: str, name: str) -> DataFrame:
    """Read the snapshot a branch ref points at."""
    sid = get_ref(table_dir, name)
    if sid is None:
        raise FileNotFoundError(f"no ref {name!r} in {table_dir}")
    return read_snapshot(spark, table_dir, sid)


def remove_orphan_files(table_dir: str) -> list[str]:
    """Delete data files not referenced by ANY snapshot manifest —
    Iceberg's remove_orphan_files: failed/aborted writers leave data
    files that no manifest ever adopted; they are invisible to readers
    but cost storage forever. Safe by construction: the referenced set
    is the union over ALL manifests (time travel keeps working), and
    only files under data-* directories are candidates (manifests,
    refs, DV sidecars are never touched). Returns the removed paths."""
    referenced: set[str] = set()
    last = latest_snapshot(table_dir)
    for sid in range(last + 1):
        referenced.update(snapshot_files(table_dir, sid))
        for dv in snapshot_meta(table_dir, sid).get(
            "deletion_vectors"
        ) or []:
            referenced.add(dv)
    removed = []
    for root, _dirs, files in os.walk(table_dir):
        rel_root = os.path.relpath(root, table_dir)
        if not rel_root.startswith("data-"):
            continue
        for f in files:
            rel = os.path.join(rel_root, f)
            # data files only — _SUCCESS markers and .crc sidecars
            # are write artifacts, not table content
            if rel not in referenced and f.endswith(".parquet"):
                os.remove(os.path.join(root, f))
                removed.append(rel)
    return sorted(removed)


def clone_snapshot(
    src_table: str, dst_table: str, snapshot_id: int, deep: bool = False
) -> int:
    """CLONE a snapshot into a new table (Delta CLONE semantics).

    Shallow (default): the clone's manifest references the SOURCE data
    files through relative paths — zero data bytes move, the clone is
    instantly queryable, and subsequent commits to either table never
    affect the other (manifests are immutable; new data lands in each
    table's own data dirs). Deep: data files are copied, making the
    clone self-contained (survives source deletion). Either way the
    clone starts its own snapshot history at 0.

    Caveats (the same ones Delta documents for shallow clones):
    VACUUM on the SOURCE can delete files a shallow clone still
    references (deep-clone before reclaiming the source); vacuum
    on the CLONE skips source-owned files by construction (guard
    in :func:`vacuum_snapshots`)."""
    import shutil

    entries = snapshot_entries(src_table, snapshot_id)
    os.makedirs(dst_table, exist_ok=True)

    def relocate(rel: str) -> str:
        return os.path.relpath(os.path.join(src_table, rel), dst_table)

    out_entries = []
    for e in entries:
        if deep:
            rel = e["path"]
            dst_path = os.path.join(dst_table, rel)
            os.makedirs(os.path.dirname(dst_path), exist_ok=True)
            shutil.copy2(os.path.join(src_table, rel), dst_path)
            out_entries.append(e)
        else:
            out_entries.append({**e, "path": relocate(e["path"])})
    meta = {
        "operation": "clone",
        "source": os.path.abspath(src_table),
        "source_snapshot": snapshot_id,
        "deep": deep,
    }
    # a clone is the TABLE STATE, not just its file list: deletion
    # vectors must come along (a clone that dropped them would
    # resurrect every MoR-deleted row — the same bug class the r4
    # rollback audit caught) and so must the column mapping. Shallow
    # clones reference the source's DV sidecars through the same
    # relative paths as data files; deep clones copy the DV parquet
    # directories so the clone survives source deletion.
    smeta = snapshot_meta(src_table, snapshot_id)
    dvs = smeta.get("deletion_vectors") or []
    if dvs:
        if deep:
            for dv in dvs:
                shutil.copytree(
                    os.path.join(src_table, dv),
                    os.path.join(dst_table, dv),
                    dirs_exist_ok=True,
                )
            meta["deletion_vectors"] = dvs
        else:
            meta["deletion_vectors"] = [relocate(dv) for dv in dvs]
    if smeta.get("column_mapping"):
        meta["column_mapping"] = smeta["column_mapping"]
    return commit_snapshot(dst_table, out_entries, meta)


# ---------------------------------------------------------------------------
# Multi-table catalog transactions: one versioned pointer file pinning a
# consistent set of (table, snapshot_id) pairs. Single-table formats
# (Delta, Iceberg) stop at per-table atomicity; cross-table consistency
# (fact + its materialized view, paired shards) needs this extra level —
# the same put-if-absent manifest trick, one directory up.


def catalog_latest(catalog_dir: str) -> int:
    """Latest committed catalog version, -1 when empty."""
    if not os.path.isdir(catalog_dir):
        return -1
    best = -1
    for name in os.listdir(catalog_dir):
        if name.endswith(".json") and not name.startswith("."):
            try:
                best = max(best, int(name[:-5].split("-")[-1]))
            except ValueError:
                continue
    return best


def catalog_commit(catalog_dir: str, versions: dict[str, dict]) -> int:
    """Atomically commit a catalog version pinning
    ``{table_name: {"dir": table_dir, "snapshot_id": sid}}``.

    The pinned snapshots must already be durable in their tables
    (stage-then-publish): a crash BEFORE this commit leaves every
    reader on the previous catalog version — no torn cross-table
    state is ever observable. Same put-if-absent os.link protocol as
    single-table commits; collisions retry at the next version."""
    os.makedirs(catalog_dir, exist_ok=True)
    while True:
        ver = catalog_latest(catalog_dir) + 1
        tmp = os.path.join(
            catalog_dir, f".txn-{ver}.{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "w") as fh:
            json.dump({"version": ver, "tables": versions}, fh)
        try:
            os.link(tmp, os.path.join(catalog_dir, f"txn-{ver}.json"))
            os.unlink(tmp)
            return ver
        except FileExistsError:
            os.unlink(tmp)
            continue


def catalog_read(catalog_dir: str, version: int | None = None) -> dict:
    """Resolve the table→snapshot pin map at a catalog version
    (default: latest)."""
    ver = catalog_latest(catalog_dir) if version is None else version
    if ver < 0:
        raise ValueError(f"empty catalog at {catalog_dir}")
    with open(os.path.join(catalog_dir, f"txn-{ver}.json")) as fh:
        return json.load(fh)["tables"]


_RW_OPS = {
    "=": lambda c, v: c == v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def replace_where_snapshot(
    spark: SparkSession,
    table_dir: str,
    col: str,
    op: str,
    value,
    new_df: DataFrame,
) -> int:
    """Atomic partial overwrite (Delta's ``replaceWhere``): one commit
    in which every row matching ``col op value`` is replaced by
    ``new_df`` — the idempotent backfill primitive (recompute one
    partition/day/segment and swap it in without touching the rest).

    Contract and plan:
    1. ``new_df`` must itself satisfy the predicate — otherwise the
       commit would smuggle rows outside the declared replacement
       region; violations abort BEFORE any manifest exists
       (SnapshotConstraintError, Delta's replaceWhere check);
    2. stats-prune: only files whose min/max envelope intersects the
       predicate can hold matching rows — everything else is carried
       over by reference, zero IO;
    3. candidate files are read through the MoR view (deletion-vector
       aware — rewriting raw bytes would resurrect masked rows),
       their NON-matching rows survive into rewritten files (NULL
       predicate rows are kept, per SQL semantics), and the new data
       lands alongside;
    4. one commit publishes carried + rewritten + new files.

    Speaks LOGICAL column names over renamed tables (the column-
    mapping contract: writers physical, readers logical)."""
    if op not in _RW_OPS:
        raise ValueError(f"unsupported replaceWhere op {op!r}")
    base_sid = latest_snapshot(table_dir)
    if base_sid < 0:
        raise ValueError(f"no snapshot to replace into at {table_dir}")
    entries = snapshot_entries(table_dir, base_sid)
    meta = snapshot_meta(table_dir, base_sid)
    cmap = meta.get("column_mapping") or {}
    pcol = cmap.get(col, col)
    if cmap:
        new_df = new_df.select(
            *[F.col(c).alias(cmap.get(c, c)) for c in new_df.columns]
        )
    pred = _RW_OPS[op](F.col(pcol), value)
    n_bad = (
        new_df.where(~F.coalesce(pred, F.lit(False))).limit(1).count()
    )
    if n_bad:
        raise SnapshotConstraintError(
            f"replaceWhere: new data contains rows outside "
            f"{col} {op} {value!r}; commit aborted"
        )
    abs_path = lambda p: os.path.join(table_dir, p)
    cand_entries = prune_entries(entries, [(pcol, op, value)])
    candidates = [e["path"] for e in cand_entries]
    carried = [
        e["path"] for e in entries if e["path"] not in set(candidates)
    ]
    dv_paths = meta.get("deletion_vectors") or []
    dvf = (
        spark.read.parquet(*[abs_path(p) for p in dv_paths]).select(
            "_f", "_pos"
        )
        if dv_paths
        else None
    )
    if candidates:
        raw = spark.read.parquet(*[abs_path(p) for p in candidates])
        if dvf is not None:
            raw = (
                raw.select(
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ).alias("_f"),
                    F.col("_metadata.row_index").alias("_pos"),
                    *[F.col(c) for c in raw.columns],
                )
                .join(F.broadcast(dvf), ["_f", "_pos"], "left_anti")
                .drop("_f", "_pos")
            )
        keep = raw.where(~F.coalesce(pred, F.lit(False)))
        new_rows = keep.unionByName(new_df.select(*raw.columns))
    else:
        new_rows = new_df
    return write_snapshot(new_rows, table_dir, carry_over=carried)
