"""Streaming upsert sink: foreachBatch + latest-wins merge into a
parquet table.

The reference's streaming sink is a blind JDBC append per micro-batch
(code/utils.py:195-207) — a replayed batch (foreachBatch is
at-least-once) lands twice. This sink closes that gap for file-table
targets the same way jdbc_upsert.py does for JDBC ones: every batch is
MERGED by key, so replays are no-ops.

Mechanics per micro-batch:
1. read the current table state (empty on first batch),
2. `maintenance.latest_wins_merge(current, batch, keys, version)`,
3. write the merged result to a NEW versioned directory, then flip a
   manifest file to point at it (write-new-then-flip, never
   in-place overwrite — readers either see the old snapshot or the
   new one, and a crash mid-write leaves the old snapshot intact).

This is deliberately snapshot-isolation-by-manifest — the same idea
(tiny, file-based) that table formats like Delta/Iceberg/Hudi
industrialize. At 100 TB you would use one of those; the operator
contract (merge per batch, idempotent replay) is identical, which is
the point of testing it here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.maintenance import latest_wins_merge

_MANIFEST = "_CURRENT"


def current_snapshot_dir(table_dir: str) -> str | None:
    manifest = os.path.join(table_dir, _MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest, encoding="utf-8") as fh:
        name = fh.read().strip()
    return os.path.join(table_dir, name) if name else None


def read_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    snap = current_snapshot_dir(table_dir)
    return spark.read.parquet(snap) if snap else None


def merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    table_dir: str,
    key_cols: list[str],
    version_col: str,
    batch_id: int,
) -> None:
    """foreachBatch body: merge ``batch`` into the table at
    ``table_dir``. Replaying the same (batch_id, rows) is a no-op
    because the merge keeps max-version rows and the snapshot flip is
    atomic at the manifest."""
    os.makedirs(table_dir, exist_ok=True)
    current = read_table(spark, table_dir)
    # base is empty on the first batch — the merge still self-compacts
    # a batch that carries several versions of one key
    base = current if current is not None else batch.limit(0)
    merged = latest_wins_merge(base, batch, key_cols, version_col)
    new_dir = os.path.join(table_dir, f"snap_{batch_id}")
    merged.write.mode("overwrite").parquet(new_dir)
    tmp = os.path.join(table_dir, _MANIFEST + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"snap_{batch_id}")
    os.replace(tmp, os.path.join(table_dir, _MANIFEST))


def start_merge_stream(
    source: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    version_col: str,
    available_now: bool = True,
):
    """Wire a streaming source into the merge sink. availableNow=True
    drains the backlog and stops (the batch-test mode); False runs
    continuously."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        merge_batch(
            batch.sparkSession, batch, table_dir, key_cols, version_col, batch_id
        )

    writer = source.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Bucketed variant: bounded write amplification
# ---------------------------------------------------------------------------
# merge_batch above rewrites the WHOLE table every micro-batch — fine
# for compact state, O(table) write amplification at scale. The
# bucketed variant hash-partitions the table into fixed key buckets,
# each with its own snapshot + manifest: a batch rewrites only the
# buckets its keys land in, so write cost tracks the BATCH size (x
# bucket granularity), not the table size. This is precisely the
# copy-on-write bucket/file-group design Hudi industrializes.


def _bucket_dir(table_dir: str, bucket: int) -> str:
    return os.path.join(table_dir, f"bucket={bucket}")


def read_bucketed_table(
    spark: SparkSession, table_dir: str, num_buckets: int
) -> DataFrame | None:
    snaps = [
        s
        for b in range(num_buckets)
        if (s := current_snapshot_dir(_bucket_dir(table_dir, b))) is not None
    ]
    return spark.read.parquet(*snaps) if snaps else None


def merge_batch_bucketed(
    spark: SparkSession,
    batch: DataFrame,
    table_dir: str,
    key_cols: list[str],
    version_col: str,
    batch_id: int,
    num_buckets: int = 16,
) -> list[int]:
    """Merge ``batch`` into a bucketed table; only buckets containing
    batch keys are read and rewritten. Returns the touched bucket ids
    (the write-amplification audit trail). The touched-bucket list is
    the ONLY driver-side materialization — bounded by num_buckets, not
    by data size."""
    from pyspark.sql import functions as F

    bkt = F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(num_buckets))
    tagged = batch.withColumn("_bkt", bkt)
    tagged.cache()
    touched = sorted(r._bkt for r in tagged.select("_bkt").distinct().collect())
    for b in touched:
        bdir = _bucket_dir(table_dir, b)
        os.makedirs(bdir, exist_ok=True)
        part = tagged.filter(F.col("_bkt") == b).drop("_bkt")
        current_snap = current_snapshot_dir(bdir)
        current = spark.read.parquet(current_snap) if current_snap else part.limit(0)
        merged = latest_wins_merge(current, part, key_cols, version_col)
        new_dir = os.path.join(bdir, f"snap_{batch_id}")
        merged.write.mode("overwrite").parquet(new_dir)
        tmp = os.path.join(bdir, _MANIFEST + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(f"snap_{batch_id}")
        os.replace(tmp, os.path.join(bdir, _MANIFEST))
    tagged.unpersist()
    return touched


def vacuum(table_dir: str, keep_latest: int = 1) -> list[str]:
    """Remove snapshot directories superseded by the manifest (keeping
    the current one plus ``keep_latest - 1`` most recent others for
    time-travel/debug reads). Without this, every merge batch leaks
    its predecessor's full snapshot — at table size S and B batches,
    O(S*B) dead storage. Safe order: the manifest always points at a
    kept snapshot, and removal never touches it, so concurrent readers
    of the CURRENT snapshot are unaffected (readers of already-
    superseded snapshots race with vacuum by design, as in every
    snapshot-table format). Works on both flat and bucketed layouts.
    Returns the removed paths."""
    import shutil

    removed: list[str] = []
    roots = [table_dir] + [
        os.path.join(table_dir, d)
        for d in sorted(os.listdir(table_dir))
        if d.startswith("bucket=")
    ]
    for root in roots:
        manifest = os.path.join(root, _MANIFEST)
        if not os.path.exists(manifest):
            continue
        with open(manifest, encoding="utf-8") as fh:
            current = fh.read().strip()
        snaps = sorted(
            (d for d in os.listdir(root) if d.startswith("snap_")),
            key=lambda d: int(d.split("_", 1)[1]),
            reverse=True,
        )
        keep = {current, *snaps[: max(keep_latest - 1, 0)]}
        for d in snaps:
            if d not in keep:
                path = os.path.join(root, d)
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
    return removed


# ---------------------------------------------------------------------------
# Time travel: read the table AS OF an earlier batch
# ---------------------------------------------------------------------------
# Snapshots are retained until vacuum() trims them, so any batch id
# still on disk is a readable point-in-time view — the same AS OF
# contract table formats expose, driven by the same manifest-per-
# snapshot layout. Bucketed tables rewrite only touched buckets, so
# "as of batch B" per bucket means its newest snapshot with id <= B.


def list_snapshot_ids(table_dir: str) -> list[int]:
    """Batch ids with a readable snapshot (flat layout: this root;
    bucketed layout: union over buckets)."""
    ids: set[int] = set()
    roots = [table_dir] + [
        os.path.join(table_dir, d)
        for d in sorted(os.listdir(table_dir))
        if d.startswith("bucket=")
    ]
    for root in roots:
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if d.startswith("snap_"):
                ids.add(int(d.split("_", 1)[1]))
    return sorted(ids)


def _snap_as_of(root: str, batch_id: int) -> str | None:
    if not os.path.isdir(root):
        return None
    best = None
    for d in os.listdir(root):
        if d.startswith("snap_"):
            sid = int(d.split("_", 1)[1])
            if sid <= batch_id and (best is None or sid > best):
                best = sid
    return os.path.join(root, f"snap_{best}") if best is not None else None


def read_table_as_of(
    spark: SparkSession, table_dir: str, batch_id: int
) -> DataFrame | None:
    """Point-in-time read: the table state right after ``batch_id``
    was merged. Flat tables read one snapshot; bucketed tables read,
    per bucket, the newest snapshot at or before ``batch_id`` (buckets
    untouched by later batches already ARE the as-of state; a bucket
    whose earliest snapshot is newer than ``batch_id`` did not exist
    yet and contributes nothing). Returns None when nothing that old
    exists anywhere.

    Caveat shared with every snapshot-table format: an as-of read is
    only faithful while vacuum() has not trimmed the snapshots that
    id needs — size ``vacuum(keep_latest=...)`` to the history window
    you intend to query."""
    buckets = [
        os.path.join(table_dir, d)
        for d in sorted(os.listdir(table_dir))
        if d.startswith("bucket=")
    ]
    if not buckets:
        snap = _snap_as_of(table_dir, batch_id)
        return spark.read.parquet(snap) if snap else None
    dirs = [s for b in buckets if (s := _snap_as_of(b, batch_id))]
    return spark.read.parquet(*dirs) if dirs else None
