"""Merge-on-read deletes via DELETION VECTORS — the complement of the
copy-on-write delete in sources/merge.py:delete_keys (u6).

Copy-on-write rewrites every affected bucket at delete time: reads stay
pure scans but a wide delete rewrites much of the table. Merge-on-read
inverts the trade: a delete APPENDS the deleted keys to a small
tombstone sidecar (`<root>/_dv/`) and the base data files are NEVER
touched; readers subtract the tombstones at scan time. This is the
layout decision behind Delta/Iceberg deletion vectors / position
deletes, expressed with plain parquet + an anti-join — at 100 TB a
GDPR-sized delete becomes a kilobyte append instead of a table rewrite,
and the rewrite cost is deferred to a compaction that can run whenever
it is cheap (u6's staged-swap machinery is exactly that compaction).

Contracts:
  - the sidecar is append-only; repeated appends of the same key are
    harmless (readers apply tombstones with set semantics) but callers
    should guard replays to keep the sidecar bounded;
  - readers broadcast the tombstone set while it is small (the normal
    regime — compaction folds it back before it grows); if a sidecar
    outgrows the broadcast threshold Spark's planner falls back to a
    shuffle anti-join on the key — correct either way;
  - `purge_deletions` folds the sidecar into a rewrite (one pass) and
    truncates it, restoring scan speed; visible rows are identical
    before and after by construction (pinned in tests/test_etl.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DV_DIR = "_dv"
_BASE_DIR = "base"


def write_mor_table(df: DataFrame, root: str) -> None:
    """Write the base data files of a merge-on-read table. Called once;
    deletes never touch these files again (the test asserts the file
    listing is byte-identical across delete waves)."""
    df.write.mode("overwrite").parquet(os.path.join(root, _BASE_DIR))


def append_deletion_vector(keys: DataFrame, root: str) -> None:
    """Record a delete: append the (single-column) key DataFrame to the
    tombstone sidecar. No base file is read, listed, or written — the
    cost is proportional to the DELETE SET, never the table."""
    keys.write.mode("append").parquet(os.path.join(root, _DV_DIR))


def read_mor_table(spark: SparkSession, root: str, key: str) -> DataFrame:
    """Scan-time view: base rows minus tombstoned keys. The sidecar is
    deduplicated (set semantics — replayed appends don't change
    results) and broadcast into a LEFT ANTI join; filters and column
    pruning on the result still push down to the base scan because the
    anti-join only references the key column."""
    base = spark.read.parquet(os.path.join(root, _BASE_DIR))
    dv_path = os.path.join(root, _DV_DIR)
    if not os.path.exists(dv_path):
        return base
    dv = spark.read.parquet(dv_path).select(key).distinct()
    return base.join(F.broadcast(dv), key, "left_anti")


def purge_deletions(spark: SparkSession, root: str, key: str) -> None:
    """Compaction: fold the sidecar into the base files (one rewrite of
    the visible rows) and truncate the tombstones. Visible rows are
    unchanged (pinned by test); the rewrite is staged to a sibling
    directory first, so no reader ever sees partial data.

    SINGLE-WRITER MAINTENANCE OP: the swap is two directory renames,
    and between them there is an instant with no live `base` — a
    reader racing the purge can fail with a missing path (it can never
    read wrong rows). Run it like any table-maintenance window, with
    readers drained — the same operational contract as
    sources/merge.py's staged-swap compaction. Crash recovery: dying
    before the first rename leaves the table untouched (staged dir is
    garbage); dying between the renames leaves `base.old` intact for
    manual restore; dying after the second rename but before the
    sidecar truncate re-applies tombstones to rows already purged —
    harmless by set semantics."""
    import shutil

    visible = read_mor_table(spark, root, key)
    staged = os.path.join(root, _BASE_DIR + ".staged")
    visible.write.mode("overwrite").parquet(staged)
    live = os.path.join(root, _BASE_DIR)
    old = os.path.join(root, _BASE_DIR + ".old")
    os.rename(live, old)
    os.rename(staged, live)
    shutil.rmtree(old)
    dv_path = os.path.join(root, _DV_DIR)
    if os.path.exists(dv_path):
        shutil.rmtree(dv_path)
