"""Keyed MERGE (upsert) for control tables (SURVEY.md §2.3).

The reference's signature write is a keyed point update applied by
rewriting the WHOLE control CSV through one writer (reference
lambda/update-control.py:29-36, lambda/collect-data.py:111-135) — a
single-writer full-table rewrite that cannot scale past one bounded table.
This module is the at-scale form SURVEY §2.3 calls for (Delta MERGE INTO
semantics, parquet-native so it runs on the baked-in stack):

  layout   control table partitioned by bucket = pmod(xxhash64(key), B)
  merge    join ONLY the buckets containing updated keys against the
           update set (co-partitioned equi-join on the key)
  commit   dynamic partition overwrite — untouched buckets are neither
           read nor rewritten; the partition swap is atomic PER BUCKET
           via the parquet commit protocol

Consistency contract (narrower than Delta's MERGE — stated, not implied):
  - SINGLE WRITER. There is no commit log or lock; two concurrent
    merge_upsert calls on the same path can interleave bucket overwrites
    and silently lose one writer's updates. Serialize writers externally
    (the reference's Lambda is effectively single-writer too).
  - PER-BUCKET atomicity only. A failure mid-commit can leave some
    affected buckets merged and others not — re-running the SAME merge
    heals the table (the merge is idempotent: coalesce(update, stored)
    applied twice is the same row), but readers in between may see a
    partially-applied batch across buckets.
  - _COMMIT marker, swapped LAST. Every completed write (init or merge)
    finishes by swapping a `_COMMIT` marker carrying a fresh token —
    buckets first, marker last, via a tmp-file + rename (atomic on
    rename-capable stores; on S3-style stores the rename is copy+delete
    and the guard weakens to read-after-write). Readers get a
    consistent-view guard WITHOUT a Delta log: a missing marker means
    init-in-progress or a crash mid-commit (read_bucketed_control
    refuses by default); a token that CHANGED between the start and end
    of a read means a writer overlapped the scan — capture it with
    read_commit_token before, re-check after, retry on mismatch.
  - localCheckpoint is not fault-tolerant: losing an executor during the
    write fails the job (acceptable for bounded control tables; use
    reliable checkpoint/Delta where that matters).

Cost per merge is O(|affected buckets| + |updates|), independent of total
table size once B spreads keys: point updates touch ~1 bucket, a batch of
u updates at most min(u, B). CSV compatibility (write_control_csv) remains
the export sink; this is the system of record.

Update semantics match the reference's column-wise point update: a
non-NULL update value replaces the stored value; NULL preserves it
(collect-data.py writes whole rows, but its updates always carry values —
the NULL-preserves rule is what MERGE ... WHEN MATCHED THEN UPDATE SET
col = coalesce(u.col, t.col) expresses). Unmatched update keys INSERT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_expr(key_col: str, n_buckets: int) -> Column:
    """Deterministic bucket id for a key: pmod(xxhash64(key), n_buckets)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


_COMMIT = "_COMMIT"


def _fs_and_path(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for `path` — works for any scheme the
    session's Hadoop conf resolves (file://, hdfs://, s3a://, ...)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def write_small_file(spark: SparkSession, path: str, data: bytes) -> None:
    """Write a bounded metadata file via tmp + rename, ATOMICALLY
    replacing any live copy: the rename goes through FileContext with
    Options.Rename.OVERWRITE (atomic on local FS and HDFS), so no
    reader or crash can observe a missing-file window during a swap.
    Stores without FileContext bindings fall back to delete + rename —
    a read-after-write window no smaller primitive exists for there
    (S3A's rename is copy + delete regardless)."""
    jvm = spark._jvm
    fs, _ = _fs_and_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    final = jvm.org.apache.hadoop.fs.Path(path)
    out = fs.create(tmp, True)
    out.write(bytearray(data))
    out.close()
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            final.toUri(), spark._jsc.hadoopConfiguration()
        )
        arr = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        arr[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, final, arr)
    except Exception as fc_err:
        if fs.exists(final):
            fs.delete(final, False)
        # fs.rename signals failure by RETURN VALUE, not exception — a
        # silently-failed rename here would leave the marker missing
        # (readers see an uncommitted table) with no error surfaced.
        if not fs.rename(tmp, final):
            raise IOError(
                f"atomic-replace fallback failed: rename {path}.tmp -> "
                f"{path} returned false after the live copy was deleted "
                f"(FileContext path failed with: {fc_err})"
            ) from fc_err


def read_small_file(spark: SparkSession, path: str) -> bytes | None:
    """Read a bounded metadata file through the Hadoop FS API (scheme-
    portable), or None if absent; streamed via IOUtils into one gateway
    transfer, not byte-at-a-time py4j calls."""
    jvm = spark._jvm
    fs, _ = _fs_and_path(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
        return bytes(baos.toByteArray())
    finally:
        stream.close()


def write_commit_marker(spark: SparkSession, path: str) -> str:
    """Swap the table's `_COMMIT` marker with a fresh token, LAST in the
    write protocol (atomic replace — see write_small_file). Returns the
    token written."""
    import uuid

    token = uuid.uuid4().hex
    write_small_file(spark, f"{path}/{_COMMIT}", token.encode("ascii"))
    return token


def read_commit_token(spark: SparkSession, path: str) -> str | None:
    """The current `_COMMIT` token, or None when the table has never
    completed a write (or a writer crashed mid-commit)."""
    raw = read_small_file(spark, f"{path}/{_COMMIT}")
    return None if raw is None else raw.decode("ascii")


def write_bucketed_control(
    df: DataFrame, path: str, key_col: str, n_buckets: int = 64
) -> None:
    """Initialize (or fully replace) a bucket-partitioned control table;
    the `_COMMIT` marker is swapped last."""
    (
        df.withColumn("bucket", bucket_expr(key_col, n_buckets))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    write_commit_marker(df.sparkSession, path)


def read_bucketed_control(
    spark: SparkSession, path: str, require_commit: bool = True
) -> DataFrame:
    """Read the control table back without the physical bucket column.

    require_commit=True (default) refuses a table with no `_COMMIT`
    marker — either initialization never finished or a writer crashed
    after overwriting some buckets (re-run the same merge to heal, which
    rewrites the marker). For an overlap-detection guard, capture
    read_commit_token before and re-check after materializing."""
    if require_commit and read_commit_token(spark, path) is None:
        raise RuntimeError(
            f"bucketed control table at {path} has no {_COMMIT} marker — "
            "initialization incomplete or a writer crashed mid-commit; "
            "re-run the merge to heal, or pass require_commit=False to "
            "read the possibly-inconsistent state"
        )
    # mergeSchema reconciles buckets written before an additive schema
    # evolution (merge_upsert widening) with buckets written after it:
    # old files simply lack the new columns and read back as NULL.
    return (
        spark.read.option("mergeSchema", "true").parquet(path).drop("bucket")
    )


def merged_relation(
    existing: DataFrame, upd: DataFrame, key_col: str
) -> DataFrame:
    """The MERGE output relation shared by merge_upsert and the
    snapshot writer (sources/snapshots.py): `existing` and `upd` both
    carry a `bucket` column; matched keys take each non-NULL update
    value (NULL preserves the stored one), unmatched keys insert.

    SCHEMA EVOLUTION (additive): update columns absent from the stored
    table widen it — existing rows in the affected buckets backfill
    NULL, untouched buckets keep their old files and reconcile at read
    time via mergeSchema (read_bucketed_control sets it). Dropping or
    retyping columns is NOT supported here: a type change would make
    old and new bucket files irreconcilable under parquet mergeSchema,
    so it must go through a full-table rewrite instead.

    A data column absent from the update set is an implicit NULL —
    "preserve the stored value" under the coalesce rule. This is what
    lets callers send PARTIAL updates (just the columns they touch)
    instead of whole rows, the reference's actual event shape
    (update-control.py events carry only status/date_completed)."""
    data_cols = [c for c in existing.columns if c not in (key_col, "bucket")]
    upd_data = [c for c in upd.columns if c not in (key_col, "bucket")]
    new_cols = [c for c in upd_data if c not in data_cols]
    for c in new_cols:
        existing = existing.withColumn(
            c, F.lit(None).cast(upd.schema[c].dataType)
        )
    data_cols += new_cols
    upd_sel = upd.select(
        F.col(key_col),
        F.col("bucket").alias("__u_bucket"),
        *[
            (
                F.col(c)
                if c in upd_data
                else F.lit(None).cast(existing.schema[c].dataType)
            ).alias(f"__u_{c}")
            for c in data_cols
        ],
        F.lit(1).alias("__is_upd"),
    )
    return (
        existing.join(upd_sel, key_col, "full_outer")
        .select(
            F.col(key_col),
            # insert rows have no existing bucket; recompute = same expr
            F.coalesce(F.col("bucket"), F.col("__u_bucket")).alias("bucket"),
            *[
                F.when(
                    F.col("__is_upd").isNotNull(),
                    F.coalesce(F.col(f"__u_{c}"), F.col(c)),
                )
                .otherwise(F.col(c))
                .alias(c)
                for c in data_cols
            ],
        )
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    n_buckets: int = 64,
) -> None:
    """MERGE `updates` into the bucket-partitioned control table at `path`.

    Matched keys: each non-NULL update column replaces the stored value
    (NULL preserves — see module docstring). Unmatched keys insert.
    Only partitions whose bucket contains an updated key are read (parquet
    partition pruning on the bucket filter) and rewritten (dynamic
    partition overwrite); every other bucket's files are untouched.

    The affected-bucket list is collected to the driver — bounded by
    n_buckets (a layout constant, like a shuffle-partition count), never
    by data size.

    Commit protocol: the marker is DROPPED before the bucket overwrites
    and re-written (fresh token) after the last bucket lands — a crash
    anywhere in between leaves the table visibly uncommitted
    (read_bucketed_control refuses) instead of silently half-merged.
    """
    upd = updates.withColumn("bucket", bucket_expr(key_col, n_buckets))
    affected = [r["bucket"] for r in upd.select("bucket").distinct().collect()]
    if not affected:
        return
    existing = spark.read.parquet(path).filter(F.col("bucket").isin(affected))
    merged = merged_relation(existing, upd, key_col)
    # materialize before writing: Spark (correctly) refuses to overwrite a
    # path its plan is still reading. The materialized set is the merge
    # working set only — affected buckets + updates — never the table.
    merged = merged.localCheckpoint(eager=True)
    # invalidate the marker FIRST: if the bucket overwrite below dies
    # part-way, readers see "uncommitted", not a silently mixed table
    jvm = spark._jvm
    fs, _ = _fs_and_path(spark, path)
    marker = jvm.org.apache.hadoop.fs.Path(f"{path}/{_COMMIT}")
    if fs.exists(marker):
        fs.delete(marker, False)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            merged.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    write_commit_marker(spark, path)


def delete_keys(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_col: str,
    n_buckets: int = 64,
) -> None:
    """Hard-DELETE the given keys from the bucket-partitioned table —
    the GDPR/right-to-erasure primitive.  Same bucket discipline as
    merge_upsert: only partitions whose bucket contains a requested key
    are read (partition pruning on the bucket filter) and rewritten
    with an ANTI join against the key set; every other bucket's files
    are untouched, so the rewrite cost scales with the delete set's
    bucket spread, never the table size.  A bucket whose every row is
    deleted loses its partition directory entirely.

    Protocol: survivors are staged fully materialized to a hidden
    `.delete_staging` directory BEFORE any live file is touched, then
    each affected bucket directory swaps via ATOMIC RENAMES only —
    live renames into a `.delete_trash` sibling, staged renames into
    place — never a delete of a directory that still holds the only
    copy of anything (fs.delete is non-atomic on local FS and S3A, so
    a crash mid-delete would leave a PRESENT-but-partial directory a
    presence-based heal cannot distinguish from a whole one).  The
    `_COMMIT` marker drops before the first swap and is re-written
    after the last, so a crash anywhere leaves the table VISIBLY
    uncommitted (read_bucketed_control refuses).  Re-running ANY
    delete first heals: while the marker is absent, every bucket still
    present in staging is authoritative — the live directory (whole or
    partial) moves to trash and the staged copy renames into place —
    so no crash window can lose a survivor: before the marker drops
    the live data is intact; after it, each bucket's survivors exist
    in staging until the instant an atomic rename publishes them.
    """
    fs, p = _fs_and_path(spark, path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    staging = hpath(p, ".delete_staging")
    trash = hpath(p, ".delete_trash")

    # Heal a crashed previous swap BEFORE reading the table.
    if fs.exists(staging) or fs.exists(trash):
        if not fs.exists(hpath(p, _COMMIT)):
            # Mid-swap crash: for every AFFECTED bucket (the `_AFFECTED`
            # manifest written with the staging), the staged copy is the
            # authoritative post-delete content — and a manifest bucket
            # with NO staged directory was fully erased, so its live
            # directory must go too (without the manifest, a crash
            # before a fully-erased bucket's removal would silently keep
            # its deleted keys and the heal would re-commit them). The
            # live dir may be whole, partial, or already trashed — all
            # superseded. Trash content is always droppable: a directory
            # only enters trash after its replacement (or erasure) was
            # fully staged/recorded.
            if fs.exists(staging):
                manifest = hpath(staging, "_AFFECTED")
                # bucket-name -> 'e' (fully erased: live dir must go) or
                # 's' (staged survivors: the staged copy is
                # authoritative). The DISTINCTION must come from the
                # manifest, not from staged-dir presence: after a
                # PARTIAL swap a staged dir is absent either because the
                # bucket was erased OR because its rename already
                # published it — and treating a published bucket as
                # erased would trash its survivors (the exact data-loss
                # window this typed manifest closes).
                states: dict[str, str] = {}
                raw = read_small_file(spark, manifest.toString())
                if raw is not None:
                    for line in raw.decode().split():
                        if not line:
                            continue
                        bucket, _, state = line.partition(":")
                        # untyped legacy line: default to the
                        # NON-destructive interpretation
                        states[f"bucket={bucket}"] = state or "s"
                for st in fs.listStatus(staging):
                    n_ = st.getPath().getName()
                    if n_.startswith("bucket="):
                        states.setdefault(n_, "s")
                for name in sorted(states):
                    dst = hpath(p, name)
                    src = hpath(staging, name)
                    if states[name] == "e":
                        # fully erased: any live dir is superseded
                        if fs.exists(dst):
                            fs.mkdirs(trash)
                            tb = hpath(trash, name)
                            fs.delete(tb, True)
                            fs.rename(dst, tb)
                    elif fs.exists(src):
                        # staged survivors not yet published: swap now
                        if fs.exists(dst):
                            fs.mkdirs(trash)
                            tb = hpath(trash, name)
                            fs.delete(tb, True)
                            fs.rename(dst, tb)
                        fs.rename(src, dst)
                    # else: staged bucket whose rename already
                    # published — dst IS the survivors; leave it alone
            fs.delete(trash, True)
            fs.delete(staging, True)
            # the heal completes the CRASHED operation — re-commit its
            # end state now, even if this call has no work itself
            write_commit_marker(spark, path)
        else:
            # Crash BEFORE the marker dropped: the live table is still
            # the committed pre-delete state and staging/trash are
            # stale artifacts of an operation that never began its swap.
            fs.delete(staging, True)
            fs.delete(trash, True)

    k = keys.select(F.col(key_col)).distinct().withColumn(
        "bucket", bucket_expr(key_col, n_buckets)
    )
    affected = [r["bucket"] for r in k.select("bucket").distinct().collect()]
    if not affected:
        return
    existing = spark.read.parquet(path).filter(F.col("bucket").isin(affected))
    kept = existing.join(k.select(key_col), key_col, "left_anti")

    # Stage the survivors to a DOT-directory inside the table (hidden
    # from parquet directory listings), fully materialized on disk
    # BEFORE any old file is dropped — caching instead would be
    # eviction-unsafe: a recompute after the drop would read deleted
    # files. Then swap per bucket. Dynamic partition overwrite cannot
    # be used here: it only touches partitions PRESENT in the written
    # data, so a fully-emptied bucket would keep its old files.
    (
        kept.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(str(staging))
    )
    # Affected-bucket manifest, TYPED per bucket: 'e' = fully erased (no
    # survivors staged; the live dir must be removed), 's' = survivors
    # staged. The type must be recorded here, while it is still
    # knowable: during a heal after a partial swap, a missing staged dir
    # is ambiguous (erased vs already-published) and guessing 'erased'
    # would trash published survivors.
    lines = [
        f"{b}:{'s' if fs.exists(hpath(staging, f'bucket={b}')) else 'e'}"
        for b in affected
    ]
    out = fs.create(hpath(staging, "_AFFECTED"), True)
    try:
        out.write(bytearray("\n".join(lines).encode()))
    finally:
        out.close()

    fs.delete(hpath(p, _COMMIT), False)
    fs.mkdirs(trash)
    for b in affected:
        dst = hpath(p, f"bucket={b}")
        src = hpath(staging, f"bucket={b}")
        if fs.exists(dst):
            tb = hpath(trash, f"bucket={b}")
            fs.delete(tb, True)  # stale trash from a healed prior crash
            fs.rename(dst, tb)  # atomic: live steps aside, still whole
        if fs.exists(src):  # absent = bucket fully erased
            fs.rename(src, dst)  # atomic: survivors publish in one op
    fs.delete(trash, True)
    fs.delete(staging, True)
    write_commit_marker(spark, path)
