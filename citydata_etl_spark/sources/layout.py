"""Physical data-layout management: compaction, sorted (range-clustered)
layouts, and catalog-bucketed tables.

At 100 TB the dominant read-side costs are (a) small files — a crawl
ingest that lands 10^6 sub-megabyte parquet files makes every scan pay
10^6 opens and footer reads and starves the scheduler with tiny splits —
and (b) shuffles that re-do at query time the partitioning the writer
could have baked in once.  The three tools here attack both:

- ``compact``: rewrite a fragmented directory into ceil(bytes/target)
  right-sized files.  This is the maintenance job a 100 TB table runs on
  recently-ingested partitions (reference grounding: the reference's
  per-run CSV rewrite, process-staging.py — a full-file rewrite per
  batch — is the degenerate single-file form of the same operation).
- ``write_sorted_layout``: range-partition + sort-within-partitions so
  each output file covers a disjoint key range; parquet footer min/max
  then lets any engine skip files wholesale on range predicates.  The
  poor man's Z-order — exact for one clustering dimension.
- ``write_bucketed_table``: a Spark-catalog bucketed external table;
  tables bucketed the same way on the join key sort-merge WITHOUT an
  Exchange on either side — the shuffle happened once at write time
  (guarded by tests/test_plans.py::test_bucketed_join_is_shuffle_free).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) of a directory via the Hadoop
    FileSystem — no data read, metadata only."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = 0
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, markers
        total += st.getLen()
        n += 1
    return total, n


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``in_path`` into ``out_path`` with files sized ~target.

    The output file count is ceil(input_bytes / target) measured on the
    INPUT's compressed size — parquet->parquet recompression keeps the
    ratio close enough for sizing.  Uses ``repartition(n)`` (round-robin)
    rather than ``coalesce(n)``: coalesce merges existing partitions
    without a shuffle but inherits their skew, which for compaction —
    whose whole point is evenly-sized output files — is the wrong trade.
    The one round-robin shuffle is the cost of the rewrite and is
    embarrassingly parallel at any scale.  Returns the file count.
    """
    total, _ = dir_stats(spark, in_path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.format(fmt).load(in_path)
    df.repartition(n_out).write.format(fmt).mode("overwrite").save(out_path)
    return n_out


def write_sorted_layout(
    df: DataFrame,
    path: str,
    range_col: str,
    n_ranges: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Range-cluster ``df`` on ``range_col`` into ``n_ranges`` files and
    sort rows inside each.

    ``repartitionByRange`` samples the column to compute balanced range
    bounds (one pass, sample-sized driver cost at any scale), so each
    output file covers a DISJOINT interval of ``range_col``; the parquet
    footer min/max statistics then let a range predicate skip whole
    files before any IO.  ``sortWithinPartitions`` additionally orders
    rows inside the file so page-level (column index) statistics prune
    within the file.  tests/test_layout.py verifies disjointness from
    the actual parquet footers.
    """
    out = df.repartitionByRange(n_ranges, range_col).sortWithinPartitions(
        *(sort_cols or [range_col])
    )
    out.write.mode("overwrite").parquet(path)


def write_bloom_layout(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_ndv: int,
    n_files: int = 4,
) -> None:
    """Write ``df`` as parquet with a COLUMN BLOOM FILTER on each of
    ``bloom_cols`` — the storage-side index for point lookups on
    high-cardinality columns the footer min/max cannot help with (a
    hash-random key spans every file's min/max range, so range stats
    prune nothing; the bloom answers "definitely not in this row
    group" per key).

    parquet-mr's adaptive writer only MATERIALIZES the bloom when the
    column overflows its dictionary page: a fully dictionary-encoded
    chunk already answers point probes exactly, so a bloom would be
    pure overhead — which means low-cardinality columns silently get
    no bloom even when requested (verified from real footers in
    tests/test_layout.py). Size `expected_ndv` to the PER-ROW-GROUP
    distinct count, not the table's: oversizing only wastes the
    filter's few hundred KB, undersizing inflates the false-positive
    rate and with it the fraction of row groups read for nothing.
    """
    w = df.repartition(n_files).write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    w.parquet(path)


def bloom_filter_offsets(spark, path: str) -> dict[str, int]:
    """Per-column bloom-filter footer offset of the FIRST row group of
    the first parquet file under ``path`` (-1 = no bloom), read from
    the real footers via parquet-mr — the test-side proof that
    write_bloom_layout produced (or adaptively skipped) the filters.
    Driver-side metadata read only; no data IO."""
    jvm = spark._jvm
    hc = spark._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(hc)
    files = sorted(
        (f.getPath() for f in fs.listStatus(fs_path)
         if f.getPath().getName().endswith(".parquet")),
        key=lambda p: p.getName(),
    )
    rd = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
        jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            files[0], hc
        )
    )
    try:
        return {
            col.getPath().toDotString(): col.getBloomFilterOffset()
            for col in rd.getFooter().getBlocks().get(0).getColumns()
        }
    finally:
        rd.close()


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
) -> None:
    """Save ``df`` as an external bucketed table (data under ``path``,
    metadata in the session catalog).  Idempotent: a table that already
    exists in this session is left untouched.

    The ``repartition(n_buckets, bucket_col)`` before the write uses the
    same Murmur3 hash as the bucket spec, so every write task holds
    exactly one bucket's rows and each bucket lands in ONE file — which
    is what lets the bucketed scan also satisfy the join's sort
    requirement from the ``sortBy`` metadata instead of re-sorting.
    """
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        return
    (
        df.repartition(n_buckets, bucket_col)
        .write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table)
    )


def morton_interleave(x, y, bits: int = 16):
    """Z-order (Morton) curve value from two non-negative integer
    columns, each truncated to ``bits`` bits — pure codegen: the classic
    bit-spreading magic-number sequence (each step doubles the gap
    between occupied bit positions), so the interleave costs a handful
    of shift/and/or expressions per row, no UDF.

    z = spread(x) | spread(y) << 1; nearby (x, y) points get nearby z
    values, which is what gives a z-sorted layout locality in BOTH
    dimensions at once.
    """
    masks = [
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ]

    def spread(c):
        c = c.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        for shift, mask in masks:
            c = (
                c.bitwiseOR(F.shiftleft(c, shift))
            ).bitwiseAND(F.lit(mask))
        return c

    return spread(x).bitwiseOR(F.shiftleft(spread(y), 1))


def write_zorder_layout(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Z-order-cluster ``df`` on TWO dimensions: compute the Morton
    value of (col_x, col_y), range-partition and sort on it, write, and
    drop the helper column.

    The one-dimensional sorted layout (write_sorted_layout) makes footer
    min/max tight on ONE column and useless on every other; the Z-curve
    trades a little of that tightness for locality in BOTH dimensions,
    so a 2-D box predicate (customer range AND date range) skips files
    on both bounds. This is the same layout decision Delta/Iceberg's
    OPTIMIZE ZORDER makes; here it is ~five codegen expressions and a
    repartitionByRange — no table format required. Verified from real
    parquet footers in tests/test_layout.py (a thin band in one
    dimension skips most z-files and zero 1-D-sorted files).

    Both columns must be integers. Each dimension is NORMALIZED to the
    ``bits``-bit domain from its observed min/max first — without this,
    the dimension with the larger magnitude owns all the high z bits
    and the interleave degenerates to a 1-D sort on it. The min/max
    probe is one aggregate returning four scalars (same driver-cost
    class as repartitionByRange's range sampling).
    """
    lo_x, hi_x, lo_y, hi_y = (
        int(v)
        for v in df.agg(
            F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
        ).first()
    )
    domain = 1 << bits

    def norm(col: str, lo: int, hi: int):
        span = max(hi - lo + 1, 1)
        return F.floor(
            (F.col(col).cast("bigint") - F.lit(lo))
            * F.lit(domain)
            / F.lit(span)
        ).cast("bigint")

    z = morton_interleave(
        norm(col_x, lo_x, hi_x), norm(col_y, lo_y, hi_y), bits
    )
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(path)
