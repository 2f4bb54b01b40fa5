"""Physical-layout operators (sources/layout.py): the properties the
catalog docs promise must hold on the actual files — compaction really
reduces the file count losslessly, and the sorted layout's parquet
footers really carry disjoint min/max ranges (the data-skipping claim).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from citydata_etl_spark.sources.layout import (
    compact,
    dir_stats,
    write_sorted_layout,
)
from citydata_etl_spark.sources.readers import read_testdata
from tests.conftest import SF_SMOKE


def _data_files(path: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f)
        and not os.path.basename(f).startswith(("_", "."))
    )


def test_compact_reduces_files_losslessly(spark, tmp_path):
    frag = str(tmp_path / "frag")
    packed = str(tmp_path / "packed")
    orders = read_testdata(spark, SF_SMOKE, "orders")
    orders.repartition(32).write.parquet(frag)
    assert len(_data_files(frag)) == 32

    n_out = compact(spark, frag, packed)
    assert n_out == 1  # sf0.001 orders is far below one 128 MB target
    assert len(_data_files(packed)) == 1

    back = spark.read.parquet(packed)
    assert back.count() == orders.count()
    # lossless: identical keyed content, not just cardinality
    assert (
        back.select("o_orderkey").exceptAll(orders.select("o_orderkey")).count()
        == 0
    )


def test_dir_stats_counts_data_files_only(spark, tmp_path):
    p = str(tmp_path / "t")
    read_testdata(spark, SF_SMOKE, "region").repartition(3).write.parquet(p)
    total, n = dir_stats(spark, p)
    assert n == 3  # _SUCCESS and .crc files excluded
    assert total == sum(os.path.getsize(f) for f in _data_files(p))


def test_sorted_layout_footers_are_disjoint(spark, tmp_path):
    path = str(tmp_path / "sorted")
    orders = read_testdata(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_sorted_layout(orders, path, "o_orderdate", 4)

    files = [f for f in _data_files(path) if f.endswith(".parquet")]
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i
            for i in range(len(md.schema))
            if md.schema.column(i).name == "o_orderdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))

    # disjoint: sorted by min, each file's max <= next file's min
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {hi_a} > {lo_b}"

    back = spark.read.parquet(path)
    assert back.count() == orders.count()


def test_compact_respects_target_size(spark, tmp_path):
    """With a target smaller than the input, compaction produces
    ceil(bytes/target) files, not one — the right-sizing contract, not
    just a coalesce-to-1."""
    import math

    frag = str(tmp_path / "frag")
    packed = str(tmp_path / "packed")
    orders = read_testdata(spark, SF_SMOKE, "orders")
    orders.repartition(16).write.parquet(frag)
    total, _ = dir_stats(spark, frag)

    target = total // 3  # force multiple right-sized outputs
    n_out = compact(spark, frag, packed, target_file_bytes=target)
    assert n_out == math.ceil(total / target)
    files = [f for f in _data_files(packed) if f.endswith(".parquet")]
    assert len(files) == n_out
    # round-robin repartition -> evenly sized outputs (within 2x)
    sizes = sorted(os.path.getsize(f) for f in files)
    assert sizes[-1] <= 2 * sizes[0]
    assert spark.read.parquet(packed).count() == orders.count()


def test_morton_interleave_matches_reference(spark):
    """The codegen bit-spread must equal a plain-Python interleave."""
    import random

    from pyspark.sql import functions as F

    from citydata_etl_spark.sources.layout import morton_interleave

    def ref(x, y, bits=16):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rnd = random.Random(3)
    rows = [(rnd.randrange(1 << 16), rnd.randrange(1 << 16))
            for _ in range(200)] + [(0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "x LONG, y LONG")
    got = [
        r["z"]
        for r in df.select(
            morton_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    ]
    assert got == [ref(x, y) for x, y in rows]


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """The multi-dimensional data-skipping claim, proven from real
    parquet footers: a THIN customer band (full date range) intersects
    only a fraction of the z-ordered files, while it intersects EVERY
    file of the date-sorted layout (whose custkey footer ranges are all
    full-width). This is exactly the query class 1-D clustering cannot
    skip for."""
    from pyspark.sql import functions as F

    from citydata_etl_spark.sources.layout import (
        write_sorted_layout,
        write_zorder_layout,
    )

    orders = read_testdata(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    df = orders.withColumn(
        "zx", F.pmod(F.col("o_custkey"), F.lit(65536))
    ).withColumn(
        "zy", F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zorder_layout(df, zpath, "zx", "zy", n_files=16)
    write_sorted_layout(df, spath, "o_orderdate", 16)

    def custkey_ranges(path):
        out = []
        for f in [f for f in _data_files(path) if f.endswith(".parquet")]:
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(len(md.schema))
                if md.schema.column(i).name == "o_custkey"
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                assert st is not None and st.has_min_max
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    zr, sr = custkey_ranges(zpath), custkey_ranges(spath)
    lo = min(r[0] for r in sr)
    hi = max(r[1] for r in sr)
    band_lo = lo
    band_hi = lo + (hi - lo) // 8  # thin band: ~1/8 of the key domain

    def hits(ranges):
        return sum(1 for mn, mx in ranges if mn <= band_hi and mx >= band_lo)

    assert hits(sr) == len(sr)       # 1-D layout: zero files skippable
    assert hits(zr) <= len(zr) // 2  # z-order: at least half skipped


def test_bloom_layout_materializes_only_where_dictionary_overflows(
    spark, tmp_path
):
    """write_bloom_layout's footer contract, proved from real footers
    via parquet-mr: the requested high-cardinality key column carries a
    bloom filter (offset >= 0), while dictionary-covered columns carry
    none — including a column the writer was ASKED to bloom (parquet-mr
    adaptively skips it because the dictionary already answers point
    probes exactly). Also lossless: the bloom copy reads back row-
    identical."""
    from citydata_etl_spark.sources.layout import (
        bloom_filter_offsets,
        write_bloom_layout,
    )

    # sf0.01: o_orderkey has 15k distinct (overflows the dict page),
    # o_orderstatus has 3 (fully dictionary-encoded)
    orders = read_testdata(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_bloom")
    write_bloom_layout(
        orders, path, ["o_orderkey", "o_orderstatus"], expected_ndv=100_000
    )
    off = bloom_filter_offsets(spark, path)
    assert off["o_orderkey"] >= 0, off
    assert off["o_orderstatus"] == -1, off  # requested, adaptively skipped
    assert off["o_custkey"] == -1, off      # never requested

    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert (
        back.exceptAll(orders).count() == 0
        and orders.exceptAll(back).count() == 0
    )
