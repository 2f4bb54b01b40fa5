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
