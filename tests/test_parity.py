"""Local replica of the driver's DuckDB-oracle gate (BASELINE.md):
for every catalog query with an oracle, run the Spark query and the oracle
SQL on the same testdata and require identical row count, column names, and
values (order-insensitive, bit-exact — the engine's determinism conventions
are designed to survive an exact hash).

Run at sf0.001 by default for speed; PARITY_SF_DIR=/root/testdata/sf0.01
reproduces the driver's scale.
"""

from __future__ import annotations

import math

import pytest

from citydata_etl_spark.plans.catalog import load_all
from tests.conftest import SF_ORACLE

CATALOG = load_all()
ORACLED = [name for name, q in CATALOG.items() if q.oracle is not None]
ROWS_ONLY = [name for name, q in CATALOG.items() if q.oracle is None]


def normalize(df):
    """Sort columns by name, then rows by all values — the driver's
    order-insensitive compare."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def assert_frames_match(sdf, ddf, name):
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns differ: spark={sorted(sdf.columns)} "
        f"duck={sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), (
        f"{name}: row counts differ: spark={len(sdf)} duck={len(ddf)}"
    )
    import pandas as pd

    s, d = normalize(sdf), normalize(ddf)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            a_na = a is None or (not isinstance(a, str) and pd.isna(a))
            b_na = b is None or (not isinstance(b, str) and pd.isna(b))
            if a_na or b_na:
                assert a_na and b_na, f"{name}.{col}[{i}]: {a!r} != {b!r}"
                continue
            if isinstance(a, float) and isinstance(b, float):
                assert a == b, (
                    f"{name}.{col}[{i}]: {a!r} != {b!r} (delta={a - b!r})"
                )
            else:
                assert a == b, f"{name}.{col}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, name):
    q = CATALOG[name]
    sdf = q.spark_fn(spark, SF_ORACLE).toPandas()
    ddf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(sdf, ddf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = CATALOG[name]
    df = q.spark_fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
