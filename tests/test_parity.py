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


def _hash_class(t) -> str:
    """Collapse an Arrow type into the class the driver's type-sensitive
    value hash distinguishes. The round-4 driver failures proved that
    DuckDB's HUGEINT (decimal128(38,0), surfacing as Python Decimal) hashes
    differently from int64 even when every value is numerically equal —
    Python `==` treats Decimal(5) == 5 as True, so a pandas-level compare
    is blind to the whole class. Any oracle column whose Arrow class
    differs from the Spark column's class is a driver hash-fail waiting to
    happen, regardless of values."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_hash_class(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def assert_arrow_types_match(spark_tbl, duck_tbl, name):
    """Type-strict schema audit over the Arrow representations both engines
    actually ship to the driver (Spark toArrow() vs DuckDB
    fetch_arrow_table()) — the layer where HUGEINT-vs-BIGINT divergence
    lives."""
    s_types = {f.name: f.type for f in spark_tbl.schema}
    d_types = {f.name: f.type for f in duck_tbl.schema}
    for col in sorted(set(s_types) & set(d_types)):
        sc, dc = _hash_class(s_types[col]), _hash_class(d_types[col])
        assert sc == dc, (
            f"{name}.{col}: Arrow type class mismatch — spark "
            f"{s_types[col]} ({sc}) vs oracle {d_types[col]} ({dc}); "
            "the driver's type-sensitive hash WILL fail this even if "
            "values are equal (cast the oracle column, e.g. "
            "CAST(... AS BIGINT) for sum()-derived HUGEINTs)"
        )


def normalize(df):
    """Sort columns by name, then rows by all values — the driver's
    order-insensitive compare. tz-aware timestamp columns (Spark's
    toArrow() stamps the session's UTC tz; DuckDB ships naive) are
    normalized to UTC-naive — same instant, metadata-only difference,
    and the driver verifiably hashes them equal (f1_f3/p6/j6/u4 are
    green in its artifacts)."""
    df = df.copy()
    for col in df.columns:
        if getattr(df[col].dtype, "tz", None) is not None:
            df[col] = df[col].dt.tz_convert("UTC").dt.tz_localize(None)
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
    s_tbl = q.spark_fn(spark, SF_ORACLE).toArrow()
    d_tbl = duck.execute(q.oracle).fetch_arrow_table()
    assert_arrow_types_match(s_tbl, d_tbl, name)
    assert_frames_match(s_tbl.to_pandas(), d_tbl.to_pandas(), name)


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


def test_hashed_score_supplementary_plane_parity(spark, duck):
    """ADVICE r5: the quality scorer's token hash must agree across
    engines on NON-BMP input (emoji, rare CJK) — Spark iterates UTF-16
    code units while DuckDB iterates codepoints, so any raw-char fold
    silently diverges there and the ASCII sf corpora can never catch
    it. The hash therefore folds over hex(utf8_bytes(token)) — pure
    ASCII in both engines — and this test pins that on a corpus of
    supplementary-plane tokens (U+1F600 emoji, U+20000 CJK-B, Deseret),
    running the REAL operator against the REAL oracle expression on
    identical literal rows."""
    from citydata_etl_spark.operators.text import hashed_linear_score

    texts = [
        "\U0001f600 grin \U0001f680\U0001f680 rocket",
        "\U00020000 cjk-ext-b \U00010400 deseret mix\U0001f600ed",
        "plain ascii control row",
        "\U0001f9ea\U0001f9ec \U0001f9ea",
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    s_tbl = hashed_linear_score(sdf, n_buckets=512).toArrow()
    values = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(texts)
    )
    d_tbl = duck.execute(f"""
    WITH docs(doc_id, text) AS (VALUES {values}),
    t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM docs),
    w AS (
      SELECT doc_id, len(toks) AS n_tokens,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT), list_transform(toks,
                 tok -> ((list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                              list_transform(
                                list_filter(
                                  string_split(hex(encode(tok)), ''),
                                  c -> c <> ''),
                                c -> CAST(ascii(c) AS BIGINT))),
                            (acc, c) -> (acc * 31 + c) % 1000000007)
                           % 512) * 2654435761 + 12345)
                        % 2147483647 % 7 - 3)),
               (a, x) -> a + x) AS score_sum
      FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           score_sum, score_sum >= 0 AS keep
    FROM w
    """).fetch_arrow_table()
    assert_arrow_types_match(s_tbl, d_tbl, "hashed_score_nonbmp")
    assert_frames_match(
        s_tbl.to_pandas(), d_tbl.to_pandas(), "hashed_score_nonbmp"
    )


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
