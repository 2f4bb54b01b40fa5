"""The query catalog — the single registry behind __spark_entry__.py.

Each entry pairs a PySpark callable `(spark, sf_dir) -> DataFrame` with the
equivalent ANSI SQL for the DuckDB oracle (or None for ops that SQL cannot
express — streaming/stateful — which the driver checks rows-only).

Conventions (they make the driver's order-insensitive value-hash stable):
  - every computed column is aliased identically on both sides;
  - double sums go through DECIMAL(18,2) (exact + associative);
  - transcendental outputs (trig, cosine similarity) are rounded so
    last-ulp libm differences between the JVM and DuckDB cannot flip a bit;
  - every LIMIT/rank has a unique-column tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    doc: str = ""


CATALOG: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load_all() -> dict[str, Query]:
    """Import every query module so registration side-effects run.

    Registration order is REPORTING-significant: the external driver's
    correctness gate records the first 50 registration-order entries, so
    the north-star layers (LLM dedup/similarity/text, streaming windows,
    corpus-prep pipelines, join family) register before the long tail of
    core/scalar variants. Every entry is checked by tests/test_parity.py
    regardless of order.
    """
    from citydata_etl_spark.plans import (  # noqa: F401
        queries_llm,
        queries_time,
        queries_pipeline,
        queries_joins,
        queries_agg,
        queries_core,
        queries_functions,
    )

    return CATALOG
