"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over citydata_etl_spark.plans.catalog — the engine's query
registry. Each catalog entry pairs a PySpark callable with the equivalent
DuckDB oracle SQL (None for non-SQL-expressible ops -> rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from citydata_etl_spark.plans.catalog import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    a1_pricing_summary: scan -> pushed filter -> two-phase hash aggregate
    (the TPC-H Q1 shape) with exact decimal sums.
    """
    catalog = load_all()
    return catalog["a1_pricing_summary"].spark_fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
