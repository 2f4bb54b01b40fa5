"""SparkSession factory.

Defaults are tuned for the local[32] test harness but the knobs that matter at
cluster scale (AQE, skew-join handling, UTC session timezone, Arrow) are the
same ones a 1000-executor deployment would set. Nothing here assumes local
mode except the shuffle-partition default, which callers override per
deployment (rule of thumb: 2-3x total executor cores, sized so a shuffle
partition stays under ~200 MB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "citydata_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - UTC session timezone: the reference stamps UTC timestamps
      (reference lambda/collect-data.py:114) and the DuckDB oracle compares
      naive-UTC values.
    - AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
      partition counts at scale.
    - Arrow on: every Pandas-UDF boundary is Arrow-batched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
        # INT96 carries NO parquet min/max statistics, which silently
        # disables footer-level data skipping on every timestamp column —
        # a range query over a date-clustered 100 TB table would read all
        # of it (tests/test_layout.py pins stats presence).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # testdata events.parquet stores TIMESTAMP(NANOS), which the Spark
        # parquet reader rejects; read as long and convert in the reader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
