"""Staging-promotion pipeline (SURVEY.md §3.3): the process-staging script
as a key-derivation projection + partitioned write.

    staging keys -> parse (F4/F5) -> route manual-vs-sourced (F10)
    -> processing-time partition values (F2) -> curated partitioned sink (S9)

Reference: lambda/process-staging.py:1-55. The reference's copy+delete
re-key becomes a partitioned parquet write whose atomicity comes from the
commit protocol rather than per-object copy-then-delete.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def derive_curated_columns(
    staging: DataFrame, key_col: str = "key", now: Column | None = None
) -> DataFrame:
    """Parse staging object keys into curated partition columns.

    Two key shapes (reference process-staging.py:32-44):
      manual/{name}           -> source='manual', schema='misc' (the
                                 reference's fixed schema partition for
                                 drop-ins, process-staging.py:38), table
                                 from the file stem, load='initial'
      {source}/{schema}/{table}/{load}/{name}
    plus processing-time year/month/day/hour (reference uses wall-clock at
    move time, process-staging.py:14-18; tests inject `now` for
    determinism).
    """
    ts = now if now is not None else F.current_timestamp()
    parts = F.split(F.col(key_col), "/")
    is_manual = F.element_at(parts, 1) == "manual"
    name = F.element_at(parts, -1)
    stem = F.regexp_replace(name, r"\.[^.]+$", "")
    return (
        staging.withColumn(
            "source",
            F.when(is_manual, F.lit("manual")).otherwise(F.element_at(parts, 1)),
        )
        .withColumn(
            "schema_name",
            F.when(is_manual, F.lit("misc")).otherwise(F.element_at(parts, 2)),
        )
        .withColumn(
            "table_name",
            F.when(is_manual, stem).otherwise(F.element_at(parts, 3)),
        )
        .withColumn(
            "load",
            F.when(is_manual, F.lit("initial")).otherwise(F.element_at(parts, 4)),
        )
        .withColumn("object_name", name)
        .withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
        .withColumn("hour", F.hour(ts))
    )


def promote(staging: DataFrame, curated_path: str,
            key_col: str = "key", now: Column | None = None) -> None:
    """Derive curated keys and append to the partitioned curated zone (S9).
    Parallel, shuffle-free: key derivation is a projection; the write fans
    out by partition values."""
    from citydata_etl_spark.sources.sinks import write_curated

    derived = derive_curated_columns(staging, key_col, now)
    write_curated(derived.drop(key_col), curated_path)
