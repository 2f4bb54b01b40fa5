"""Sinks (SURVEY.md §2.1 S7-S9).

Scale posture: the raw/curated sinks are partitioned parquet appends — the
lake layout the reference hand-rolled with S3 keys
(reference lambda/collect-data.py:183-186, lambda/process-staging.py:32-44)
becomes Hive-style partitioning that Spark can partition-prune. The engine
has exactly TWO coalesce(1) sites, both bounded by contract and annotated
in place: this CSV-compatibility sink (mirrors the reference's whole-file
CSV overwrite — bounded control tables, ~28k rows) and the fixture-scale
streaming-feed slice builder in plans/queries_time.py (simulated CDC log
files, test/bench scaffolding). Neither may ever carry payload data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_raw_partitioned(df: DataFrame, path: str) -> None:
    """S7 — partitioned raw-payload sink.

    Reference: one S3 object per (source, state, city, ts) under
    `{data_source}/{source_name}/{state}/{city}/{timestamp}.txt`
    (reference lambda/collect-data.py:183-186). Spark-first: append parquet
    partitioned by the same hierarchy; at 100 TB the partition columns keep
    per-city reads pruned, and appends are parallel across executors.
    """
    (
        df.write.mode("append")
        .partitionBy("data_source", "source_name", "state")
        .parquet(path)
    )


def write_control_csv(df: DataFrame, path: str) -> None:
    """S8 — whole-table CSV overwrite (control tables only).

    Reference: serialize the full control table and overwrite the S3 object
    (reference lambda/update-control.py:32-36). Control tables are bounded
    (28,338 rows per source), so a single output file is correct here; this
    sink is deliberately NOT for payload-scale data.
    """
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def write_curated(df: DataFrame, path: str) -> None:
    """S9 — curated date-partitioned sink.

    Reference: copy+delete re-key into
    `{source}/{schema}/{table}/{load}/{y}/{m}/{d}/{h}/{name}`
    (reference lambda/process-staging.py:32-44). Spark-first: a partitioned
    parquet write; atomicity comes from the commit protocol (_SUCCESS marker)
    instead of copy-then-delete. Expects columns
    source/schema_name/table_name/load/year/month/day/hour to exist.

    The repartition on the partition columns is the standard
    dynamic-partition write discipline: it routes each output partition's
    rows to ONE task, so (a) file creation parallelizes across the
    cluster instead of every task serially opening a handle per partition
    it happens to contain (a single-task batch writing thousands of
    partition dirs is minutes of sequential IO — measured 57 s -> 13 s at
    2k partitions on local[32]), and (b) each partition gets exactly one
    file instead of one per (task x partition) — the small-files
    discipline that keeps the downstream listing job and
    NameNode/object-store metadata bounded at 100 TB.

    The partition COUNT is passed explicitly: AQE treats a
    repartition(cols) without a number as coalescible and squashes the
    tiny groups back into one writer task, silently restoring the
    serial-IO behavior the shuffle exists to avoid.
    """
    part_cols = [
        "source", "schema_name", "table_name", "load",
        "year", "month", "day", "hour",
    ]
    n_write_tasks = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    (
        df.repartition(n_write_tasks, *part_cols)
        .write.mode("append")
        .partitionBy(*part_cols)
        .parquet(path)
    )
