"""Readers (SURVEY.md §2.1 S1-S6).

Every reader takes an explicit schema — never inference — so per-source
schema drift is declared, not discovered (SURVEY.md §1.3). Paths are plain
URIs: the same code reads local files in tests and s3a:// at scale (Spark's
Hadoop FS layer handles the scheme).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from citydata_etl_spark import schemas


def read_control_csv(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """S1/S2 — header CSV scan with declared schema.

    Reference behavior: csv.DictReader over an S3 object
    (reference lambda/collect-data.py:156-159) and pd.read_csv
    (reference lambda/update-control.py:20-21). Spark-first: one distributed
    scan; header row skipped by name, types from the declared StructType.
    UTF-8 BOM on some sources (SURVEY.md §1.2) is handled by Spark's
    encoding option.
    """
    return (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def read_config_json(spark: SparkSession, path: str) -> DataFrame:
    """S3 — multiline JSON config document scan.

    Reference: S3 GET + json.loads + dict indexing
    (reference lambda/collect-data.py:51-64). The config is bounded (a few
    sources), so downstream consumers broadcast it (J1/J3).
    """
    return spark.read.option("multiLine", True).json(path)


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan: pushdown + pruning come free from the parquet source."""
    return spark.read.parquet(path)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver testdata table by name (TESTDATA.md).

    The parquet footers already carry the schema in schemas.TESTDATA_TABLES;
    we read without a schema override (parquet is self-describing) — the
    declared StructTypes document the contract and are asserted in tests.
    """
    if name not in schemas.TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table: {name}")
    # Ship the package to executor Python workers — the driver's session may
    # have found us via a bare sys.path insert (deploy.py rationale).
    from citydata_etl_spark.deploy import ship_package

    ship_package(spark)
    # Defensive session confs: the driver builds its own SparkSession, so
    # the engine cannot assume session.get_spark()'s settings. Both are
    # runtime-settable. nanosAsLong is required to scan events.parquet
    # (TIMESTAMP(NANOS)); UTC keeps date_format/year/etc. aligned with the
    # UTC-naive DuckDB oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Normalize timestamp PHYSICAL variants to the declared TimestampType
    # contract (schemas.TESTDATA_TABLES), so downstream casts/extracts see
    # one type regardless of how the driver generated the parquet:
    #   - TIMESTAMP(NANOS) scans as epoch-nanos long (nanosAsLong) —
    #     truncate to microseconds (matching DuckDB);
    #   - TIMESTAMP(MICROS, isAdjustedToUTC=false) scans as TIMESTAMP_NTZ —
    #     cast to TimestampType, value-preserving naive-as-UTC under the
    #     UTC session timeZone (TIMESTAMP_NTZ cannot cast to numeric, so
    #     leaving it breaks every epoch-seconds consumer).
    declared = {f.name: f.dataType for f in schemas.TESTDATA_TABLES[name]}
    for field in df.schema.fields:
        want_ts = isinstance(
            declared.get(field.name), T.TimestampType
        )
        if want_ts and isinstance(field.dataType, T.LongType):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"{field.name} div 1000")),
            )
        elif want_ts and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(
                field.name, F.col(field.name).cast("timestamp")
            )
    return df


def read_doc_shingle_bag(
    spark: SparkSession, sf_dir: str, n: int
) -> DataFrame:
    """The documents table's word n-gram shingle bag (doc_id, shingle),
    BAG semantics, persisted once per (application, sf_dir, n) via
    caching.keyed_persist and shared by every catalog query that
    consumes it (duplicated-passage stats, contamination) — the
    scan+split+explode runs once per sweep, not once per query. Set
    semantics are one .distinct() away for consumers that need them.

    At 100 TB this is the same decision as materializing a shingle
    table next to the corpus: several pipeline stages (dedup audit,
    decontamination, n-gram LM) all start from the identical derived
    relation, and deriving it per stage re-reads the corpus per stage.
    """
    from citydata_etl_spark.caching import keyed_persist
    from citydata_etl_spark.operators.dedup import shingles

    key = (
        "doc_shingle_bag",
        spark.sparkContext.applicationId,
        sf_dir,
        n,
    )
    return keyed_persist(
        key,
        lambda: shingles(
            read_testdata(spark, sf_dir, "documents"), n, distinct=False
        ),
    )


def read_doc_shingle_set(
    spark: SparkSession, sf_dir: str, n: int
) -> DataFrame:
    """SET-semantics companion to read_doc_shingle_bag: the distinct
    (doc_id, shingle) relation, persisted once per (application, sf_dir,
    n). If some consumer already pinned the BAG for this (sf_dir, n)
    (dup_passage does, for n=4), the set derives from that cache —
    one scan+explode total across both semantics; otherwise it builds
    standalone so a strictly-larger bag relation is never pinned in
    storage memory purely as a build intermediate (the n=2 consumers
    only ever want the set)."""
    from citydata_etl_spark.caching import keyed_get, keyed_persist
    from citydata_etl_spark.operators.dedup import shingles

    app = spark.sparkContext.applicationId
    key = ("doc_shingle_set", app, sf_dir, n)

    def build():
        bag = keyed_get(("doc_shingle_bag", app, sf_dir, n))
        if bag is not None:
            return bag.distinct()
        return shingles(read_testdata(spark, sf_dir, "documents"), n)

    return keyed_persist(key, build)


def read_doc_shingle_ids(
    spark: SparkSession, sf_dir: str, n: int
) -> DataFrame:
    """Dense-ranked (doc_id, tid) rows over the n-shingle SET relation —
    the oracle-exact alphabetical id assignment every rank-mode
    signature consumer needs (minhash, and the bitmap Jaccard sweep,
    whose set-size output is id-permutation-invariant), persisted once
    per (application, sf_dir, n) so the vocabulary is ranked ONCE per
    sweep instead of once per query (r10 VERDICT task 7)."""
    from citydata_etl_spark.caching import keyed_persist
    from citydata_etl_spark.operators.dedup import _doc_token_id_rows

    app = spark.sparkContext.applicationId
    key = ("doc_shingle_ids", app, sf_dir, n)

    def build():
        return _doc_token_id_rows(
            read_testdata(spark, sf_dir, "documents"),
            "text",
            "doc_id",
            n,
            shingle_rel=read_doc_shingle_set(spark, sf_dir, n),
        )

    return keyed_persist(key, build)


def read_doc_token_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table's distinct (doc_id, token) relation, persisted
    once per (application, sf_dir) via caching.keyed_persist — the unigram
    companion to read_doc_shingle_set, shared by the SimHash consumers."""
    from citydata_etl_spark.caching import keyed_persist
    from citydata_etl_spark.operators.dedup import tokens

    key = ("doc_token_set", spark.sparkContext.applicationId, sf_dir)
    return keyed_persist(
        key,
        lambda: tokens(read_testdata(spark, sf_dir, "documents")),
    )
