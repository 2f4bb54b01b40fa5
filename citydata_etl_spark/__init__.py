"""citydata_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL pipeline (dfirmin/citydata-etl),
re-expressed Spark-first.

Layout:
    session.py    SparkSession factory (UTC, AQE, local-tuned shuffle partitions)
    schemas.py    explicit StructTypes for the driver testdata + control tables
    sources/      readers (CSV/JSON/parquet scans) and partitioned sinks
    functions/    scalar function library (timestamps, paths, json, geo)
    operators/    relational ops, joins, aggregates, dedup, similarity, text
    plans/        the query catalog: name -> (spark callable, oracle SQL)
    streaming/    structured-streaming analogs (windows, incremental pipeline)
    etl/          the three reference lifecycles as DataFrame pipelines
"""

__version__ = "0.1.0"
