"""Explicit schemas (SURVEY.md §1.3: declared, never inferred, for determinism).

Two families:
  - TESTDATA: the driver's TPC-H-ish synthetic tables (TESTDATA.md).
  - Control/config tables mirroring the reference's per-source CSV schemas
    (reference data/*_control.csv headers; SURVEY.md §1.2-1.3) including the
    schema drift between sources (reference bug 4, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- TESTDATA

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ------------------------------------------- reference-shaped control tables
# One explicit StructType per source: the reference's three control tables
# have three different schemas (reference data/{city-data,usa,greatschools}
# _control.csv line 1), so per-source declaration is mandatory
# (SURVEY.md §1.3, §2.10 bug 4).

CITYDATA_CONTROL = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("date_completed", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

USA_CONTROL = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("state_id", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("date_completed", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

GREATSCHOOLS_CONTROL = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("state_id", T.StringType()),
        T.StructField("state_name", T.StringType()),
        T.StructField("county_name", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("zips", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("date_completed", T.StringType()),
    ]
)

SCRAPER_CONFIG = T.StructType(
    [
        T.StructField("site", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("element_id", T.StringType()),
        T.StructField("s3_directory", T.StringType()),
    ]
)

API_CONFIG = T.StructType(
    [
        T.StructField("api", T.StringType()),
        T.StructField("endpoint", T.StringType()),
        T.StructField("parameters", T.StringType()),
        T.StructField("s3_directory", T.StringType()),
    ]
)

# Raw payload rows produced by the collection pipeline (SURVEY.md §1.3).
RAW_PAYLOAD = T.StructType(
    [
        T.StructField("data_source", T.StringType()),
        T.StructField("source_name", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("fetched_at", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)

CONTROL_TABLES: dict[str, T.StructType] = {
    "city-data": CITYDATA_CONTROL,
    "usa": USA_CONTROL,
    "greatschools": GREATSCHOOLS_CONTROL,
}
