from citydata_etl_spark.plans.catalog import CATALOG, Query, register  # noqa: F401
