from citydata_etl_spark.functions.scalar import (  # noqa: F401
    curated_key,
    dual_format_ts,
    haversine_km,
    hierarchical_key,
    is_pending,
    parse_props,
    partition_cols_from_ts,
    url_from_template,
    utc_now_compact,
    zips_array,
)
