from citydata_etl_spark.sources.readers import (  # noqa: F401
    read_config_json,
    read_control_csv,
    read_parquet_table,
    read_testdata,
)
from citydata_etl_spark.sources.sinks import (  # noqa: F401
    write_control_csv,
    write_curated,
    write_raw_partitioned,
)
