from simple_data_workflow_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_delim,
    scan_parquet,
)
