from simple_data_workflow_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_delim,
    scan_parquet,
)
from simple_data_workflow_spark.sources.sinks import (  # noqa: F401
    write_bucketed_table,
    write_csv,
    write_json,
    write_parquet,
)
