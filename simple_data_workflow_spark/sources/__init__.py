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
from simple_data_workflow_spark.sources.crawl import (  # noqa: F401
    read_warc,
    read_wet,
)
from simple_data_workflow_spark.sources.matview import (  # noqa: F401
    ViewCursorLost,
    refresh_aggregate_view,
)
from simple_data_workflow_spark.sources.tablelog import (  # noqa: F401
    ConcurrentWriteConflict,
    table_add_column,
    table_changes,
    table_changes_rowlevel,
    table_clone,
    table_commit,
    table_compact,
    table_compact_small,
    table_delete_where,
    table_drop_check_constraint,
    table_drop_column,
    table_drop_tag,
    table_files_df,
    table_partitions_df,
    table_publish_from,
    table_rename_column,
    table_set_check_constraint,
    table_history,
    table_merge_upsert,
    table_read,
    table_restore,
    table_row_count,
    table_scan,
    table_tag,
    table_tags,
    table_truncate_history,
    table_update_where,
    table_vacuum,
    table_verify,
    table_version_at_timestamp,
)
