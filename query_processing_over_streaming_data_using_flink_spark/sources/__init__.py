from query_processing_over_streaming_data_using_flink_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
    table_schema,
)

__all__ = ["TABLES", "load_table", "register_views", "table_schema"]
