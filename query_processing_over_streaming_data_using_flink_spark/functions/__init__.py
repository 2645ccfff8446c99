from query_processing_over_streaming_data_using_flink_spark.functions.scalar import (
    md5_hash64,
    revenue,
    ts_lit,
)

__all__ = ["md5_hash64", "revenue", "ts_lit"]
