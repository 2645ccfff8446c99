from query_processing_over_streaming_data_using_flink_spark.operators.relational import (
    equi_join,
    grouped_agg,
    top_k,
    top_k_per_group,
)

__all__ = ["equi_join", "grouped_agg", "top_k", "top_k_per_group"]
