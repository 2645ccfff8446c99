from query_processing_over_streaming_data_using_flink_spark.plans.tpch import q3_shipping_priority

__all__ = ["q3_shipping_priority"]
