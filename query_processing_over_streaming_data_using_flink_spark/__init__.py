"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Flink project
(kelenkai/Query-processing-over-streaming-data-using-Flink).

Architecture: DataFrame / Spark SQL / Structured Streaming throughout.
The logical plan is always declared via the DataFrame API and optimized
by Catalyst; no hand-scheduled execution. Custom semantics the reference
needs that Spark lacks natively (changelog/retraction processing,
periodic streaming Top-N) are built as compositions of built-in
operators (signed-weight aggregation, foreachBatch top-k) — see
`streaming/`.

Layout:
    session     — tuned SparkSession builder (AQE, shuffle partitions)
    sources     — table catalog / parquet+CSV loaders / changelog source
    functions   — scalar expression helpers (revenue, shared hashes)
    operators   — reusable relational + LLM-data operators
    plans       — named end-to-end queries (TPC-H Q3 flagship et al.)
    streaming   — changelog generation, retraction pipeline, top-N sink
"""

from query_processing_over_streaming_data_using_flink_spark.session import get_spark

__all__ = ["get_spark"]
