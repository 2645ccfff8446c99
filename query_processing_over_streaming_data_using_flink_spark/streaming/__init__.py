from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import build_changelog
from query_processing_over_streaming_data_using_flink_spark.streaming.retraction import (
    changelog_state,
    q3_on_state,
)

__all__ = ["build_changelog", "changelog_state", "q3_on_state"]
