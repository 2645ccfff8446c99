"""Streaming deduplication — exact dedup over an unbounded document
stream, the online counterpart of `operators/dedup.py:exact_dedup`.

No reference counterpart (the reference's only stateful ops implement
Q3 — SURVEY.md §2.3/2.4); this is driver-mandate surface (§2.11) made
streaming-native.

Two state disciplines, because at 100 TB/day the difference is the
whole design:

* `streaming_exact_dedup` — `dropDuplicatesWithinWatermark`: state for
  a fingerprint is dropped once the watermark passes its event time +
  delay. Bounded state, the only sustainable form for an always-on
  ingest pipeline; duplicates arriving farther apart than the delay
  are (deliberately, boundedly) re-admitted.
* `streaming_exact_dedup_global` — `dropDuplicates`: exact forever,
  state grows with the number of distinct documents. Correct for
  bounded backfills replayed as streams; documented footgun otherwise.

Near-dup (MinHash) streaming dedup composes the same way: fingerprint
→ band keys via `operators/dedup.py:minhash_signature`, then the same
watermarked drop on the band key — kept out of here until a use case
pins down the band-collision policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64
from query_processing_over_streaming_data_using_flink_spark.operators.text import normalized_text


def with_fingerprint(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the content fingerprint (same normalization + md5 hash as
    the batch `exact_dedup`, so batch and stream agree on identity)."""
    return stream.withColumn("fingerprint", md5_hash64(normalized_text(F.col(text_col))))


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    delay: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Watermark-bounded exact dedup of a document stream: first
    arrival of each fingerprint within the watermark horizon passes,
    later ones drop. State is evicted as event time advances."""
    return (
        with_fingerprint(stream, text_col)
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_exact_dedup_global(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Unbounded-state exact dedup (first arrival ever wins). Only for
    bounded replays — state is O(distinct docs) with no eviction."""
    return with_fingerprint(stream, text_col).dropDuplicates(["fingerprint"])
