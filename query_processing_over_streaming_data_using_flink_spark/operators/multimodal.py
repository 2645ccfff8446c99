"""Multimodal-column operators (driver mandate, SURVEY.md §2.11):
image/audio/video as opaque `binary` columns with typed metadata.

The Spark-side plumbing — schema, partition-preserving mapInPandas,
Arrow batch shapes, metadata struct — is real and tested. The actual
media decode is STUBBED: the container has no image/audio libraries,
so `decode_image_meta(real_decode=True)` raises NotImplementedError,
and the default path runs a deterministic fake extractor (dimensions
derived from the content hash) that exercises the exact same plumbing.

Scale notes: media processing is the canonical mapInPandas workload —
per-partition Arrow batches, no shuffle, executors bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` so a partition of large
blobs never materializes at once. Frame sampling/resize slot into the
same pattern (binary in → binary/struct out).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, content binary, media_type string, "
    "width int, height int, n_bytes long, content_md5 string"
)


def attach_binary_content(docs: DataFrame) -> DataFrame:
    """Wrap a text corpus as a binary media column (the testdata has no
    real media; any bytes column exercises the same plumbing).
    Columns: doc_id, content(binary), media_type."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derive plausible
    dimensions from the content so tests are stable."""
    h = int.from_bytes(__import__("hashlib").md5(content).digest()[:4], "big")
    return 64 + h % 1920, 64 + (h >> 12) % 1080


def decode_image_meta(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched, partition
    preserving). With `real_decode=True` this is where PIL/ffmpeg would
    run — not available in this container, so it raises."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "media decoding libraries are not installed in this "
                    "environment; plumbing is exercised via the "
                    "deterministic fake decoder"
                )
            dims = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": pdf["content"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "content_md5": [hashlib.md5(c).hexdigest() for c in pdf["content"]],
                }
            )

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over opaque blobs: emit one row per sampled
    offset (the video-frame-extraction shape: one input row → many
    output rows, still partition-local)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                for i, off in enumerate(range(0, len(content), every_n_bytes)):
                    rows.append(
                        (doc_id, i, off, content[off : off + every_n_bytes])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "offset", "frame"])

    return media.mapInPandas(op, schema="doc_id long, frame_no int, offset long, frame binary")
