"""Multimodal-column operators (driver mandate, SURVEY.md §2.11):
image/audio/video as opaque `binary` columns with typed metadata.

The Spark-side plumbing — schema, partition-preserving mapInPandas,
Arrow batch shapes, metadata struct — is real and tested. The decode
stage is REAL for self-contained formats: `operators/media_codec.py`
implements binary PPM (P6) and RIFF/WAV-PCM16 codecs in pure numpy
(no external media libraries needed), so `decode_media_meta` parses
actual container bytes — header walk, chunk alignment, raster/sample
extraction — and `resize_image` re-encodes a real nearest-neighbor
resize. Formats that genuinely need external codecs (JPEG/PNG/MP4)
raise NotImplementedError at the media_type dispatch — the honest
boundary. The original hash-derived fake extractor is retained for
`application/octet-stream` blobs (plumbing tests and the
`multimodal_meta` oracle run on it).

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
    preserving). With `real_decode=True`, PPM blobs are parsed by the
    real pure-numpy codec (`media_codec.decode_ppm`); other media types
    raise (use `decode_media_meta` for the multi-format dispatcher).
    The default path keeps the hash-derived fake extractor for opaque
    blobs — same plumbing, no format assumption."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            if real_decode:
                dims = []
                for c, mt in zip(pdf["content"], pdf["media_type"]):
                    if mt != "image/x-portable-pixmap":
                        raise NotImplementedError(
                            f"no built-in codec for {mt!r}: JPEG/PNG/MP4 need "
                            "external libraries (PPM/WAV are decoded natively "
                            "by operators/media_codec.py)"
                        )
                    px = mc.decode_ppm(bytes(c))
                    dims.append((px.shape[1], px.shape[0]))
            else:
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


PPM_TYPE = "image/x-portable-pixmap"
WAV_TYPE = "audio/wav"
BMP_TYPE = "image/bmp"
AU_TYPE = "audio/basic"
_IMAGE_TYPES = (PPM_TYPE, BMP_TYPE)
_AUDIO_TYPES = (WAV_TYPE, AU_TYPE)


def _decode_image(blob: bytes, media_type: str):
    """Raster decode dispatch over the built-in image codecs — the one
    place a new real image format plugs in (BMP joined PPM in r6; a
    re-upload of the same picture in a DIFFERENT container gets the
    same raster, hence the same dHash — cross-format near-dedup)."""
    from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

    if media_type == PPM_TYPE:
        return mc.decode_ppm(blob)
    if media_type == BMP_TYPE:
        return mc.decode_bmp(blob)
    raise NotImplementedError(
        f"no built-in codec for {media_type!r}: JPEG/PNG need external "
        "libraries (PPM and BMP are decoded natively)"
    )


def _decode_audio(blob: bytes, media_type: str):
    """Waveform decode dispatch over the built-in audio codecs (WAV
    and AU): same cross-format near-dedup story as `_decode_image` —
    one clip re-uploaded in a different container yields the same
    samples, hence the same fingerprint. Returns (samples, rate)."""
    from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

    if media_type == WAV_TYPE:
        return mc.decode_wav_pcm16(blob)
    if media_type == AU_TYPE:
        return mc.decode_au_pcm16(blob)
    raise NotImplementedError(
        f"no built-in codec for {media_type!r}: MP3/AAC need external "
        "libraries (WAV-PCM16 and AU-PCM16 are decoded natively)"
    )

REAL_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, n_pixel_bytes long, pix_sum long, "
    "n_samples int, sample_rate int, sum_sq long"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media blobs per doc: even doc_ids become
    binary PPM images, odd doc_ids mono PCM16 WAVs — actual container
    bytes any external tool opens, generated by closed-form content
    rules (`media_codec.synth_*`) so decoded statistics are
    independently computable by a SQL oracle. Runs as mapInPandas over
    just the id column (no shuffle; blob size bounded per row)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            contents, types = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    contents.append(mc.encode_ppm(mc.synth_image_pixels(d)))
                    types.append(PPM_TYPE)
                else:
                    contents.append(mc.encode_wav_pcm16(*mc.synth_audio_samples(d)))
                    types.append(WAV_TYPE)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "content": contents, "media_type": types}
            )

    # NOT fanned out (r14): WAV synthesis is numpy-cheap per row; the
    # interleaved A/B measured the extra exchange as a net loss on the
    # audio/mixed consumers (e.g. audio_ahash_near_dup 1.39->1.85s).
    # The image corpus below IS fanned out - PPM raster work is heavy.
    return docs.select("doc_id").mapInPandas(
        op, schema="doc_id long, content binary, media_type string"
    )


def decode_media_meta(media: DataFrame) -> DataFrame:
    """REAL decode dispatcher: parse each blob with the codec its
    media_type names and emit flat per-modality features — images:
    (width, height, raster byte count + sum), audio: (sample count,
    rate, energy Σx²). All integers → engine-exact. Unknown types
    raise (JPEG et al. need external codecs)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, content, mt in zip(pdf["doc_id"], pdf["content"], pdf["media_type"]):
                blob = bytes(content)
                if mt in _IMAGE_TYPES:
                    px = _decode_image(blob, mt)
                    rows.append(
                        (int(doc_id), mt, len(blob), px.shape[1], px.shape[0],
                         int(px.size), int(px.astype(np.int64).sum()),
                         None, None, None)
                    )
                elif mt in _AUDIO_TYPES:
                    samples, rate = _decode_audio(blob, mt)
                    rows.append(
                        (int(doc_id), mt, len(blob), None, None, None, None,
                         len(samples), rate,
                         int((samples.astype(np.int64) ** 2).sum()))
                    )
                else:
                    raise NotImplementedError(f"no built-in codec for {mt!r}")
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "width", "height",
                    "n_pixel_bytes", "pix_sum", "n_samples", "sample_rate", "sum_sq",
                ],
            )

    return media.mapInPandas(op, schema=REAL_META_SCHEMA)


def synthesize_image_corpus(
    docs: DataFrame, repeat: int = 101, mixed_containers: bool = False
) -> DataFrame:
    """Deterministic image corpus WITH PLANTED NEAR-DUPLICATES: every
    doc gets a real binary raster whose base pixels derive from
    ``doc_id % repeat`` (so ~n/repeat docs share each base image), and
    odd doc_ids get the 2× nearest-neighbor UPSCALE of the base — a
    true perceptual near-dup (different bytes, different dimensions,
    same content). With ``mixed_containers`` every third doc is
    encoded as BMP instead of PPM — same raster, entirely different
    bytes — so the downstream dHash pairing also certifies
    CROSS-FORMAT dedup (and the closed-form oracle is untouched: the
    hash depends only on decoded pixels, never the container). Feeds
    `image_dhash` + banded hamming pairing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            contents, types = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                px = mc.synth_image_pixels_mixed(d % repeat)
                if d % 2 == 1:
                    px = mc.resize_nearest(px, 2 * px.shape[1], 2 * px.shape[0])
                if mixed_containers and d % 3 == 0:
                    contents.append(mc.encode_bmp(px))
                    types.append(BMP_TYPE)
                else:
                    contents.append(mc.encode_ppm(px))
                    types.append(PPM_TYPE)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": contents,
                    "media_type": types,
                }
            )

    from query_processing_over_streaming_data_using_flink_spark.operators.layout import fanout

    # Pure-Python codec work per row: fan an under-parallel input out
    # so the Arrow batches use every core (no-op at production widths).
    return fanout(docs.select("doc_id")).mapInPandas(
        op, schema="doc_id long, content binary, media_type string"
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual 64-bit dHash per image: decode the real PPM bytes,
    grayscale, sample the fixed 8×9 grid, one bit per adjacent
    comparison (`media_codec.dhash64`). Partition-local mapInPandas —
    the 100 TB shape: hashes leave the executor, rasters never do.
    Near-dup pairing is then `dedup.hamming_band_pairs` on the hash —
    the SimHash pigeonhole banding, one equi-join, no all-pairs scan.
    Returns (doc_id, dh long)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            rows = []
            for doc_id, content, mt in zip(pdf["doc_id"], pdf["content"], pdf["media_type"]):
                rows.append((int(doc_id), mc.dhash64(_decode_image(bytes(content), mt))))
            yield pd.DataFrame(rows, columns=["doc_id", "dh"])

    return media.mapInPandas(op, schema="doc_id long, dh long")


def image_dhash_meta(media: DataFrame) -> DataFrame:
    """`image_dhash` + the raster size in ONE decode pass — (doc_id,
    dh, n_pixel_bytes). The image keep-best pipeline needs both the
    perceptual hash (pairing) and the decoded size (quality ranking);
    consuming `image_dhash(media)` and `decode_media_meta(media)`
    separately re-SYNTHESIZES and re-decodes the whole corpus twice
    (guide §1.2: don't compute things twice). Values are bit-identical
    to the two single-purpose operators: same `_decode_image`, same
    `dhash64`, same `int(px.size)`."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            rows = []
            for doc_id, content, mt in zip(pdf["doc_id"], pdf["content"], pdf["media_type"]):
                px = _decode_image(bytes(content), mt)
                rows.append((int(doc_id), mc.dhash64(px), int(px.size)))
            yield pd.DataFrame(rows, columns=["doc_id", "dh", "n_pixel_bytes"])

    return media.mapInPandas(op, schema="doc_id long, dh long, n_pixel_bytes long")


def synthesize_audio_corpus(docs: DataFrame, repeat: int = 101) -> DataFrame:
    """Deterministic WAV corpus WITH PLANTED NEAR-DUPLICATES: every doc
    gets a real RIFF/PCM16 blob whose base signal derives from
    ``doc_id % repeat``; odd doc_ids carry the VOLUME-DOUBLED copy —
    different bytes, same fingerprint (energy comparisons are
    scale-invariant). Feeds `audio_ahash` + banded hamming pairing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            contents = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                samples, rate = mc.synth_audio_samples_mixed(d % repeat)
                if d % 2 == 1:
                    samples = (samples.astype("int32") * 2).astype("int16")
                contents.append(mc.encode_wav_pcm16(samples, rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": contents,
                    "media_type": [WAV_TYPE] * len(pdf),
                }
            )

    # NOT fanned out (r14): WAV synthesis is numpy-cheap per row; the
    # interleaved A/B measured the extra exchange as a net loss on the
    # audio/mixed consumers (e.g. audio_ahash_near_dup 1.39->1.85s).
    # The image corpus below IS fanned out - PPM raster work is heavy.
    return docs.select("doc_id").mapInPandas(
        op, schema="doc_id long, content binary, media_type string"
    )


def audio_ahash(media: DataFrame) -> DataFrame:
    """Perceptual 64-bit audio fingerprint per blob: decode the real
    WAV bytes, 65-window energy profile, one bit per adjacent
    comparison (`media_codec.audio_ahash64`). Partition-local
    mapInPandas — fingerprints leave the executor, waveforms never do.
    Returns (doc_id, ah long)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            rows = []
            for doc_id, content, mt in zip(pdf["doc_id"], pdf["content"], pdf["media_type"]):
                samples, _rate = _decode_audio(bytes(content), mt)
                rows.append((int(doc_id), mc.audio_ahash64(samples)))
            yield pd.DataFrame(rows, columns=["doc_id", "ah"])

    return media.mapInPandas(op, schema="doc_id long, ah long")


def resize_image(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Real image resize: decode PPM → nearest-neighbor resample →
    re-encode PPM (binary in → binary out, partition-local). Non-image
    rows pass through untouched."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from query_processing_over_streaming_data_using_flink_spark.operators import media_codec as mc

        for pdf in batches:
            out = []
            for content, mt in zip(pdf["content"], pdf["media_type"]):
                if mt == PPM_TYPE:
                    out.append(
                        mc.encode_ppm(mc.resize_nearest(mc.decode_ppm(bytes(content)), new_w, new_h))
                    )
                else:
                    out.append(bytes(content))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "content": out, "media_type": pdf["media_type"]}
            )

    return media.mapInPandas(op, schema="doc_id long, content binary, media_type string")


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
