"""Round-14 optimization internals: the rewrites must preserve operator
semantics exactly, and the plan-shape wins they bought must not rot.

Covered rewrites (see OPTIMIZATION_r14.md):
- map-side shingle hashing / MinHash signatures (operators/text.py
  shingle_hash_arrays, operators/dedup.py minhash_signatures),
- the changelog generator's explode-pair + shared-pin form
  (streaming/changelog.py),
- the fused one-pass image dhash+meta (multimodal.image_dhash_meta).
"""

from __future__ import annotations

import hashlib
import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators import dedup as dd
from query_processing_over_streaming_data_using_flink_spark.operators import multimodal as mm
from query_processing_over_streaming_data_using_flink_spark.operators import text as tx
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import (
    build_changelog,
)

SF = "/root/testdata/sf0.001"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_shingle_hashes(text: str | None, k: int) -> set[int]:
    """Reference rendering of the shingle-hash set (pre- and post-r14
    contract): distinct md5-60-bit hashes of word k-grams under the
    engine's split-on-whitespace tokenizer."""
    if text is None:
        return set()
    toks = __import__("re").split(r"\s+", text)
    if len(toks) < k:
        return set()
    return {_h64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def test_shingle_hash_rows_matches_reference_on_edge_cases(spark):
    rows = [
        (1, "alpha beta gamma delta"),     # normal
        (2, "one two three"),              # exactly k tokens (k=3)
        (3, "just two"),                   # too short -> no rows
        (4, ""),                           # empty -> no rows
        (5, None),                         # NULL -> no rows
        (6, "a b c a b c a b c"),          # duplicate shingles collapse
        (7, " lead  space b c"),           # empty split tokens preserved
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.h)
        for r in tx.shingle_hash_rows(docs, k=3).collect()
    }
    want = {
        (doc_id, h)
        for doc_id, text in rows
        for h in _ref_shingle_hashes(text, 3)
    }
    assert got == want


def test_minhash_signatures_semantics_and_plan(spark):
    docs = load_table(spark, SF, "documents")
    sigs = dd.minhash_signatures(docs)
    out = sigs.collect()
    # Exactly the docs with >= 3 tokens appear (the pre-r14 aggregate
    # form's implicit row set).
    n_eligible = docs.filter(F.size(F.split("text", r"\s+")) >= 3).count()
    assert len(out) == n_eligible
    # sig[j] really is min over the shingle set under permutation j.
    P = dd.MINHASH_P
    for r in out[:25]:
        sh = set(r.sh)
        assert len(sh) == len(r.sh) > 0
        for j, (a, b) in enumerate(dd.MINHASH_PERMS):
            assert r.sig[j] == min((a * (h % P) + b) % P for h in sh)
    # Plan shape (the r14 win): no Window, no aggregate exchange — the
    # only exchange is the scale-adaptive fan-out repartition.
    buf = io.StringIO()
    with redirect_stdout(buf):
        sigs.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "hashpartitioning" not in plan  # no doc_id shuffle survives
    # InferFiltersFromGenerate must stay dodged in the exploded form:
    # the expensive pipeline appears in ONE projection, not re-inlined
    # into a pushed-down filter (md5 shows up once per plan section).
    buf = io.StringIO()
    with redirect_stdout(buf):
        tx.shingle_hash_rows(load_table(spark, SF, "documents")).explain()
    rows_plan = buf.getvalue()
    assert rows_plan.count("md5") == 1, rows_plan


def test_changelog_explode_pairs_is_a_seq_bijection(spark):
    n = sum(
        load_table(spark, SF, t).count()
        for t in ("customer", "orders", "lineitem")
    )
    w = (n * 2) // 3
    log = build_changelog(spark, SF, window=w)
    agg = log.agg(
        F.count("*").alias("n"),
        F.sum("op").alias("net"),
        F.min("seq").alias("lo"),
        F.max("seq").alias("hi"),
        F.count_distinct("seq").alias("nseq"),
    ).collect()[0]
    # inserts + full drain: 2N events, seq a bijection onto 1..2N,
    # net weight zero.
    assert agg.n == 2 * n and agg.net == 0
    assert (agg.lo, agg.hi, agg.nseq) == (1, 2 * n, 2 * n)
    # Per-relation event counts: one insert + one delete per base row.
    per_rel = {
        r.relation: r.cnt
        for r in log.groupBy("relation").agg(F.count("*").alias("cnt")).collect()
    }
    for t in ("customer", "orders", "lineitem"):
        assert per_rel[t] == 2 * load_table(spark, SF, t).count()


def test_image_dhash_meta_equals_two_pass_decode(spark):
    docs = load_table(spark, SF, "documents").select("doc_id").limit(60)
    media = mm.synthesize_image_corpus(docs, repeat=7)
    fused = {
        r.doc_id: (r.dh, r.n_pixel_bytes)
        for r in mm.image_dhash_meta(media).collect()
    }
    dh = {r.doc_id: r.dh for r in mm.image_dhash(media).collect()}
    meta = {
        r.doc_id: r.n_pixel_bytes for r in mm.decode_media_meta(media).collect()
    }
    assert fused == {d: (dh[d], meta[d]) for d in dh}
