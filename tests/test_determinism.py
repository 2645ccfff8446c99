"""Partitioning-determinism checks: the repo's correctness story
claims every registered query is deterministic under ANY partitioning
(integer-quantized aggregation, pinned fold orders, md5 draws). This
test makes that mechanical for the round-5 families: run each query
under two different shuffle-partition settings and require identical
rows — the same check OPERATIONS.md proposes as a cluster-scale
regression harness."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_ORACLE

QUERIES = [
    "tfidf_top_terms",
    "bm25_search",
    "doc_ngram_novelty",
    "hybrid_search_rrf",
    "embedding_quantize_int8",
    "events_twa_daily",
    "events_daily_anomalies",
    "cm_sketch_heavy_hitters",
    "graph_pagerank_parts",
    "minhash_estimate_quality",
    "multimodal_real_roundtrip",
    "events_moving_7d_avg",
    "mixture_token_budget",
    "mixture_temperature_sampling",
    "embedding_covariance",
    "embedding_pca_power_iter",
    "embedding_top_pc_projection",
    "changelog_monthly_revenue_state",
    "corpus_quality_report",
    "dedup_cross_snapshot",
    # round-6 families
    "dedup_cross_snapshot_minhash",
    "image_phash_near_dup",
    "image_dedup_keep_best",
    "audio_ahash_near_dup",
    "ann_pq",
    "ann_recall_pq_vs_exact",
    "changelog_windowed_churn_state",
    # round-9/10 families (KN gate, cluster/importance sampling,
    # quality-aware dedup): every one folds integer micro-nat sums or
    # md5 draws, so partitioning must not move a single row
    "text_perplexity_filter_kn",
    "sample_cluster_balanced",
    "dsir_importance_weights",
    "sample_dsir_resample",
    "dedup_keep_best_quality",
    # round-10 tail (export manifest, fertility, model-driven mixing,
    # cluster-level split): manifests fold modular residues, the
    # mixture's draw is an integer permyriad threshold, the split
    # hashes cluster labels — layout must not move a row or a bit
    "export_shard_manifest",
    "tokenizer_fertility_report",
    "mixture_ppl_tilted",
    "split_leakage_safe",
    # round-12 additions: the entropy gate folds integer micro-nat
    # sums; the span decontamination and planted-cosine pair sets are
    # equi-join + run-merge shapes whose outputs must not move a row
    # under re-partitioning; the compression rollup inherits the
    # trained-BPE determinism
    "text_unigram_entropy",
    "decontaminate_eval_substring",
    "dedup_embedding_cosine_planted",
    "tokenizer_compression_by_source",
]


def _canon_cell(v):
    """Exact-comparison cell canonicalization: None sorts (plain tuple
    sort raises on None-vs-value), NaN compares (NaN != NaN would
    false-fail identical runs), and -0.0 folds into 0.0 (== -equal but
    repr-distinct, so a repr sort could order equal multisets
    differently). No rounding — this check is about EXACT determinism."""
    if v is None:
        return v
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == 0.0:
            return 0.0
    return v


def canon_rows(rows):
    return sorted((tuple(_canon_cell(v) for v in r) for r in rows), key=repr)


@pytest.mark.parametrize("name", QUERIES)
def test_result_independent_of_partitioning(spark, name):
    from query_processing_over_streaming_data_using_flink_spark.registry import all_queries

    fn = all_queries()[name]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = canon_rows(fn(spark, SF_ORACLE).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = canon_rows(fn(spark, SF_ORACLE).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert a == b, f"{name} changed under repartitioning"


def _replace_chain_tokens(word: str, merges) -> int:
    """Pure-python simulation of `bpe_count_expr`'s framed replace
    chain (MARK+sym+SEP framing, one leftmost-nonoverlapping pass per
    rank) for property-testing against the greedy tokenizer."""
    from query_processing_over_streaming_data_using_flink_spark.operators.bpe import (
        BPE_MARK,
        BPE_SEP,
    )

    s = "".join(BPE_MARK + ch + BPE_SEP for ch in word)
    for x, y in merges:
        s = s.replace(
            BPE_MARK + x + BPE_SEP + BPE_MARK + y + BPE_SEP,
            BPE_MARK + x + y + BPE_SEP,
        )
    return s.count(BPE_SEP)


def test_bpe_pass_equivalence_property():
    """The invariant behind the text_bpe_token_count oracle, fuzzed:
    for ANY merge table accepted by validate_merges (causally ordered,
    unique producers), greedy BPE and the rank-order replace chain
    produce identical token counts on arbitrary strings. The round-7
    code review found a counterexample table that slipped the original
    validator — this property test keeps the validator honest against
    the whole space, not just the shipped DEFAULT_MERGES."""
    from hypothesis import given, settings, strategies as st

    from query_processing_over_streaming_data_using_flink_spark.operators import bpe as bp

    alphabet = "abc"

    @st.composite
    def merge_tables(draw):
        symbols = list(alphabet)
        merges = []
        formed = set()
        for _ in range(draw(st.integers(0, 10))):
            x = draw(st.sampled_from(symbols))
            y = draw(st.sampled_from(symbols))
            if x + y in formed or len(x + y) > 12:
                continue
            merges.append((x, y))
            formed.add(x + y)
            symbols.append(x + y)
        return tuple(merges)

    @settings(max_examples=300, deadline=None)
    @given(
        merges=merge_tables(),
        word=st.text(alphabet=alphabet, min_size=0, max_size=24),
    )
    def check(merges, word):
        bp.validate_merges(merges)  # generator only emits valid tables
        ranks = {m: i for i, m in enumerate(merges)}
        greedy = len(bp.bpe_piece(word, ranks))
        chain = _replace_chain_tokens(word, merges)
        assert greedy == chain, (merges, word, greedy, chain)

    check()


def test_bpe_review_counterexample_diverges_without_guard():
    """Documentation-by-test of WHY validate_merges rejects duplicate
    producers: on the review's table the two renderings genuinely
    diverge (greedy 1 token, chain 2 on 'babcb') — so acceptance of
    such a table would mean oracle mismatches, not harmless noise."""
    from query_processing_over_streaming_data_using_flink_spark.operators import bpe as bp

    bad = (("b", "a"), ("c", "b"), ("a", "b"), ("b", "ab"), ("bab", "cb"), ("ba", "b"))
    ranks = {m: i for i, m in enumerate(bad)}
    assert len(bp.bpe_piece("babcb", ranks)) == 1
    assert _replace_chain_tokens("babcb", bad) == 2
