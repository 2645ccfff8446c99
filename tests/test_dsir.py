"""DSIR importance resampling (suite_quality.dsir_*): planted-corpus
checks for the hashed-n-gram importance weights (Xie et al. 2023) and
the deterministic Gumbel top-k resample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.plans import suite_quality as q

SF_SMOKE = "/root/testdata/sf0.001"


def _fixture_dir(spark, tmp_path, rows):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d + "/documents.parquet")
    return d


def test_dsir_weights_favor_target_like_docs(spark, tmp_path):
    """A doc written in the target subset's vocabulary must out-weigh a
    doc of alien vocabulary: its hashed n-grams sit in buckets where
    the target model p̂ holds mass, so Σ(ln p̂ − ln q̂) is higher."""
    target_text = "alpha beta gamma delta alpha beta"
    rows = [
        (1, target_text, "en", q.DSIR_TARGET_SOURCE, 0),
        (2, target_text, "en", q.DSIR_TARGET_SOURCE, 0),
        (3, "alpha beta gamma delta", "en", "srcX", 0),  # target-like
        (4, "zork quux blarg wibble", "en", "srcX", 0),  # alien
    ]
    d = _fixture_dir(spark, tmp_path, rows)
    w = {r["doc_id"]: r["lw_micro"] for r in q.dsir_importance_weights(spark, d).collect()}
    assert w[3] > w[4]
    # target members themselves score at least as high as the alien doc
    assert min(w[1], w[2]) > w[4]


def test_dsir_weight_is_integer_micronat_sum(spark, tmp_path):
    """lw_micro must equal the sum over the doc's gram instances of the
    per-bucket floor-quantized log-ratio — recomputed here gram-by-gram
    in Python from the same counts (hand replay of the model fit)."""
    import hashlib
    import math

    rows = [
        (1, "a b a", "en", q.DSIR_TARGET_SOURCE, 0),
        (2, "a b c", "en", "srcX", 0),
    ]
    d = _fixture_dir(spark, tmp_path, rows)

    def grams(text):
        tk = text.split(" ")
        return tk + [f"{x} {y}" for x, y in zip(tk, tk[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % q.DSIR_BUCKETS

    B = q.DSIR_BUCKETS
    all_feats = [(doc_id, bucket(g)) for doc_id, text, *_ in rows for g in grams(text)]
    tgt_feats = [b for doc_id, b in all_feats if doc_id == 1]
    tot_q, tot_p = len(all_feats), len(tgt_feats)
    from collections import Counter

    c_q, c_p = Counter(b for _, b in all_feats), Counter(tgt_feats)

    def lr_micro(b):
        num = (c_p.get(b, 0) + 1) * (tot_q + B)
        den = (c_q[b] + 1) * (tot_p + B)
        return math.floor(math.log(num / den) * 1_000_000)

    want = {
        doc_id: sum(lr_micro(bucket(g)) for g in grams(text))
        for doc_id, text, *_ in rows
    }
    got = {r["doc_id"]: r["lw_micro"] for r in q.dsir_importance_weights(spark, d).collect()}
    assert got == want


def test_dsir_resample_takes_k_highest_keys(spark, tmp_path):
    """The resample must return exactly DSIR_KEEP_K rows (or all docs
    if fewer) and be exactly the top of the weights+Gumbel key order —
    cross-checked by recomputing keys from the weights surface."""
    out = q.sample_dsir_resample(spark, SF_SMOKE)
    rows = out.collect()
    n_docs = spark.read.parquet(SF_SMOKE + "/documents.parquet").count()
    assert len(rows) == min(q.DSIR_KEEP_K, n_docs)
    # keys are self-consistent: key - lw is a valid Gumbel micro value
    # and the selected min key >= every excluded doc's key
    weights = q.dsir_importance_weights(spark, SF_SMOKE)
    from query_processing_over_streaming_data_using_flink_spark.operators import text as tx
    from query_processing_over_streaming_data_using_flink_spark.operators import lm

    draw = tx.sample_hash(F.col("doc_id"), salt="dsir", modulus=q._DSIR_GUMBEL_MOD)
    u = (draw.cast("double") + F.lit(0.5)) / F.lit(float(q._DSIR_GUMBEL_MOD))
    gum = F.floor(-F.log(-F.log(u)) * F.lit(lm.MICRO)).cast("long")
    keyed = weights.withColumn("key_micro", F.col("lw_micro") + gum)
    all_keys = {r["doc_id"]: r["key_micro"] for r in keyed.collect()}
    sel = {r["doc_id"]: r["key_micro"] for r in rows}
    assert all(sel[i] == all_keys[i] for i in sel)
    excluded = [k for i, k in all_keys.items() if i not in sel]
    if excluded and len(sel) == q.DSIR_KEEP_K:
        assert min(sel.values()) >= max(excluded)


def test_dedup_keep_best_quality_keeps_cleanest_not_first(spark, tmp_path):
    """In a near-dup cluster the HIGHEST-quality member must be kept
    even when it has the higher doc_id (min-id dedup would keep the
    noisy copy); singletons keep themselves."""
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import (
        dedup_keep_best_quality,
    )

    base = "the cat sat on the mat and looked at the dog in the sun"
    rows = [
        (1, base + " #### !!!! ????", "en", "srcX", 0),  # noisy near-dup, LOWER id
        (2, base, "en", "srcX", 0),  # clean copy, higher id
        (3, "a completely different document about spark plans", "en", "srcX", 0),
    ]
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d + "/documents.parquet")
    out = {r["doc_id"]: r for r in dedup_keep_best_quality(spark, d).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"]
    assert out[1]["cluster_size"] == 2
    assert not out[1]["is_kept"] and out[2]["is_kept"]  # quality beats min-id
    assert out[2]["q_micro"] > out[1]["q_micro"]
    assert out[3]["is_kept"] and out[3]["cluster_size"] == 1


def test_decontaminate_eval_minhash_flags_near_dup_leakage(spark, tmp_path):
    """A training doc that is a near-duplicate (not verbatim) of an
    eval doc (doc_id % 7 == 0) must be flagged with its similarity;
    unrelated training docs must not appear."""
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import (
        decontaminate_eval_minhash,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (7, base, "en", "srcX", 0),  # eval member (7 % 7 == 0)
        (8, base + " extra", "en", "srcX", 0),  # near-dup training doc -> leak
        (9, "completely different text about query plans and shuffles", "en", "srcX", 0),
    ]
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(d + "/documents.parquet")
    out = {r["doc_id"]: r for r in decontaminate_eval_minhash(spark, d).collect()}
    assert set(out) == {8}
    assert out[8]["n_eval_matches"] == 1
    assert out[8]["max_jaccard"] >= 0.35
