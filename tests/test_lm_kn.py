"""Interpolated Kneser-Ney trigram LM (operators/lm.py kn_*): hand-com-
puted probability checks, the planted "San Francisco" continuation-count
rank flip vs the add-one bigram gate, and model-table sanity.

The KN property under test: a token frequent ONLY inside one collocation
("francisco" always after "san") has a high raw unigram/bigram count but
a continuation count of 1, so KN scores it poorly in novel contexts —
the add-one bigram model cannot make that distinction.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def _ppl(spark, train_rows, score_rows, model="kn"):
    train = _docs(spark, train_rows)
    score = _docs(spark, score_rows)
    if model == "kn":
        scored = lm.kn_perplexity(score, *lm.kn_trigram_train(train))
    else:
        scored = lm.perplexity(score, *lm.bigram_lm_train(train))
    return {r["doc_id"]: r["ppl"] for r in scored.collect()}


def test_kn_model_tables_hand_counted(spark):
    """Tiny corpus, every count table checked by hand. Corpus (one doc):
    'a b a b c' → trigram stream with two BOS sentinels:
    (s,s,a) (s,a,b) (a,b,a) (b,a,b) (a,b,c)."""
    t3, t2, b2, b2c, u1, stats = lm.kn_trigram_train(_docs(spark, ["a b a b c"]))
    tri = {(r["u"], r["v"], r["w"]): r["c3"] for r in t3.collect()}
    S = lm.BOS
    assert tri == {
        (S, S, "a"): 1, (S, "a", "b"): 1, ("a", "b", "a"): 1,
        ("b", "a", "b"): 1, ("a", "b", "c"): 1,
    }
    ctx = {(r["u"], r["v"]): (r["c2"], r["n1p2"]) for r in t2.collect()}
    assert ctx[("a", "b")] == (2, 2)  # continuations: a, c
    cont = {(r["v"], r["w"]): r["cont2"] for r in b2.collect()}
    # cont2(v,w) = distinct left contexts: (a,b) occurs after {<s>, b} → 2
    assert cont == {
        (S, "a"): 1, ("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1,
    }
    mid = {r["v"]: (r["ctx2"], r["n1p1"]) for r in b2c.collect()}
    assert mid["a"] == (2, 1)  # pairs (a,b) only, but 2 contexts
    assert mid["b"] == (2, 2)  # (b,a) and (b,c)
    uni = {r["w"]: r["cont1"] for r in u1.collect()}
    # cont1(w) = distinct v preceding w among bigram TYPES
    assert uni == {"a": 2, "b": 1, "c": 1}  # a after {<s>, b}; b after {a}
    st = stats.collect()[0]
    assert (st["bt"], st["vs"]) == (4, 3)  # 4 bigram types, vocab {a,b,c}


def test_kn_probability_hand_computed(spark):
    """Score 'a b' under the model trained on 'a b a b c' and check the
    rational-arithmetic chain digit for digit.

    Position 2 (u=<s>, v=a, w=b):  c3(<s>,a,b)=1, c2(<s>,a)=1, n1p2=1;
    cont2(a,b)=2, ctx2(a)=2, n1p1(a)=1; cont1(b)=1; bt=4, vs=3.
      a1 = 2, b1 = 8
      a2 = max(4·2−3,0)·8 + 3·1·2 = 46;  b2 = 4·2·8 = 64
      a3 = max(4·1−3,0)·64 + 3·1·46 = 202; b3 = 4·1·64 = 256
      lp = ln(202/256)
    Position 1 (u=<s>, v=<s>, w=a): c3=1, c2=1, n1p2=1; cont2(<s>,a)=1,
    ctx2(<s>)=1, n1p1(<s>)=1; cont1(a)=2 →
      a1 = 3, b1 = 8
      a2 = max(4−3,0)·8 + 3·1·3 = 17; b2 = 4·1·8 = 32
      a3 = max(4−3,0)·32 + 3·1·17 = 83; b3 = 4·1·32 = 128
      lp = ln(83/128)
    """
    got = _ppl(spark, ["a b a b c"], ["a b"])
    lp1 = math.floor(math.log(83 / 128) * lm.MICRO)
    lp2 = math.floor(math.log(202 / 256) * lm.MICRO)
    expect = round(math.exp(-(lp1 + lp2) / (2 * lm.MICRO)), 6)
    assert got[0] == pytest.approx(expect, abs=1e-9)


def test_kn_rank_flip_vs_bigram_on_collocation_bound_token(spark):
    """The planted rank change the round-8 verdict asked for: train a
    corpus where 'francisco' is FREQUENT but only ever follows 'san',
    while 'park' is equally frequent across many contexts. Score two
    documents that use each token in a NOVEL context. The add-one
    bigram model treats both as unseen bigrams with similar context
    counts — near-identical perplexity, ordered by denominator noise.
    KN's continuation counts make the collocation-bound 'francisco'
    strictly worse, flipping/creating the rank gap."""
    train = [
        "san francisco fog rolls in",
        "we left san francisco today",
        "san francisco hills are steep",
        "they visit san francisco often",
        "a park is green",
        "the park was full",
        "every park has trees",
        "that park closes early",
    ]
    # Novel context for both target words: 'near the francisco' vs
    # 'near the park' — same surrounding tokens, one token differs.
    probe = ["near the francisco", "near the park"]
    kn = _ppl(spark, train, probe, model="kn")
    # KN: 'francisco' (continuation count 1) must score strictly worse
    # than 'park' (many distinct left contexts).
    assert kn[0] > kn[1] * 1.05, kn
    big = _ppl(spark, train, probe, model="bigram")
    # The bigram gate sees both as unseen (prev='the') bigrams — the
    # gap, if any, is far smaller than KN's.
    kn_gap = kn[0] / kn[1]
    big_gap = big[0] / big[1]
    assert kn_gap > big_gap * 1.04, (kn_gap, big_gap)


def test_kn_repetitive_text_scores_worse_than_fluent(spark):
    """A curation-relevant sanity check: under a KN model trained on
    varied clean text, a document that endlessly repeats one seen
    phrase still scores (finite, comparable) — and unseen-gibberish
    scores worse than in-distribution text."""
    train = [
        "the quick brown fox jumps over the lazy dog",
        "a quick red fox ran over the green hill",
        "the lazy dog sleeps under the old tree",
        "a brown dog jumps over a small fence",
    ]
    probe = [
        "the quick brown fox jumps over the lazy dog",  # in-distribution
        "zzq qqz zqz qzq zzq qqz",  # gibberish, all OOV
    ]
    kn = _ppl(spark, train, probe)
    assert kn[0] < kn[1], kn


def test_ngram_exploders_guard_empty_token_arrays(spark):
    """sequence(lo, hi) with hi < lo DESCENDS in Spark rather than
    returning empty — on a 0-token array the unguarded exploders would
    fabricate positions with null w while the DuckDB oracle's range()
    is empty. The guard must yield zero pairs/trigrams for an array
    holding only the BOS sentinels (unreachable through tokens() today,
    latent if tokenization changes)."""
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    pairs = lm.doc_bigrams(docs).drop("arr")
    # Re-point the exploders at a hand-built BOS-only array to hit the
    # guard: same expressions, arr forced to the degenerate shapes.
    bos1 = spark.createDataFrame([(1,)], "doc_id long").withColumn(
        "arr", F.array(F.lit(lm.BOS))
    )
    fabricated = bos1.select(
        F.explode(
            F.expr(
                "CASE WHEN size(arr) >= 2 THEN transform(sequence(1, size(arr) - 1),"
                " i -> struct(arr[i - 1] AS prev, arr[i] AS w)) ELSE array() END"
            )
        )
    )
    assert fabricated.count() == 0
    unguarded = bos1.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(arr) - 1),"
                " i -> struct(arr[i - 1] AS prev, arr[i] AS w))"
            )
        )
    )
    # Prove the hazard is real: sequence(1, 0) descends to [1, 0], so
    # without the guard Spark probes arr[1] on a 1-element array —
    # an ANSI out-of-bounds error (fabricated null rows with ANSI off).
    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX|ArrayIndex"):
        unguarded.count()
    # And the production exploders still emit exactly n positions per doc.
    assert pairs.count() == 1
    assert lm.doc_trigrams(docs).drop("arr").count() == 1


def test_kn_int64_headroom_guard(spark):
    """kn_int64_headroom bounds the deepest rational denominator
    (16 * max(c2) * max(ctx2) * (bt + vs + 1)) — sane on a toy corpus,
    and the arithmetic matches a hand computation."""
    train = _docs(spark, ["a b a b", "a b c"])
    t3, t2, b2, b2c, u1, stats = lm.kn_trigram_train(train)
    got = lm.kn_int64_headroom(t2, b2c, stats)
    max_c2 = max(r["c2"] for r in t2.collect())
    max_ctx2 = max(r["ctx2"] for r in b2c.collect())
    row = stats.collect()[0]
    want = 16 * max_c2 * max_ctx2 * (row["bt"] + row["vs"] + 1)
    assert got["worst_case"] == want
    assert got["ok"] and got["headroom_bits"] > 0
