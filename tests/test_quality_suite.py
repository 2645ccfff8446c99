"""Planted-corpus tests for the model-based quality suite
(`plans/suite_quality.py`, `operators/lm.py`): bigram-LM perplexity,
Naive Bayes train+apply, and the Gopher rule battery. Each test builds
a corpus where the right answer is known by construction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_bigram_lm_scores_in_distribution_text_lower(spark):
    """A document made of training bigrams must score (far) lower
    perplexity than one of never-seen tokens."""
    train = _docs(
        spark,
        [(i, "the cat sat on the mat", "en") for i in range(5)],
    )
    score = _docs(
        spark,
        [
            (100, "the cat sat on the mat", "en"),
            (101, "zq xv qqj wzx vvk pqr", "en"),
        ],
    )
    big, ctx, vocab = lm.bigram_lm_train(train)
    out = {r["doc_id"]: r for r in lm.perplexity(score, big, ctx, vocab).collect()}
    assert out[100]["ppl"] < out[101]["ppl"] / 2
    # every position scored: 6 tokens -> 6 scored bigram positions
    assert out[100]["n_scored"] == 6


def test_bigram_lm_smoothing_handles_unseen_context(spark):
    """Unseen context rows (c_p NULL after the left join) must produce
    the uniform add-one probability ln(1/V), not NULL or -inf."""
    train = _docs(spark, [(0, "a b", "en")])
    score = _docs(spark, [(1, "zz yy", "en")])
    big, ctx, vocab = lm.bigram_lm_train(train)
    row = lm.perplexity(score, big, ctx, vocab).collect()[0]
    v = vocab.collect()[0]["v"]  # distinct predicted tokens: {'a','b'} -> 2
    assert v == 2
    # position 1: seen context '<s>' (c_p=1), unseen bigram -> ln(1/(1+v));
    # position 2: unseen context 'zz' (c_p=0) -> ln(1/(0+v)).
    expect = math.floor(math.log(1.0 / (1 + v)) * lm.MICRO) + math.floor(
        math.log(1.0 / v) * lm.MICRO
    )
    assert row["lp_sum_micro"] == expect
    assert row["ppl"] is not None


def test_naive_bayes_separates_disjoint_vocabularies(spark):
    """Two classes with disjoint vocabularies classify perfectly, and
    ties (a doc of only unseen words) break on label asc."""
    train = _docs(
        spark,
        [(i, "alpha beta gamma", "en") for i in range(4)]
        + [(10 + i, "uno dos tres", "es") for i in range(4)],
    )
    term_counts, class_totals, stats = lm.nb_train(train, label_col="lang")
    probe = _docs(
        spark,
        [
            (100, "alpha alpha beta", "?"),
            (101, "dos tres tres", "?"),
            (102, "zzz qqq", "?"),  # unseen everywhere -> tie -> 'en' (asc)
        ],
    )
    pred = {
        r["doc_id"]: r["pred_label"]
        for r in lm.nb_classify(probe, term_counts, class_totals, stats).collect()
    }
    assert pred[100] == "en"
    assert pred[101] == "es"
    assert pred[102] == "en"


def test_naive_bayes_prior_breaks_near_ties(spark):
    """With identical likelihoods, the class prior (train doc counts)
    decides: 3 'en' docs vs 1 'es' doc sharing one common word."""
    train = _docs(
        spark,
        [(0, "shared", "en"), (1, "shared", "en"), (2, "shared", "en"),
         (3, "shared", "es")],
    )
    term_counts, class_totals, stats = lm.nb_train(train, label_col="lang")
    probe = _docs(spark, [(100, "shared", "?")])
    row = lm.nb_classify(probe, term_counts, class_totals, stats).collect()[0]
    assert row["pred_label"] == "en"


def test_gopher_rules_flag_each_violation(spark):
    """Each crafted document violates exactly one rule."""
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_quality import text_gopher_rules

    good = "the cat and dog runs over a bridge with some very fine style"
    rows = [
        (0, good, "en", "s", len(good)),
        (1, "the cat and", "en", "s", 11),  # too few words
        (2, good + " " + "x" * 400, "en", "s", 0),  # mean word len > 10
        (3, good + " # #", "en", "s", 0),  # symbol ratio > 0.1
        # 5 alpha words of 16 (31% < 80%), mean word length exactly 3
        (4, "the off and toe you 111 222 333 444 555 666 777 888 999 000 123",
         "en", "s", 0),
        (5, "cat dog bridge runs style fine very with some over", "en", "s", 0),  # <2 stopwords
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r for r in text_gopher_rules(spark, d).collect()}

    assert out[0]["keep"]
    assert not out[1]["rule_word_count"] and not out[1]["keep"]
    assert not out[2]["rule_mean_word_len"] and not out[2]["keep"]
    assert not out[3]["rule_symbol_ratio"] and not out[3]["keep"]
    assert not out[4]["rule_alpha_words"] and not out[4]["keep"]
    assert not out[5]["rule_stopwords"] and not out[5]["keep"]
    # the clean doc passes every individual rule
    assert all(out[0][r] for r in (
        "rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
        "rule_alpha_words", "rule_stopwords",
    ))


def test_perplexity_lp_is_integer_sum_of_position_quanta(spark):
    """The per-doc score is exactly the integer sum of per-position
    floor-quantized log probs — recomputed here in pure Python from
    the trained counts (associativity / partition-order proof)."""
    train = _docs(spark, [(0, "a b a b a c", "en")])
    score = _docs(spark, [(1, "a b c", "en")])
    big, ctx, vocab = lm.bigram_lm_train(train)
    bigs = {(r["prev"], r["w"]): r["c_pw"] for r in big.collect()}
    ctxs = {r["prev"]: r["c_p"] for r in ctx.collect()}
    v = vocab.collect()[0]["v"]

    toks = ["<s>", "a", "b", "c"]
    expect = 0
    for prev, w in zip(toks, toks[1:]):
        c_pw = bigs.get((prev, w), 0)
        c_p = ctxs.get(prev, 0)
        expect += math.floor(math.log((c_pw + 1.0) / (c_p + v)) * lm.MICRO)
    row = lm.perplexity(score, big, ctx, vocab).collect()[0]
    assert row["lp_sum_micro"] == expect


def test_hard_negative_is_best_cross_label_neighbor(spark, tmp_path):
    """The mined negative must be the most-similar vector with a
    DIFFERENT label — same-label near-duplicates are skipped."""
    import os

    rows = [
        (0, [1.0, 0.0, 0.0], 0),   # anchor
        (1, [0.99, 0.14, 0.0], 0),  # same label, nearly identical: skip
        (2, [0.9, 0.43, 0.0], 1),   # best cross-label
        (3, [0.0, 1.0, 0.0], 1),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path / "sf")
    e.write.parquet(os.path.join(d, "embeddings.parquet"))

    from query_processing_over_streaming_data_using_flink_spark.plans.suite_quality import mine_hard_negatives

    out = {r["q_id"]: r for r in mine_hard_negatives(spark, d).collect()}
    assert out[0]["n_id"] == 2 and out[0]["neg_label"] == 1
    # anchor 2 (label 1): nearest cross-label is 1 (label 0)
    assert out[2]["neg_label"] == 0


def test_margin_sampling_prefers_ambiguous_docs(spark, tmp_path):
    """A document mixing both classes' vocabularies must rank ahead of
    (lower margin than) a document squarely inside one class."""
    import os

    train = [
        (0, "alpha beta gamma delta", "en"),
        (2, "alpha beta beta gamma", "en"),
        (4, "uno dos tres cuatro", "es"),
        (6, "uno uno dos tres", "es"),
    ]
    probes = [
        (101, "alpha uno beta dos", "??"),     # ambiguous
        (103, "alpha beta gamma alpha", "??"),  # clearly en
    ]
    docs = spark.createDataFrame(
        [(i, t, l, "s", len(t)) for i, t, l in train + probes],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    from query_processing_over_streaming_data_using_flink_spark.plans.suite_quality import sample_uncertain_margin

    out = {r["doc_id"]: r["margin_micro"] for r in sample_uncertain_margin(spark, d).collect()}
    assert out[101] < out[103]


def test_perplexity_buckets_are_balanced_tertiles(spark):
    """Per language the head/middle/tail buckets differ in size by at
    most 1 (ntile), and every head ppl <= every tail ppl."""
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_quality import text_perplexity_buckets

    rows = text_perplexity_buckets(spark, "/root/testdata/sf0.001").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        sizes = {b: sum(1 for r in rs if r["bucket"] == b) for b in ("head", "middle", "tail")}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        heads = [r["ppl"] for r in rs if r["bucket"] == "head"]
        tails = [r["ppl"] for r in rs if r["bucket"] == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails), lang


def test_split_assignment_is_stable_under_corpus_growth(spark, tmp_path):
    """A document's split must not change when new docs arrive — the
    property randomSplit lacks. Verified by re-deriving the per-doc
    assignment on a corpus prefix and the full corpus."""
    import os

    from query_processing_over_streaming_data_using_flink_spark.operators import text as tx

    full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    draw = tx.sample_hash(F.col("doc_id"), salt="split", modulus=1000)
    assign = lambda df: {
        r["doc_id"]: r["d"] for r in df.select("doc_id", draw.alias("d")).collect()
    }
    prefix = assign(full.filter(F.col("doc_id") < 20))
    whole = assign(full)
    assert all(whole[k] == v for k, v in prefix.items())


def test_nb_custom_feature_fn_char_trigrams(spark):
    """The NB train/apply chain accepts a custom feature extractor:
    char trigrams separate scripts trivially, and the short-text guard
    returns an empty feature array instead of a descending sequence."""
    train = _docs(
        spark,
        [(0, "hello world wide", "en"), (1, "die der und das", "de")],
    )
    tc, ct, st = lm.nb_train(train, label_col="lang", feature_fn=lm.char_trigrams)
    probe = _docs(spark, [(10, "worldly", "?"), (11, "und die", "?"), (12, "ab", "?")])
    pred = {
        r["doc_id"]: r["pred_label"]
        for r in lm.nb_classify(probe, tc, ct, st, feature_fn=lm.char_trigrams).collect()
    }
    assert pred[10] == "en"
    assert pred[11] == "de"
    # len < 3: zero features -> the doc has nothing to score and is
    # absent from the output (callers route feature-less docs to a
    # default bucket), and nothing crashes
    assert 12 not in pred


# --------------------------------------------------------------------------
# mixture_ppl_tilted (round 10)
# --------------------------------------------------------------------------


def test_mixture_ppl_tilted_upweights_target_like_sources(spark, tmp_path):
    """Model-driven mixing semantics on a planted corpus: the source
    whose text matches the training subset (src0) must get strictly
    lower perplexity and a strictly higher mixture weight than a
    source of never-seen tokens; budgets are conserved (sum <= half
    the token mass), keep-rates are capped at 10000 permyriad, and
    kept mass never exceeds the source's mass."""
    import os

    from query_processing_over_streaming_data_using_flink_spark.plans.suite_quality import (
        mixture_ppl_tilted,
    )

    rows = []
    for i in range(12):
        rows.append((i, "the cat sat on the mat and the dog ran", "en", "src0", 39))
    for i in range(12, 24):
        rows.append((i, "the cat sat on the mat and the dog ran", "en", "srcA", 39))
    for i in range(24, 36):
        rows.append((i, "zq xv qqj wzx vvk pqr mlk jjh ggf ddx", "en", "srcB", 38))
    d = str(tmp_path / "mix_sf")
    os.makedirs(d)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r["source"]: r for r in mixture_ppl_tilted(spark, d).collect()}
    assert set(got) == {"src0", "srcA", "srcB"}
    # srcA is verbatim in-distribution -> same ppl as src0; srcB is
    # out-of-distribution -> strictly higher ppl, strictly lower weight
    assert got["srcA"]["ppl"] == got["src0"]["ppl"]
    assert got["srcB"]["ppl"] > got["srcA"]["ppl"]
    assert got["srcB"]["w_milli"] < got["srcA"]["w_milli"]
    total = sum(r["est_tokens"] for r in got.values())
    assert sum(r["token_budget"] for r in got.values()) <= total // 2
    for r in got.values():
        assert 0 <= r["keep_rate_pmy"] <= 10000
        assert r["kept_docs"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["est_tokens"]
    # determinism: a rerun reproduces the draw bit-for-bit
    again = {r["source"]: r for r in mixture_ppl_tilted(spark, d).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {
        k: tuple(v) for k, v in again.items()
    }
