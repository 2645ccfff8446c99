"""Statistical language-model operators for corpus quality filtering
(driver mandate, LLM-data pipeline; no reference counterpart — the
reference at `/root/reference/` has no text operators at all).

Two classic curation components, both expressed as relational plans:

* **Bigram-LM perplexity filter** (CCNet / RefinedWeb style): train an
  add-one-smoothed bigram language model on a designated clean subset,
  then score every document by its per-token cross-entropy under that
  model. Documents whose perplexity is far above the clean subset's
  are boilerplate/gibberish and get filtered. Training is two hash
  aggregates (bigram counts, context counts); scoring is one
  pair-keyed equi-join — nothing quadratic, nothing driver-side.

* **Naive Bayes classifier** (fastText-style quality/domain classifier
  role): multinomial NB trained on a labeled split (per-class term
  counts + priors), applied with one term-keyed join and a per-doc
  argmax. Training IS counting, so the "model fit" distributes as
  ordinary aggregations and the learned model is itself a DataFrame.

Determinism across engines (the repo-wide discipline): every log
probability is a pure function of a small integer tuple (counts,
vocabulary size), quantized to integer micro-nats with floor() BEFORE
any aggregation — so all sums are associative 64-bit integer sums,
immune to partition order, and bit-equal in DuckDB. The only float
steps are final per-row presentation expressions (exp / divide /
round) applied to already-aggregated integer pairs.

Scale shape at 100 TB: the model tables are (vocab²)-bounded for the
bigram LM and (classes × vocab) for NB — both shuffle on their natural
keys and never touch raw text after tokenization; the corpus is
scanned once for training and once for scoring. No collect, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators import text as tx

BOS = "<s>"  # sentence-start context for the first real token
MICRO = 1_000_000  # micro-nat quantization of log probabilities


def _lp_micro(num: Column, den: Column) -> Column:
    """floor(ln(num/den) * 1e6) as a 64-bit integer — the one log
    quantization every operator here shares. num/den are integer
    columns, so equal count pairs give bit-equal results everywhere."""
    return F.floor(F.log(num.cast("double") / den.cast("double")) * F.lit(MICRO)).cast(
        "long"
    )


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode each document into its (prev, w) bigram stream with a
    BOS context prepended — one map-side pass, no shuffle. A document
    with n tokens yields exactly n scored positions."""
    arr = F.concat(F.array(F.lit(BOS)), tx.tokens(F.col(text_col)))
    # Size guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than
    # returning empty, which would fabricate positions with null w on a
    # 0-token array while the DuckDB oracle's range() is empty. Currently
    # unreachable (tokens() never returns an empty array) but latent if
    # tokenization changes.
    pairs = F.expr(
        "CASE WHEN size(arr) >= 2 THEN "
        "transform(sequence(1, size(arr) - 1), "
        "i -> struct(arr[i - 1] AS prev, arr[i] AS w)) "
        "ELSE array() END"
    )
    return (
        docs.withColumn("arr", arr)
        .withColumn("pair", F.explode(pairs))
        .select(*docs.columns, F.col("pair.prev").alias("prev"), F.col("pair.w").alias("w"))
    )


def bigram_lm_train(train_docs: DataFrame, text_col: str = "text"):
    """Fit the add-one bigram LM: returns (bigram_counts, context_counts,
    vocab) DataFrames — the model is data, mergeable and incrementally
    maintainable (counts are signed-weight-friendly).

    vocab is a 1-row frame (v = distinct predicted tokens in training)
    meant to be broadcast into the scoring join."""
    pairs = doc_bigrams(train_docs, text_col)
    big = pairs.groupBy("prev", "w").agg(F.count("*").alias("c_pw"))
    ctx = big.groupBy("prev").agg(F.sum("c_pw").alias("c_p"))
    vocab = big.agg(F.countDistinct("w").alias("v"))
    return big, ctx, vocab


def perplexity(
    docs: DataFrame,
    big: DataFrame,
    ctx: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Score every document under the trained bigram LM.

    Per position: lp = ln((c_pw + 1) / (c_p + v)) — add-one smoothing,
    so unseen bigrams and unseen contexts are well-defined. Quantized
    to integer micro-nats per POSITION, then integer-summed per doc;
    ppl = exp(-mean nats) is computed once from the (sum, count) pair.

    Plan: the corpus explodes to its bigram stream, equi-joins the
    model on (prev, w) then (prev) — both shuffles are on the model's
    natural keys; the 1-row vocab broadcasts. At web scale the model
    tables are vocabulary-bounded while the corpus side streams
    through, which is exactly how CCNet's KenLM scoring parallelizes."""
    pairs = doc_bigrams(docs, text_col).select("doc_id", "prev", "w")
    scored = (
        pairs.join(big, ["prev", "w"], "left")
        .join(ctx, ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp_micro",
            _lp_micro(
                F.coalesce(F.col("c_pw"), F.lit(0)) + F.lit(1),
                F.coalesce(F.col("c_p"), F.lit(0)) + F.col("v"),
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_scored"),
        F.sum("lp_micro").alias("lp_sum_micro"),
    )
    # One division, mirroring the oracle's exp(-s / (n * 1e6)) shape
    # exactly — a divide-twice rendering can differ in the last ulp and
    # flip the 6th rounded decimal on a boundary value.
    return per_doc.withColumn(
        "ppl",
        F.round(
            F.exp(
                -F.col("lp_sum_micro").cast("double")
                / (F.col("n_scored").cast("double") * F.lit(float(MICRO)))
            ),
            6,
        ),
    )


def doc_trigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode each document into its (u, v, w) trigram stream with two
    BOS sentinels prepended — one map-side pass, no shuffle. Like
    `doc_bigrams`, a document with n tokens yields exactly n scored
    positions, so bigram and trigram gates stay count-comparable."""
    arr = F.concat(F.array(F.lit(BOS), F.lit(BOS)), tx.tokens(F.col(text_col)))
    # Same size guard as `doc_bigrams`: sequence(2, 1) would DESCEND and
    # fabricate two null-w positions on a 0-token array where the DuckDB
    # oracle's range(2, len) is empty.
    tris = F.expr(
        "CASE WHEN size(arr) >= 3 THEN "
        "transform(sequence(2, size(arr) - 1), "
        "i -> struct(arr[i - 2] AS u, arr[i - 1] AS v, arr[i] AS w)) "
        "ELSE array() END"
    )
    return (
        docs.withColumn("arr", arr)
        .withColumn("tri", F.explode(tris))
        .select(
            *docs.columns,
            F.col("tri.u").alias("u"),
            F.col("tri.v").alias("v"),
            F.col("tri.w").alias("w"),
        )
    )


def kn_int64_headroom(t2: DataFrame, b2c: DataFrame, stats: DataFrame) -> dict:
    """Train-time guard for the KN rational chain's int64 range.

    The deepest denominator is b3 = 4·c2 · (4·ctx2 · (bt + vs + 1)), so
    the worst-case magnitude is bounded by
    16 · max(c2) · max(ctx2) · (bt + vs + 1). Spark (ANSI off) WRAPS
    silently on int64 overflow while DuckDB errors, so past ~2⁶³ the
    engine would emit wrong perplexities rather than fail loudly —
    this helper makes the ceiling checkable instead of implicit.
    Returns {"worst_case", "ok", "headroom_bits"}; callers training at
    corpus scale should assert ok (or switch the scoring chain to float
    interpolation, which the gate tolerates in production where
    cross-engine bit equality is not needed)."""
    # 1-row bounded aggregates (diagnostic guard, not a hot path).
    max_c2 = t2.agg(F.max("c2").alias("m")).first()["m"] or 0
    max_ctx2 = b2c.agg(F.max("ctx2").alias("m")).first()["m"] or 0
    row = stats.first()
    b1_max = (row["bt"] or 0) + (row["vs"] or 0) + 1
    worst = KN_D_DEN * KN_D_DEN * max_c2 * max_ctx2 * b1_max
    return {
        "worst_case": worst,
        "ok": worst < 2**63,
        "headroom_bits": 63 - (worst.bit_length() if worst else 0),
    }


# Absolute discount for the Kneser-Ney LM, held as an exact rational
# (D = KN_D_NUM / KN_D_DEN = 3/4) so every interpolated probability is
# itself a ratio of two 64-bit integers — the engine/oracle hash match
# then certifies the full KN arithmetic, not a float approximation.
KN_D_NUM = 3
KN_D_DEN = 4


def kn_trigram_train(train_docs: DataFrame, text_col: str = "text"):
    """Fit an interpolated Kneser-Ney trigram LM (the CCNet/RedPajama
    perplexity-gate methodology, vs the add-one bigram in
    `bigram_lm_train`). Returns six count DataFrames — the model is
    data, mergeable, and joins on its natural n-gram keys:

    * t3   (u, v, w) → c3            raw trigram counts
    * t2   (u, v)    → c2, n1p2      trigram-context total + distinct
                                      continuation types N1+(u v ·)
    * b2   (v, w)    → cont2         continuation bigram count
                                      N1+(· v w): in how many distinct
                                      left contexts u does (v w) occur —
                                      THE Kneser-Ney idea ("Francisco"
                                      is frequent but only ever follows
                                      "San", so its continuation count
                                      is tiny and it scores poorly in
                                      novel contexts)
    * b2c  (v)       → ctx2, n1p1    continuation context total
                                      Σ_w cont2(v, w) + distinct types
    * u1   (w)       → cont1         unigram continuation count
                                      N1+(· w) over bigram types
    * stats 1-row    → bt, vs        total distinct bigram types and
                                      vocabulary size (broadcast side)

    Everything is two shuffles deep (trigram keys, then rollups); no
    text survives past tokenization."""
    tri = doc_trigrams(train_docs, text_col).select("u", "v", "w")
    t3 = tri.groupBy("u", "v", "w").agg(F.count("*").alias("c3"))
    t2 = t3.groupBy("u", "v").agg(
        F.sum("c3").alias("c2"), F.count("*").alias("n1p2")
    )
    b2 = t3.groupBy("v", "w").agg(F.count("*").alias("cont2"))
    b2c = b2.groupBy("v").agg(
        F.sum("cont2").alias("ctx2"), F.count("*").alias("n1p1")
    )
    u1 = b2.groupBy("w").agg(F.count("*").alias("cont1"))
    stats = u1.agg(
        F.sum("cont1").alias("bt"), F.count("*").alias("vs")
    )
    return t3, t2, b2, b2c, u1, stats


def kn_perplexity(
    docs: DataFrame,
    t3: DataFrame,
    t2: DataFrame,
    b2: DataFrame,
    b2c: DataFrame,
    u1: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Score every document under the interpolated KN trigram LM.

    Per position, with discount D = 3/4 kept rational, each order's
    probability is a ratio of 64-bit integers (a_k / b_k):

        a1 / b1 = (cont1(w) + 1) / (bt + vs + 1)        add-one over
                  continuation counts; the +1 in the denominator is
                  the implicit OOV type's mass
        a2 / b2 = [max(4·cont2 − 3, 0)·b1 + 3·n1p1·a1] / (4·ctx2·b1)
                  if v was ever a context, else a1 / b1
        a3 / b3 = [max(4·c3 − 3, 0)·b2 + 3·n1p2·a2] / (4·c2·b2)
                  if (u, v) was ever a context, else a2 / b2

    i.e. P₃ = (c3 − D)₊/c2 + D·N1+(u v ·)/c2 · P₂ with the fractions
    multiplied out, so lp_micro = floor(ln(a3/b3)·1e6) is a pure
    function of an integer tuple — bit-equal in DuckDB (same int64 →
    double rounding, same IEEE division) exactly like `_lp_micro`.

    Plan: the corpus explodes to its trigram stream and equi-joins the
    six model tables on their natural keys ((u,v,w), (u,v), (v,w),
    (v), (w)) — model sides are vocabulary-bounded, the corpus streams
    through once; the 1-row stats frame broadcasts. Integer range: all
    products stay under ~4·c2·ctx2·(bt+vs) ≈ 10¹⁶ at these SFs; at
    true corpus scale swap the rational chain for float interpolation
    (the gate doesn't need cross-engine bit equality in production)."""
    tri = doc_trigrams(docs, text_col).select("doc_id", "u", "v", "w")
    j = (
        tri.join(t3, ["u", "v", "w"], "left")
        .join(t2, ["u", "v"], "left")
        .join(b2, ["v", "w"], "left")
        .join(b2c, ["v"], "left")
        .join(u1, ["w"], "left")
        .crossJoin(F.broadcast(stats))
    )
    zero = F.lit(0).cast("long")
    a1 = F.coalesce(F.col("cont1"), zero) + F.lit(1)
    b1 = F.col("bt") + F.col("vs") + F.lit(1)
    disc2 = F.greatest(
        F.lit(KN_D_DEN) * F.coalesce(F.col("cont2"), zero) - F.lit(KN_D_NUM), zero
    )
    a2 = F.when(
        F.col("ctx2").isNull(), a1
    ).otherwise(disc2 * b1 + F.lit(KN_D_NUM) * F.col("n1p1") * a1)
    b2_ = F.when(
        F.col("ctx2").isNull(), b1
    ).otherwise(F.lit(KN_D_DEN) * F.col("ctx2") * b1)
    disc3 = F.greatest(
        F.lit(KN_D_DEN) * F.coalesce(F.col("c3"), zero) - F.lit(KN_D_NUM), zero
    )
    a3 = F.when(
        F.col("c2").isNull(), a2
    ).otherwise(disc3 * b2_ + F.lit(KN_D_NUM) * F.col("n1p2") * a2)
    b3 = F.when(
        F.col("c2").isNull(), b2_
    ).otherwise(F.lit(KN_D_DEN) * F.col("c2") * b2_)
    scored = j.withColumn("lp_micro", _lp_micro(a3, b3))
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_scored"),
        F.sum("lp_micro").alias("lp_sum_micro"),
    )
    # One division, mirroring the oracle's exp(-s / (n * 1e6)) shape.
    return per_doc.withColumn(
        "ppl",
        F.round(
            F.exp(
                -F.col("lp_sum_micro").cast("double")
                / (F.col("n_scored").cast("double") * F.lit(float(MICRO)))
            ),
            6,
        ),
    )


def char_trigrams(c: Column) -> Column:
    """Character 3-gram features (the fastText-style feature set): far
    stronger than word features for language ID because scripts and
    orthography live at the character level. Guarded for len < 3 —
    Spark's sequence(1, 0) would DESCEND, not return empty."""
    return F.when(
        F.length(c) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(2)),
            lambda i: c.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def nb_train(
    train_docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    feature_fn=None,
):
    """Fit a multinomial Naive Bayes model — three count tables:

    * term_counts (label, term, c): per-class term frequencies
    * class_totals (label, tot, n_docs): token + document totals
    * stats: 1-row (n_train_docs, v = distinct training terms)

    Training is two aggregations over the exploded token stream; the
    model is (classes × vocab)-bounded, broadcastable for small label
    sets and join-keyed on `term` otherwise."""
    feats = feature_fn if feature_fn is not None else tx.tokens
    tok = train_docs.select(
        F.col(label_col).alias("label"),
        F.explode(feats(F.col(text_col))).alias("term"),
    )
    term_counts = tok.groupBy("label", "term").agg(F.count("*").alias("c"))
    class_totals = term_counts.groupBy("label").agg(F.sum("c").alias("tot"))
    doc_counts = train_docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    class_totals = class_totals.join(doc_counts, "label")
    stats = term_counts.agg(
        F.countDistinct("term").alias("v"),
    ).crossJoin(train_docs.agg(F.count("*").alias("n_train")))
    return term_counts, class_totals, stats


def nb_scores(
    docs: DataFrame,
    term_counts: DataFrame,
    class_totals: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    feature_fn=None,
) -> DataFrame:
    """Per-(doc_id, label) NB posterior scores:
    ln prior + Σ_t tf(t) · ln((c(label,t) + 1) / (tot_label + v)),
    floor-quantized to integer micro-nats per term BEFORE the per-doc
    sum — the shared scoring chain under `nb_classify` (argmax) and
    the active-learning margin sampler (top-2 gap). Plan: doc term
    frequencies cross the small class-totals frame (broadcast;
    |classes| rows), left-join the term_counts model on (term, label),
    aggregate on (doc_id, label). A document yielding ZERO features
    (possible with custom feature_fn, e.g. char trigrams on len < 3)
    has nothing to score and is absent from the output — route such
    docs to a default bucket upstream."""
    feats = feature_fn if feature_fn is not None else tx.tokens
    tf = docs.select(
        "doc_id", F.explode(feats(F.col(text_col))).alias("term")
    ).groupBy("doc_id", "term").agg(F.count("*").alias("tf"))

    expanded = (
        tf.crossJoin(F.broadcast(class_totals))
        .join(term_counts, ["term", "label"], "left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "lp_micro",
            F.col("tf")
            * _lp_micro(
                F.coalesce(F.col("c"), F.lit(0)) + F.lit(1),
                F.col("tot") + F.col("v"),
            ),
        )
    )
    per_class = expanded.groupBy("doc_id", "label").agg(
        F.sum("lp_micro").alias("like_micro"),
        F.first("n_docs").alias("n_docs"),
        F.first("n_train").alias("n_train"),
    )
    return per_class.withColumn(
        "score_micro", F.col("like_micro") + _lp_micro(F.col("n_docs"), F.col("n_train"))
    ).select("doc_id", "label", "score_micro")


def nb_classify(
    docs: DataFrame,
    term_counts: DataFrame,
    class_totals: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    feature_fn=None,
) -> DataFrame:
    """Apply the NB model: per-doc argmax of `nb_scores`, ties broken
    on label asc — fully order-independent. The argmax folds as a
    map-side-combinable `min_by` over the (−score_micro, label) total
    order (score_micro is an integer micro-nat, so the negation is
    exact) — one pre-reduced row per doc per partition crosses the
    shuffle instead of sorting the docs×classes scored frame."""
    scored = nb_scores(docs, term_counts, class_totals, stats, text_col, feature_fn)
    best = scored.groupBy("doc_id").agg(
        F.min_by(
            F.struct(
                F.col("label").alias("pred_label"),
                F.col("score_micro").alias("score_micro"),
            ),
            F.struct(
                (-F.col("score_micro")).alias("ns"), F.col("label").alias("label")
            ),
        ).alias("b")
    )
    return best.select(
        "doc_id", F.col("b.pred_label").alias("pred_label"),
        F.col("b.score_micro").alias("score_micro"),
    )
