"""Model-based corpus quality suite (round 8; driver mandate — no
reference counterpart, `/root/reference/` has no text operators).

Three curation components every production LLM-data pipeline runs,
each registered with an exact DuckDB oracle that replays the full
train → apply chain in SQL (the `bpe_train_merges` discipline):

* `text_perplexity_filter` — CCNet-style bigram-LM perplexity gate:
  the model trains on a designated clean subset (source = 'src0') and
  every document is scored by cross-entropy under it.
* `classify_naive_bayes_lang` — a distributed multinomial Naive Bayes
  classifier (the fastText-classifier role): trained on the even
  doc_ids, applied to the whole corpus, reported with accuracy-ready
  columns.
* `text_gopher_rules` — the Gopher/Falcon heuristic rule battery
  (word count, mean word length, symbol ratio, alpha-word fraction,
  stopword evidence) as one integer-only scan.

Determinism: all log-probabilities are floor-quantized to integer
micro-nats BEFORE aggregation (see `operators/lm.py`), so every sum is
an associative integer sum and the oracle hash-match certifies the
trained models themselves, not just plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64_sql
from query_processing_over_streaming_data_using_flink_spark.operators import lm
from query_processing_over_streaming_data_using_flink_spark.operators import text as tx
from query_processing_over_streaming_data_using_flink_spark.pin import pin_result
from query_processing_over_streaming_data_using_flink_spark.registry import register
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

_TOKENS = r"regexp_split_to_array(text, '\s+')"

# --------------------------------------------------------------------------
# Bigram-LM perplexity filter (CCNet-style)
# --------------------------------------------------------------------------

PPL_TRAIN_SOURCE = "src0"  # the designated "clean" training subset
PPL_KEEP_MAX = 35.0  # keep threshold, chosen from the clean subset's range


def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity gating: an add-one bigram LM trained on
    the src0 subset scores every document; high-perplexity documents
    (gibberish / far off the clean distribution) are dropped.

    The oracle replays training AND scoring in SQL, so a hash match
    certifies the learned count tables, the smoothing arithmetic, the
    micro-nat quantization, and the gate itself end to end.

    Scale: training = two vocabulary-bounded hash aggregates; scoring
    = one (prev, w)-keyed equi-join against the model — the corpus
    streams through, the model shuffles once. No text survives past
    tokenization, no Python in the path."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") == PPL_TRAIN_SOURCE)
    big, ctx, vocab = lm.bigram_lm_train(train)
    scored = lm.perplexity(docs, big, ctx, vocab)
    return scored.select(
        "doc_id",
        "n_scored",
        F.col("lp_sum_micro").cast("long").alias("lp_sum_micro"),
        "ppl",
        (F.col("ppl") <= F.lit(PPL_KEEP_MAX)).alias("keep"),
    )


_PPL_SQL = f"""
WITH tokd AS (
  SELECT doc_id, source, list_prepend('{lm.BOS}', {_TOKENS}) AS arr
  FROM documents
),
pairs AS (
  SELECT doc_id, source, arr[i] AS prev, arr[i+1] AS w
  FROM tokd, UNNEST(range(1, len(arr))) AS t(i)
),
train AS (SELECT prev, w FROM pairs WHERE source = '{PPL_TRAIN_SOURCE}'),
big AS (SELECT prev, w, count(*) AS c_pw FROM train GROUP BY 1, 2),
ctx AS (SELECT prev, sum(c_pw) AS c_p FROM big GROUP BY 1),
voc AS (SELECT count(DISTINCT w) AS v FROM train),
scored AS (
  SELECT p.doc_id,
         CAST(floor(ln((coalesce(b.c_pw, 0) + 1.0) / (coalesce(x.c_p, 0) + voc.v))
                    * {lm.MICRO}) AS BIGINT) AS lp_micro
  FROM pairs p
  LEFT JOIN big b ON p.prev = b.prev AND p.w = b.w
  LEFT JOIN ctx x ON p.prev = x.prev
  CROSS JOIN voc
),
per_doc AS (
  SELECT doc_id, count(*) AS n_scored,
         CAST(sum(lp_micro) AS BIGINT) AS lp_sum_micro
  FROM scored GROUP BY 1
)
SELECT doc_id, n_scored, lp_sum_micro,
       round(exp(-lp_sum_micro / (n_scored * {lm.MICRO}.0)), 6) AS ppl,
       round(exp(-lp_sum_micro / (n_scored * {lm.MICRO}.0)), 6) <= {PPL_KEEP_MAX} AS keep
FROM per_doc
"""

register("text_perplexity_filter", text_perplexity_filter, _PPL_SQL)


# --------------------------------------------------------------------------
# Interpolated Kneser-Ney trigram perplexity gate (CCNet methodology)
# --------------------------------------------------------------------------

PPL_KN_KEEP_MAX = 48.0  # keeps ~83% at sf0.01 — a gate with teeth


def text_perplexity_filter_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `text_perplexity_filter` gate upgraded to the CCNet-standard
    model class: an interpolated Kneser-Ney trigram LM (absolute
    discount D = 3/4, continuation counts at the lower orders) trained
    on the src0 subset scores every document. KN's continuation counts
    change ranks vs the add-one bigram exactly where it matters for
    curation: tokens frequent only inside one collocation ("Francisco"
    after "San") stop looking probable in novel contexts, so templated/
    repetitive text scores worse (see tests/test_lm_kn.py for the
    planted rank flip).

    The oracle replays training AND scoring in SQL — a hash match
    certifies the six learned count tables, the rational discount
    arithmetic, and the gate end to end. Scale: training is two
    shuffle rounds of vocabulary-bounded hash aggregates; scoring is
    five n-gram-keyed equi-joins the corpus streams through once."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") == PPL_TRAIN_SOURCE)
    model = lm.kn_trigram_train(train)
    scored = lm.kn_perplexity(docs, *model)
    return scored.select(
        "doc_id",
        "n_scored",
        F.col("lp_sum_micro").cast("long").alias("lp_sum_micro"),
        "ppl",
        (F.col("ppl") <= F.lit(PPL_KN_KEEP_MAX)).alias("keep"),
    )


# Shared KN scoring chain (training + per-position rational-arithmetic
# scoring), reused by the filter and buckets oracles — and, with a
# different training predicate, by the Moore-Lewis contrast pair.
# MATERIALIZED on every CTE referenced more than once — DuckDB
# otherwise re-inlines the whole upstream chain per reference.
def _kn_scored_ctes(train_where: str = f"source = '{PPL_TRAIN_SOURCE}'") -> str:
    return f"""
tokd AS MATERIALIZED (
  SELECT doc_id, source,
         ['{lm.BOS}', '{lm.BOS}'] || {_TOKENS} AS arr
  FROM documents
),
tris AS MATERIALIZED (
  SELECT doc_id, source, arr[i - 1] AS u, arr[i] AS v, arr[i + 1] AS w
  FROM tokd, UNNEST(range(2, len(arr))) AS t(i)
),
t3 AS MATERIALIZED (
  SELECT u, v, w, count(*) AS c3 FROM tris
  WHERE {train_where} GROUP BY 1, 2, 3
),
t2 AS (
  SELECT u, v, CAST(sum(c3) AS BIGINT) AS c2, count(*) AS n1p2
  FROM t3 GROUP BY 1, 2
),
b2 AS MATERIALIZED (SELECT v, w, count(*) AS cont2 FROM t3 GROUP BY 1, 2),
b2c AS (
  SELECT v, CAST(sum(cont2) AS BIGINT) AS ctx2, count(*) AS n1p1
  FROM b2 GROUP BY 1
),
u1 AS MATERIALIZED (SELECT w, count(*) AS cont1 FROM b2 GROUP BY 1),
kn_stats AS (SELECT CAST(sum(cont1) AS BIGINT) AS bt, count(*) AS vs FROM u1),
kn_lvl1 AS (
  SELECT p.doc_id, t3.c3, t2.c2, t2.n1p2, b2.cont2, b2c.ctx2, b2c.n1p1,
         coalesce(u1.cont1, 0) + 1 AS a1, s.bt + s.vs + 1 AS b1
  FROM tris p
  LEFT JOIN t3 ON p.u = t3.u AND p.v = t3.v AND p.w = t3.w
  LEFT JOIN t2 ON p.u = t2.u AND p.v = t2.v
  LEFT JOIN b2 ON p.v = b2.v AND p.w = b2.w
  LEFT JOIN b2c ON p.v = b2c.v
  LEFT JOIN u1 ON p.w = u1.w
  CROSS JOIN kn_stats s
),
kn_lvl2 AS (
  SELECT doc_id, c3, c2, n1p2,
         CASE WHEN ctx2 IS NULL THEN a1
              ELSE greatest({lm.KN_D_DEN} * coalesce(cont2, 0) - {lm.KN_D_NUM}, 0) * b1
                   + {lm.KN_D_NUM} * n1p1 * a1 END AS a2,
         CASE WHEN ctx2 IS NULL THEN b1
              ELSE {lm.KN_D_DEN} * ctx2 * b1 END AS b2x
  FROM kn_lvl1
),
kn_scored AS MATERIALIZED (
  SELECT doc_id,
         CAST(floor(ln(a3 / b3) * {lm.MICRO}) AS BIGINT) AS lp_micro
  FROM (
    SELECT doc_id,
           CASE WHEN c2 IS NULL THEN a2
                ELSE greatest({lm.KN_D_DEN} * coalesce(c3, 0) - {lm.KN_D_NUM}, 0) * b2x
                     + {lm.KN_D_NUM} * n1p2 * a2 END AS a3,
           CASE WHEN c2 IS NULL THEN b2x
                ELSE {lm.KN_D_DEN} * c2 * b2x END AS b3
    FROM kn_lvl2
  )
),
kn_per_doc AS MATERIALIZED (
  SELECT doc_id, count(*) AS n_scored,
         CAST(sum(lp_micro) AS BIGINT) AS lp_sum_micro
  FROM kn_scored GROUP BY 1
)
"""


_KN_SCORED_CTES = _kn_scored_ctes()

_PPL_KN_SQL = f"""
WITH {_KN_SCORED_CTES}
SELECT doc_id, n_scored, lp_sum_micro,
       round(exp(-lp_sum_micro / (n_scored * {lm.MICRO}.0)), 6) AS ppl,
       round(exp(-lp_sum_micro / (n_scored * {lm.MICRO}.0)), 6) <= {PPL_KN_KEEP_MAX} AS keep
FROM kn_per_doc
"""

register("text_perplexity_filter_kn", text_perplexity_filter_kn, _PPL_KN_SQL)


# --------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (train + apply)
# --------------------------------------------------------------------------


def classify_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Naive Bayes, trained on the even doc_ids with the
    observed `lang` as label, applied to EVERY document. Output keeps
    the true label next to the prediction so the result doubles as an
    accuracy report (`correct` column).

    This is the fastText-style classifier slot in a curation pipeline
    (quality / domain / toxicity routing): training is two token-level
    hash aggregates, the learned model is a (classes × vocab)
    DataFrame, and inference is one term-keyed join + per-doc argmax —
    all linear in corpus tokens × |classes|."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    term_counts, class_totals, stats = lm.nb_train(train, label_col="lang")
    pred = lm.nb_classify(docs, term_counts, class_totals, stats)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .select(
            "doc_id",
            "lang",
            "pred_label",
            F.col("score_micro").cast("long").alias("score_micro"),
            (F.col("lang") == F.col("pred_label")).alias("correct"),
        )
    )


_NB_CHAIN_SQL = f"""tok AS (
  SELECT doc_id, lang, unnest({_TOKENS}) AS term FROM documents
),
train_tok AS (SELECT lang AS label, term FROM tok WHERE doc_id % 2 = 0),
tc AS (SELECT label, term, count(*) AS c FROM train_tok GROUP BY 1, 2),
tot AS (SELECT label, CAST(sum(c) AS BIGINT) AS tot FROM tc GROUP BY 1),
dc AS (
  SELECT lang AS label, count(*) AS n_docs
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
),
st AS (
  SELECT (SELECT count(DISTINCT term) FROM train_tok) AS v,
         (SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS n_train
),
classes AS (SELECT tot.label, tot.tot, dc.n_docs FROM tot JOIN dc USING (label)),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
expanded AS (
  SELECT tf.doc_id, cl.label, cl.n_docs,
         tf.tf * CAST(floor(ln((coalesce(tc.c, 0) + 1.0) / (cl.tot + st.v))
                            * {lm.MICRO}) AS BIGINT) AS lp
  FROM tf
  CROSS JOIN classes cl
  LEFT JOIN tc ON tc.term = tf.term AND tc.label = cl.label
  CROSS JOIN st
),
per_class AS (
  SELECT doc_id, label, CAST(sum(lp) AS BIGINT) AS like_micro
  FROM expanded GROUP BY doc_id, label
),
scored AS (
  SELECT p.doc_id, p.label,
         p.like_micro
           + CAST(floor(ln(cl.n_docs * 1.0 / st.n_train) * {lm.MICRO}) AS BIGINT)
           AS score_micro
  FROM per_class p JOIN classes cl USING (label) CROSS JOIN st
)"""

_NB_SQL = f"""
WITH {_NB_CHAIN_SQL},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, label) AS rk
  FROM scored
)
SELECT d.doc_id, d.lang, r.label AS pred_label, r.score_micro,
       d.lang = r.label AS correct
FROM ranked r JOIN documents d USING (doc_id)
WHERE r.rk = 1
"""

register("classify_naive_bayes_lang", classify_naive_bayes_lang, _NB_SQL)


# --------------------------------------------------------------------------
# Gopher/Falcon heuristic quality rule battery
# --------------------------------------------------------------------------

GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL_X100 = 300  # mean word length in [3, 10] chars
GOPHER_MAX_MWL_X100 = 1000
GOPHER_STOPWORDS = tx.STOPWORDS["en"]


def gopher_flags(docs: DataFrame) -> DataFrame:
    """Frame-level Gopher rule battery — the registered
    `text_gopher_rules` body, shared with the streaming curation gate
    (`streaming/curation.py`) so both faces evaluate the identical
    integer-only projection."""
    toks = tx.tokens(F.col("text"))
    n_words = F.size(toks)
    chars_in_words = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    hash_count = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"#", "")
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "rule_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        # mean word length in [3, 10]: 100*chars between 300*n and 1000*n
        "rule_mean_word_len": (chars_in_words * 100 >= n_words * GOPHER_MIN_MWL_X100)
        & (chars_in_words * 100 <= n_words * GOPHER_MAX_MWL_X100),
        # symbol-to-word ratio (# marks) <= 0.1
        "rule_symbol_ratio": hash_count * 10 <= n_words,
        # >= 80% of words contain an alphabetic character
        "rule_alpha_words": alpha_words * 5 >= n_words * 4,
        # at least 2 distinct common-English stopwords present
        "rule_stopwords": stop_hits >= 2,
    }
    out = docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        chars_in_words.alias("chars_in_words"),
        alpha_words.alias("alpha_words"),
        stop_hits.alias("stop_hits"),
        *[c.alias(name) for name, c in rules.items()],
    )
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality heuristics (Rae et al. 2021, table A1 —
    public knowledge; simplified to the signals computable over this
    corpus) as ONE integer-only projection: word count bounds, mean
    word length bounds, symbol-to-word ratio, alpha-word fraction,
    stopword evidence. All comparisons are cross-multiplied integer
    inequalities — no float thresholds anywhere, so the rule verdicts
    are trivially engine-portable.

    Scale: embarrassingly parallel scan (no shuffle at all); at 100 TB
    this runs at read bandwidth, which is why production pipelines run
    the rule battery FIRST and the model-based filters after."""
    return gopher_flags(load_table(spark, sf_dir, "documents"))


_STOP_LIST = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
_GOPHER_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         {_TOKENS} AS toks,
         len(regexp_replace(text, '\\s+', '', 'g')) AS chars_in_words,
         len(text) - len(regexp_replace(text, '#', '', 'g')) AS hash_count
  FROM documents
),
feat AS (
  SELECT doc_id, lang, chars_in_words, hash_count,
         len(toks) AS n_words,
         len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS alpha_words,
         len(list_intersect(list_distinct(toks), [{_STOP_LIST}])) AS stop_hits
  FROM base
)
SELECT doc_id, lang, n_words, chars_in_words, alpha_words, stop_hits,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS rule_word_count,
       (chars_in_words * 100 >= n_words * {GOPHER_MIN_MWL_X100}
        AND chars_in_words * 100 <= n_words * {GOPHER_MAX_MWL_X100}) AS rule_mean_word_len,
       (hash_count * 10 <= n_words) AS rule_symbol_ratio,
       (alpha_words * 5 >= n_words * 4) AS rule_alpha_words,
       (stop_hits >= 2) AS rule_stopwords,
       ((n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
        AND (chars_in_words * 100 >= n_words * {GOPHER_MIN_MWL_X100}
             AND chars_in_words * 100 <= n_words * {GOPHER_MAX_MWL_X100})
        AND (hash_count * 10 <= n_words)
        AND (alpha_words * 5 >= n_words * 4)
        AND (stop_hits >= 2)) AS keep
FROM feat
"""

register("text_gopher_rules", text_gopher_rules, _GOPHER_SQL)


# --------------------------------------------------------------------------
# Unigram-entropy quality gate (round 12)
# --------------------------------------------------------------------------

# Normalized-entropy floor, in permille of the ln(n) maximum: a doc
# whose unigram distribution realizes < 80% of the entropy a
# same-length all-distinct doc would have is template/boilerplate-
# shaped (few types repeated many times). 800‰ drops the planted
# repetitive docs while keeping ordinary prose at both fixture scales.
ENTROPY_MIN_PERMILLE = 800


def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram (Shannon) entropy — the model-free
    redundancy gate between the Gopher rule battery and the LM
    perplexity filters: low normalized entropy = few token types
    repeated many times (templates, keyword stuffing, boilerplate),
    which length- and ratio-based rules can miss. H = ln(n) −
    (Σ c·ln c)/n over per-doc token counts c.

    Determinism discipline (the `operators/lm.py` pattern): ln(c) is
    floor-quantized to integer micro-nats BEFORE the per-doc sum, so
    the aggregate is an associative integer sum and the only float
    steps are the mirrored final ln(n)/division/round. The gate itself
    is an exact integer cross-multiplication in permille of ln(n) — no
    float threshold can flip between engines.

    Scale: one explode + two hash aggregates keyed by doc — map-side
    combinable, one narrow shuffle, no joins; runs with the rule
    battery in the pre-model pass."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_doc = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n_hapax"),
        F.sum(
            F.col("c")
            * F.floor(F.log(F.col("c").cast("double")) * lm.MICRO).cast("long")
        )
        .cast("long")
        .alias("s_clnc_micro"),
    )
    ln_n = F.log(F.col("n_tokens").cast("double"))
    ent = ln_n - F.col("s_clnc_micro").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(float(lm.MICRO))
    )
    # Gate in exact integers: H ≥ 0.8·ln(n) ⟺ n·ln(n)·1e6 − 1000·... —
    # cross-multiplied with the micro-nat sum so no float compare:
    # (floor(ln(n)·1e6)·n − s_clnc_micro) · 1000 ≥ 800 · floor(ln(n)·1e6) · n
    lnn_micro = F.floor(ln_n * lm.MICRO).cast("long")
    keep = (
        (lnn_micro * F.col("n_tokens") - F.col("s_clnc_micro"))
        * F.lit(1000).cast("long")
        >= F.lit(ENTROPY_MIN_PERMILLE).cast("long") * lnn_micro * F.col("n_tokens")
    ) | (F.col("n_tokens") <= F.lit(1))
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "n_hapax",
        "s_clnc_micro",
        F.round(ent, 6).alias("entropy"),
        keep.alias("keep"),
    )


_ENTROPY_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
),
cnt AS (
  SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         CAST(sum(c * CAST(floor(ln(c) * {lm.MICRO}) AS BIGINT)) AS BIGINT)
           AS s_clnc_micro
  FROM cnt GROUP BY 1
)
SELECT doc_id, n_tokens, n_distinct, n_hapax, s_clnc_micro,
       round(ln(n_tokens) - s_clnc_micro / (n_tokens * {lm.MICRO}.0), 6)
         AS entropy,
       ((CAST(floor(ln(n_tokens) * {lm.MICRO}) AS BIGINT) * n_tokens
         - s_clnc_micro) * 1000
        >= {ENTROPY_MIN_PERMILLE}
           * CAST(floor(ln(n_tokens) * {lm.MICRO}) AS BIGINT) * n_tokens)
       OR n_tokens <= 1 AS keep
FROM per_doc
"""

register("text_unigram_entropy", text_unigram_entropy, _ENTROPY_SQL)


# --------------------------------------------------------------------------
# Hard-negative mining (contrastive training pairs) and active-learning
# margin sampling — the two selection loops a training pipeline runs on
# top of the representation / classifier operators.
# --------------------------------------------------------------------------


def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (the query subset), the most-similar corpus vector with a DIFFERENT
    label — the pair a contrastive loss learns most from. Same
    broadcast-scored plan as exact kNN (the labeled filter rides the
    join condition, pruning pairs before scoring), one per-anchor
    top-1 window. At 10⁹ vectors the scored side swaps to the IVF/SQ8
    index; the mining logic (cross-label top-1) is unchanged."""
    from query_processing_over_streaming_data_using_flink_spark.operators import similarity as sim
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import _N_QUERIES
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
        F.col("label").alias("q_label"),
    ).withColumn("q_n", sim.l2_norm(F.col("q_vec")))
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").cast("array<double>").alias("n_vec"),
        F.col("label").alias("n_label"),
    ).withColumn("n_n", sim.l2_norm(F.col("n_vec")))
    scored = c.join(
        F.broadcast(q),
        (F.col("q_id") != F.col("n_id")) & (F.col("q_label") != F.col("n_label")),
    ).withColumn(
        "sim",
        sim.cosine_norm(F.col("q_vec"), F.col("n_vec"), F.col("q_n"), F.col("n_n")),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(
            "q_id",
            "q_label",
            "n_id",
            F.col("n_label").alias("neg_label"),
            F.round("sim", 6).alias("sim"),
        )
    )


def _hardneg_sql() -> str:
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import _N_QUERIES, _cosine_sql

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS n_id,
         c.label AS neg_label, {_cosine_sql('q.vec', 'c.vec')} AS sim
  FROM (SELECT * FROM e WHERE vec_id < {_N_QUERIES}) q
  JOIN e c ON q.vec_id <> c.vec_id AND q.label <> c.label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
  FROM scored
)
SELECT q_id, q_label, n_id, neg_label, round(sim, 6) AS sim
FROM ranked WHERE rank = 1
"""


register("mine_hard_negatives", mine_hard_negatives, _hardneg_sql())


AL_POOL_K = 25  # labeling budget: the k lowest-margin documents


def sample_uncertain_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-learning margin sampling on top of the Naive Bayes
    classifier: per document the margin between its best and
    second-best class scores (integer micro-nats); the k smallest
    margins are the documents the model is least sure about — the ones
    worth human labels next. One extra window over the per-(doc,label)
    scores the classifier already computes, then a global bounded
    top-k (TakeOrderedAndProject — no full sort)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    term_counts, class_totals, stats = lm.nb_train(train, label_col="lang")

    # The classifier's own per-(doc, label) scores, top-2 per doc.
    per_class = lm.nb_scores(docs, term_counts, class_totals, stats)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("label"))
    top2 = per_class.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    margins = (
        top2.groupBy("doc_id")
        .agg(
            (F.max("score_micro") - F.min("score_micro")).alias("margin_micro"),
            F.min(F.when(F.col("rk") == 1, F.col("label"))).alias("pred_label"),
        )
    )
    return (
        margins.orderBy(F.asc("margin_micro"), F.asc("doc_id"))
        .limit(AL_POOL_K)
        .select("doc_id", "pred_label", F.col("margin_micro").cast("long").alias("margin_micro"))
    )


def _margin_sql() -> str:
    # Built on the SAME scoring chain as the classifier oracle
    # (_NB_CHAIN_SQL) — one text, no drift between the two queries'
    # view of the model.
    return f"""
WITH {_NB_CHAIN_SQL},
top2 AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, label) AS rk
  FROM scored
),
margins AS (
  SELECT doc_id,
         max(score_micro) - min(score_micro) AS margin_micro,
         min(CASE WHEN rk = 1 THEN label END) AS pred_label
  FROM top2 WHERE rk <= 2 GROUP BY doc_id
)
SELECT doc_id, pred_label, margin_micro
FROM margins ORDER BY margin_micro ASC, doc_id ASC LIMIT {AL_POOL_K}
"""


register("sample_uncertain_margin", sample_uncertain_margin, _margin_sql())


# --------------------------------------------------------------------------
# Composed pipeline: rules -> perplexity -> dedup -> classifier routing
# --------------------------------------------------------------------------


def curation_pipeline_model_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 composite: Gopher rule battery first (zero-shuffle,
    kills the cheap garbage), the perplexity gate second — since round
    10 the CCNet-standard interpolated Kneser-Ney TRIGRAM model
    (`text_perplexity_filter_kn`), upgraded from the add-one bigram —
    exact-dedup canonical selection third, and the Naive Bayes
    classifier last (routing surviving docs to per-domain buckets) —
    the production ORDER. For oracle replayability this rendering
    conjoins the four REGISTERED operators by doc_id equi-joins, so
    every stage scans the full corpus here (staged short-circuiting
    would also change what the NB/LM models train on and break the
    per-stage oracles); the staged input-shrinking composition — each
    gate filtering before the next, the form you deploy for cost — is
    `scripts/curate_demo.py`, built from the same operators (the
    bigram gate remains available as `text_perplexity_filter`)."""
    from query_processing_over_streaming_data_using_flink_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    rules = text_gopher_rules(spark, sf_dir).select(
        "doc_id", "n_words", F.col("keep").alias("rules_keep")
    )
    ppl = text_perplexity_filter_kn(spark, sf_dir).select(
        "doc_id", "ppl", F.col("keep").alias("ppl_keep")
    )
    nb = classify_naive_bayes_lang(spark, sf_dir).select("doc_id", "pred_label")
    canon = dd.exact_dedup(docs).select("doc_id", "group_size", "is_canonical")
    return (
        docs.select("doc_id", "lang")
        .join(rules, "doc_id")
        .join(ppl, "doc_id")
        .join(canon, "doc_id")
        .join(nb, "doc_id")
        .filter(F.col("rules_keep") & F.col("ppl_keep") & F.col("is_canonical"))
        .select("doc_id", "lang", "pred_label", "ppl", "n_words", "group_size")
    )


def _pipeline_sql() -> str:
    # Each stage's registered oracle SQL is embedded verbatim as a
    # subquery — the composition is certified from the same text that
    # certifies the stages.
    return f"""
WITH rules AS (SELECT doc_id, n_words, keep AS rules_keep FROM ({_GOPHER_SQL})),
ppl AS (SELECT doc_id, ppl, keep AS ppl_keep FROM ({_PPL_KN_SQL})),
nb AS (SELECT doc_id, pred_label FROM ({_NB_SQL})),
fp AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
canon AS (
  SELECT fp, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM fp GROUP BY fp
),
dedup AS (
  SELECT f.doc_id, c.group_size, f.doc_id = c.canonical_id AS is_canonical
  FROM fp f JOIN canon c USING (fp)
)
SELECT d.doc_id, d.lang, nb.pred_label, ppl.ppl, rules.n_words, dedup.group_size
FROM documents d
JOIN rules USING (doc_id)
JOIN ppl USING (doc_id)
JOIN dedup USING (doc_id)
JOIN nb USING (doc_id)
WHERE rules.rules_keep AND ppl.ppl_keep AND dedup.is_canonical
"""


register("curation_pipeline_model_gated", curation_pipeline_model_gated, _pipeline_sql())




# --------------------------------------------------------------------------
# CCNet head/middle/tail perplexity buckets + deterministic 3-way split
# --------------------------------------------------------------------------


def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's corpus partitioning: per language, documents split into
    head / middle / tail by perplexity TERTILES under the trained LM
    (the absolute `text_perplexity_filter` gate's corpus-relative
    sibling — CCNet trains downstream models on head+middle and
    discards or re-filters tail). ntile(3) per lang with doc_id
    tie-break makes the assignment total and engine-independent; one
    shuffle on lang, each stratum ranks in parallel."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") == PPL_TRAIN_SOURCE)
    big, ctx, vocab = lm.bigram_lm_train(train)
    scored = lm.perplexity(docs, big, ctx, vocab).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(F.asc("ppl"), F.asc("doc_id"))
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        F.ntile(3).over(w),
    )
    return scored.select("doc_id", "lang", "ppl").withColumn("bucket", bucket)


_PPL_BUCKETS_SQL = f"""
WITH scored AS (
  SELECT p.doc_id, d.lang, p.ppl
  FROM ({_PPL_SQL}) p JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, ppl,
       (['head', 'middle', 'tail'])[
         ntile(3) OVER (PARTITION BY lang ORDER BY ppl ASC, doc_id ASC)
       ] AS bucket
FROM scored
"""

register("text_perplexity_buckets", text_perplexity_buckets, _PPL_BUCKETS_SQL)


def text_perplexity_buckets_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partitioning under the Kneser-Ney trigram
    LM — the model class CCNet actually buckets with. Same tertile
    machinery as `text_perplexity_buckets`; because KN reranks
    repetitive/templated documents (continuation counts), bucket
    membership genuinely differs from the bigram version on the same
    corpus (asserted in tests/test_lm_kn.py)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") == PPL_TRAIN_SOURCE)
    model = lm.kn_trigram_train(train)
    scored = lm.kn_perplexity(docs, *model).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(F.asc("ppl"), F.asc("doc_id"))
    bucket = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        F.ntile(3).over(w),
    )
    return scored.select("doc_id", "lang", "ppl").withColumn("bucket", bucket)


_PPL_BUCKETS_KN_SQL = f"""
WITH {_KN_SCORED_CTES},
kn_doc_ppl AS (
  SELECT p.doc_id, d.lang,
         round(exp(-p.lp_sum_micro / (p.n_scored * {lm.MICRO}.0)), 6) AS ppl
  FROM kn_per_doc p JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, ppl,
       (['head', 'middle', 'tail'])[
         ntile(3) OVER (PARTITION BY lang ORDER BY ppl ASC, doc_id ASC)
       ] AS bucket
FROM kn_doc_ppl
"""

register("text_perplexity_buckets_kn", text_perplexity_buckets_kn, _PPL_BUCKETS_KN_SQL)


# --------------------------------------------------------------------------
# Perplexity-tilted source mixture (DoReMi-family domain reweighting)
# --------------------------------------------------------------------------


def mixture_rates(scored_src: DataFrame) -> DataFrame:
    """Per-source rate table of `mixture_ppl_tilted`, frame-level:
    input is a KN-scored frame carrying (doc_id, n_scored,
    lp_sum_micro, source); output is (source, n_docs, est_tokens, ppl,
    w_milli, token_budget, keep_rate_pmy) with the exact-integer
    DECIMAL(38,0) budget chain. Shared with the streaming curation
    gate (`streaming/curation.py`), which derives the identical rates
    from its live incrementally-trained model. The input subtree is
    referenced twice (per-source rollup + grand totals) — the caller
    persists/checkpoints it as `mixture_ppl_tilted` does."""
    per_src = scored_src.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_scored").cast("long").alias("est_tokens"),
        F.sum("lp_sum_micro").cast("long").alias("lp_sum"),
    )
    per_src = per_src.withColumn(
        "ppl",
        F.round(
            F.exp(
                -F.col("lp_sum").cast("double")
                / (F.col("est_tokens").cast("double") * F.lit(float(lm.MICRO)))
            ),
            6,
        ),
    ).withColumn("w_milli", F.floor(F.lit(1000000.0) / F.col("ppl")).cast("long"))
    totals = per_src.agg(
        F.sum("est_tokens").alias("total"), F.sum("w_milli").alias("total_w")
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .withColumn(
            "token_budget",
            F.expr("(CAST((total DIV 2) AS DECIMAL(38,0)) * w_milli) DIV total_w"),
        )
        .withColumn(
            "keep_rate_pmy",
            F.least(
                F.lit(10000).cast("long"),
                F.expr("(CAST(token_budget AS DECIMAL(38,0)) * 10000) DIV est_tokens"),
            ),
        )
        .select(
            "source", "n_docs", "est_tokens", "ppl", "w_milli",
            "token_budget", "keep_rate_pmy",
        )
    )


def mixture_ppl_tilted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-driven domain mixing — the DoReMi-family idea of setting
    source weights from a trained model's judgment rather than from
    token counts alone: each source's corpus-level perplexity under
    the KN trigram LM (trained on the designated clean subset, the
    same model `text_perplexity_filter_kn` certifies) sets its mixture
    weight ∝ 1/ppl — target-like sources are upweighted, off-domain
    sources pay for looking unlike the clean subset. Token mass is the
    scorer's own n_scored (trigram positions), so the weights and the
    budget share one unit. Spend half the corpus: per-source budget ∝
    weight, keep-rate = budget/tokens capped at 1, realized by the
    salted-md5 Bernoulli draw (permyriad integer threshold — no IEEE
    rounding can flip a draw).

    Determinism discipline: the ONLY float steps are the two mirrored
    ops the per-doc gate already certifies (round(exp(lp/n), 6)) and
    one floor(1e6/ppl) on the rounded value; everything after is
    integer DIV arithmetic with the product chains widened to
    DECIMAL(38,0) — (total DIV 2) × w_milli passes int64 at ~1.8e13
    total tokens, inside the 100 TB regime — and the quotients (which
    fit) landing back in BIGINT; the oracle mirrors via HUGEINT.
    Scale: the corpus streams the KN scoring joins once; everything
    downstream is per-source rows + one broadcast of the rate table
    back onto the doc stream for the kept-mass audit. Like
    `bpe_train_merges`, the bounded final table (9 columns ×
    |sources| rows) is materialized eagerly so both persisted
    intermediates are unpersisted before return — a long-lived session
    running the full sweep leaks no cached blocks."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") == PPL_TRAIN_SOURCE)
    model = lm.kn_trigram_train(train)
    # `scored` (the expensive train+score subtree) feeds BOTH the
    # per-source rollup and the kept-mass audit, and the rate table is
    # referenced twice more — persist both so the corpus really does
    # stream the scoring joins once per action, as the plan contract
    # below claims (without it Spark re-evaluates the subtree per
    # reference: ~5x the dominant stage).
    scored = lm.kn_perplexity(docs, *model).join(
        docs.select("doc_id", "source"), "doc_id"
    ).persist()
    rates = mixture_rates(scored).persist()
    kept = (
        scored.join(F.broadcast(rates.select("source", "keep_rate_pmy")), "source")
        .filter(
            tx.sample_hash(F.col("doc_id"), salt="mixppl", modulus=10000)
            < F.col("keep_rate_pmy")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_scored").cast("long").alias("kept_tokens"),
        )
    )
    out = (
        rates.join(kept, "source", "left")
        .select(
            "source", "n_docs", "est_tokens", "ppl", "w_milli", "token_budget",
            "keep_rate_pmy",
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )
    # One eager executor-side materialization of the bounded
    # (|sources|-row) result — the bpe_train localCheckpoint
    # discipline, no driver collect — which cuts the lineage so both
    # persisted intermediates can be released immediately. Routed
    # through pin_result so plan-dump tooling sees the real subtree
    # (explain-mode no-op: see pin.py).
    out = pin_result(out)
    scored.unpersist()
    rates.unpersist()
    return out


_MIX_PPL_SQL = f"""
WITH {_KN_SCORED_CTES},
src_doc AS MATERIALIZED (
  SELECT d.doc_id, d.source, p.n_scored, p.lp_sum_micro
  FROM kn_per_doc p JOIN documents d USING (doc_id)
),
per_src AS MATERIALIZED (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_scored) AS BIGINT) AS est_tokens,
         CAST(sum(lp_sum_micro) AS BIGINT) AS lp_sum
  FROM src_doc GROUP BY source
),
wtab AS MATERIALIZED (
  SELECT source, n_docs, est_tokens,
         round(exp(-lp_sum / (est_tokens * {lm.MICRO}.0)), 6) AS ppl,
         CAST(floor(1000000.0 / round(exp(-lp_sum / (est_tokens * {lm.MICRO}.0)), 6))
              AS BIGINT) AS w_milli
  FROM per_src
),
tot AS (
  SELECT CAST(sum(est_tokens) AS BIGINT) AS total,
         CAST(sum(w_milli) AS BIGINT) AS total_w
  FROM wtab
),
rates AS MATERIALIZED (
  -- product chains widened to HUGEINT, mirroring the Spark side's
  -- DECIMAL(38,0): (total//2)*w_milli passes int64 at ~1.8e13 tokens
  SELECT w.source, w.n_docs, w.est_tokens, w.ppl, w.w_milli,
         CAST((CAST(t.total // 2 AS HUGEINT) * w.w_milli) // t.total_w
              AS BIGINT) AS token_budget,
         CAST(least(10000,
                    (CAST((CAST(t.total // 2 AS HUGEINT) * w.w_milli)
                          // t.total_w AS HUGEINT) * 10000)
                    // w.est_tokens) AS BIGINT) AS keep_rate_pmy
  FROM wtab w CROSS JOIN tot t
),
kept AS (
  SELECT s.source,
         CAST(count(*) AS BIGINT) AS kept_docs,
         CAST(sum(s.n_scored) AS BIGINT) AS kept_tokens
  FROM src_doc s JOIN rates r USING (source)
  WHERE {md5_hash64_sql("'mixppl:' || CAST(s.doc_id AS VARCHAR)")} % 10000
        < r.keep_rate_pmy
  GROUP BY s.source
)
SELECT r.source, r.n_docs, r.est_tokens, r.ppl, r.w_milli, r.token_budget,
       r.keep_rate_pmy,
       CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept k USING (source)
"""

register("mixture_ppl_tilted", mixture_ppl_tilted, _MIX_PPL_SQL)


def curation_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation lineage a 100 TB training run executes,
    ending at the export artifact (round-11; extends
    `curation_pipeline_model_gated`, which stops at classifier
    routing): Gopher rule battery → KN-trigram perplexity gate →
    exact-dedup canonical selection → fuzzy benchmark decontamination
    (MinHash vs the eval slice) → perplexity-tilted source mixture
    (each surviving doc passes the registered `mixture_ppl_tilted`
    keep-rate Bernoulli draw for its source) → leakage-safe cluster
    split → per-(split, shard) export manifest — the `filter → dedup →
    decontaminate → mixture → split → export` order production
    pipelines run. Output = `export_shard_manifest`'s deterministic
    manifest keyed by (split, shard_id): diffable proof of exactly
    which bytes each split ships, with the order-sensitive fingerprint
    fixing training order.

    Like `curation_pipeline_model_gated`, this registered rendering
    conjoins the REGISTERED stage operators by doc_id equi-joins so the
    chained oracle replays every stage from the same SQL text that
    certifies it stage-by-stage (each stage therefore scans the full
    corpus here — the models must train on what their per-stage oracles
    train on); the staged input-shrinking deployment form is
    `scripts/curate_demo.py`, built from the same operators. Scale
    shape: the gates/dedup/decontamination stages are the registered
    plans unchanged; the mixture adds one bounded broadcast (|sources|
    rows); the manifest adds one shuffle, partitioned by the same
    (split, shard_id) key the writer partitions by.

    ONE KN chain (round 12): the perplexity gate and the mixture rates
    both derive from a single trained-and-scored KN frame — exactly
    how the streaming face shares one live LM between its gate and its
    rates (`streaming/curation.py`). The per-stage registered queries
    (`text_perplexity_filter_kn`, `mixture_ppl_tilted`) train
    identical models from identical inputs, so the manifest is
    bit-identical to the two-chain composition, and the chained oracle
    (which embeds the same `_KN_SCORED_CTES` text once per stage SQL,
    deduplicated by DuckDB's MATERIALIZED CTEs) is unchanged — but the
    most expensive query in the suite stops paying the KN train+score
    chain twice."""
    from query_processing_over_streaming_data_using_flink_spark.operators import dedup as dd
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import (
        decontaminate_eval_minhash,
        split_leakage_safe,
    )

    docs = load_table(spark, sf_dir, "documents")
    rules = text_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rules_keep")
    )
    # Hoisted KN chain: train on the clean subset once, score the
    # corpus once; persist because the scored frame feeds BOTH the
    # per-doc gate and the per-source rate rollup (mixture_rates scans
    # it twice — per-source aggregate + grand totals).
    train = docs.filter(F.col("source") == PPL_TRAIN_SOURCE)
    model = lm.kn_trigram_train(train)
    scored = (
        lm.kn_perplexity(docs, *model)
        .join(docs.select("doc_id", "source"), "doc_id")
        .persist()
    )
    ppl = scored.select(
        "doc_id", (F.col("ppl") <= F.lit(PPL_KN_KEEP_MAX)).alias("ppl_keep")
    )
    rates = mixture_rates(scored).select("source", "keep_rate_pmy")
    canon = dd.exact_dedup(docs).select("doc_id", "is_canonical")
    contam = decontaminate_eval_minhash(spark, sf_dir).select("doc_id")
    splits = split_leakage_safe(spark, sf_dir).select("doc_id", "split")
    kept = (
        docs.select("doc_id", "source", "text")
        .join(rules, "doc_id")
        .join(ppl, "doc_id")
        .join(canon, "doc_id")
        .filter(F.col("rules_keep") & F.col("ppl_keep") & F.col("is_canonical"))
        .join(contam, "doc_id", "left_anti")
        .join(F.broadcast(rates), "source")
        .filter(
            tx.sample_hash(F.col("doc_id"), salt="mixppl", modulus=10000)
            < F.col("keep_rate_pmy")
        )
        .join(splits, "doc_id")
    )
    # Eagerly materialize the bounded (|splits×shards|-row) manifest so
    # the scored frame's cache can be released before return
    # (explain-mode no-op: see pin.py).
    out = pin_result(split_manifest_tail(kept))
    scored.unpersist()
    return out


def split_manifest_tail(kept: DataFrame) -> DataFrame:
    """Shared export tail of the full pipeline — the per-(split,
    shard) deterministic manifest over a kept frame carrying (doc_id,
    text, split). Frame-level so the streaming curation face
    (`streaming/curation.py`) emits the bit-identical artifact from
    its live-state gate chain."""
    from pyspark.sql.window import Window

    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import (
        _FP_MOD,
        shard_doc_frame,
    )

    d = shard_doc_frame(kept, extra=("split",))
    w = Window.partitionBy("split", "shard_id").orderBy("draw", "doc_id")
    d = d.withColumn("pos", F.row_number().over(w).cast("long")).withColumn(
        "ofp",
        ((F.col("fp").cast("decimal(38,0)") * F.col("pos")) % F.lit(_FP_MOD))
        .cast("long"),
    )
    return (
        d.groupBy("split", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars_txt").alias("total_chars"),
            (F.sum(F.col("fp").cast("decimal(38,0)")) % F.lit(_FP_MOD))
            .cast("long")
            .alias("content_fp"),
            (F.sum(F.col("ofp").cast("decimal(38,0)")) % F.lit(_FP_MOD))
            .cast("long")
            .alias("order_fp"),
        )
        .orderBy("split", "shard_id")
    )


def _full_pipeline_sql() -> str:
    # Every stage's REGISTERED oracle text embedded verbatim as a
    # subquery (the `_pipeline_sql` discipline, extended to the export
    # tail) — the composition is certified from the same SQL that
    # certifies each stage.
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import (
        _FP_MOD,
        _H64,
        N_SHARDS,
        _decontam_minhash_sql,
        _leakage_safe_split_sql,
    )

    mix_draw = md5_hash64_sql("'mixppl:' || CAST(d.doc_id AS VARCHAR)")
    return f"""
WITH rules AS (SELECT doc_id, keep AS rules_keep FROM ({_GOPHER_SQL})),
pplg AS (SELECT doc_id, keep AS ppl_keep FROM ({_PPL_KN_SQL})),
fp0 AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
canon0 AS (SELECT fp, min(doc_id) AS canonical_id FROM fp0 GROUP BY fp),
dedup AS (
  SELECT f.doc_id FROM fp0 f JOIN canon0 c USING (fp)
  WHERE f.doc_id = c.canonical_id
),
contam AS (SELECT DISTINCT doc_id FROM ({_decontam_minhash_sql()})),
mrates AS (SELECT source, keep_rate_pmy FROM ({_MIX_PPL_SQL})),
splits AS (SELECT doc_id, split FROM ({_leakage_safe_split_sql()})),
kept AS (
  SELECT d.doc_id, d.text, s.split
  FROM documents d
  JOIN rules USING (doc_id)
  JOIN pplg USING (doc_id)
  JOIN dedup USING (doc_id)
  JOIN mrates r ON d.source = r.source
  JOIN splits s ON d.doc_id = s.doc_id
  WHERE rules.rules_keep AND pplg.ppl_keep
    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
    AND ({mix_draw}) % 10000 < r.keep_rate_pmy
),
sh AS (
  SELECT split, doc_id,
         {_H64.format(x="'shard:' || CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard_id,
         {_H64.format(x="'order:' || CAST(doc_id AS VARCHAR)")} AS draw,
         {_H64.format(x='text')} AS fp,
         CAST(length(text) AS BIGINT) AS n_chars_txt
  FROM kept
),
p AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY split, shard_id
                                 ORDER BY draw, doc_id) AS BIGINT) AS pos
  FROM sh
)
SELECT split, shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars_txt) AS BIGINT) AS total_chars,
       CAST(sum(CAST(fp AS HUGEINT)) % {_FP_MOD} AS BIGINT) AS content_fp,
       CAST(sum((CAST(fp AS HUGEINT) * pos) % {_FP_MOD})
            % {_FP_MOD} AS BIGINT) AS order_fp
FROM p
GROUP BY split, shard_id
"""


register("curation_pipeline_full", curation_pipeline_full, _full_pipeline_sql())


def export_curriculum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`export_shard_manifest`'s curriculum sibling: same deterministic
    sharding and same diffable 64-row manifest, but the within-shard
    training order is MODEL-ORDERED — ascending per-token KN
    cross-entropy (easy → hard, the classic curriculum schedule) with
    the doc_id tie-break — instead of the salted random draw. Because
    the order-sensitive fingerprint is position-weighted, `order_fp`
    CERTIFIES the curriculum: a loader (or a second cluster's export)
    that shuffles, reverses, or re-ties the schedule produces a
    different manifest row. Difficulty is integer micro-nats/token
    ((−lp_sum) DIV n_scored — the truncating-DIV discipline
    `sample_moore_lewis` documents), and each shard reports its
    difficulty span (ce_lo/ce_hi) so the curriculum's shape is
    auditable per shard. Plan: the registered KN scoring chain + one
    shuffle (the per-shard window = the writer's repartition), then
    the 64-row aggregate."""
    from pyspark.sql.window import Window

    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import (
        _FP_MOD,
        shard_doc_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    model = lm.kn_trigram_train(docs.filter(F.col("source") == PPL_TRAIN_SOURCE))
    ce = lm.kn_perplexity(docs, *model).select(
        "doc_id", F.expr("(-lp_sum_micro) DIV n_scored").alias("ce_micro")
    )
    d = shard_doc_frame(docs).drop("draw").join(ce, "doc_id")
    w = Window.partitionBy("shard_id").orderBy("ce_micro", "doc_id")
    d = d.withColumn("pos", F.row_number().over(w).cast("long")).withColumn(
        "ofp",
        ((F.col("fp").cast("decimal(38,0)") * F.col("pos")) % F.lit(_FP_MOD))
        .cast("long"),
    )
    return (
        d.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars_txt").alias("total_chars"),
            (F.sum(F.col("fp").cast("decimal(38,0)")) % F.lit(_FP_MOD))
            .cast("long")
            .alias("content_fp"),
            (F.sum(F.col("ofp").cast("decimal(38,0)")) % F.lit(_FP_MOD))
            .cast("long")
            .alias("order_fp"),
            F.min("ce_micro").alias("ce_lo"),
            F.max("ce_micro").alias("ce_hi"),
        )
        .orderBy("shard_id")
    )


def _curriculum_manifest_sql() -> str:
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_llm_data import (
        _FP_MOD,
        _H64,
        N_SHARDS,
    )

    return f"""
WITH {_KN_SCORED_CTES},
ce AS (
  SELECT doc_id, (-lp_sum_micro) // n_scored AS ce_micro FROM kn_per_doc
),
d AS (
  SELECT doc_id,
         {_H64.format(x="'shard:' || CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard_id,
         {_H64.format(x='text')} AS fp,
         CAST(length(text) AS BIGINT) AS n_chars_txt
  FROM documents
),
p AS (
  SELECT d.*, ce.ce_micro,
         CAST(row_number() OVER (PARTITION BY shard_id
                                 ORDER BY ce.ce_micro, d.doc_id) AS BIGINT) AS pos
  FROM d JOIN ce USING (doc_id)
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars_txt) AS BIGINT) AS total_chars,
       CAST(sum(CAST(fp AS HUGEINT)) % {_FP_MOD} AS BIGINT) AS content_fp,
       CAST(sum((CAST(fp AS HUGEINT) * pos) % {_FP_MOD})
            % {_FP_MOD} AS BIGINT) AS order_fp,
       CAST(min(ce_micro) AS BIGINT) AS ce_lo,
       CAST(max(ce_micro) AS BIGINT) AS ce_hi
FROM p
GROUP BY shard_id
"""


register("export_curriculum_manifest", export_curriculum_manifest, _curriculum_manifest_sql())


MOORE_LEWIS_K = 100  # selection budget


def sample_moore_lewis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Lewis cross-entropy-difference data selection (Moore &
    Lewis 2010; the CCNet/importance-sampling ancestor): score every
    document by H_in(d) − H_gen(d) — its per-token cross-entropy under
    an IN-DOMAIN LM (the KN trigram trained on the clean src0 subset)
    minus that under a GENERAL LM (the same model class trained on the
    whole corpus) — and keep the k lowest. Unlike a raw perplexity
    gate, the general-model subtraction cancels generic fluency: a doc
    scores well only for looking MORE like the target domain than like
    the corpus average, which is what makes this the classic
    domain-data selector.

    Determinism: both models use the registered KN integer micro-nat
    scoring, and the score itself stays integer — MICRO-NATS PER TOKEN
    via truncating division, (lp_gen − lp_in) DIV n_scored, identical
    in both engines (a round(x, 6) rendering hit Spark-HALF_UP vs
    DuckDB-half-even divergence at exact .5 boundaries, which integer
    ratios of micro-nat sums reach routinely — 6138678/12 did, in the
    sf0.001 fixture). The micro-nat quantum bounds the product: |lp
    diff| ≤ ~40·10^6 per token · doc length, inside int64 to ~10^10-
    token documents. Selection is a bounded top-k
    (TakeOrderedAndProject), no global sort. Scale: two vocabulary-
    bounded training aggregates + the corpus streaming the two scoring
    join chains once each."""
    docs = load_table(spark, sf_dir, "documents")
    m_in = lm.kn_trigram_train(docs.filter(F.col("source") == PPL_TRAIN_SOURCE))
    m_gen = lm.kn_trigram_train(docs)
    s_in = lm.kn_perplexity(docs, *m_in).select(
        "doc_id",
        "n_scored",
        F.col("lp_sum_micro").cast("long").alias("lp_in_micro"),
    )
    s_gen = lm.kn_perplexity(docs, *m_gen).select(
        "doc_id", F.col("lp_sum_micro").cast("long").alias("lp_gen_micro")
    )
    score = F.expr("(lp_gen_micro - lp_in_micro) DIV n_scored")
    return (
        s_in.join(s_gen, "doc_id")
        .select(
            "doc_id", "n_scored", "lp_in_micro", "lp_gen_micro",
            score.alias("ml_score_micro"),
        )
        .orderBy(F.asc("ml_score_micro"), F.asc("doc_id"))
        .limit(MOORE_LEWIS_K)
    )


def _moore_lewis_sql() -> str:
    # Two full KN chains (different training predicates) as scoped
    # subqueries — each is the registered KN oracle text verbatim.
    return f"""
WITH s_in AS MATERIALIZED (
  SELECT doc_id, n_scored, lp_sum_micro AS lp_in_micro
  FROM (WITH {_kn_scored_ctes()} SELECT * FROM kn_per_doc)
),
s_gen AS MATERIALIZED (
  SELECT doc_id, lp_sum_micro AS lp_gen_micro
  FROM (WITH {_kn_scored_ctes("TRUE")} SELECT * FROM kn_per_doc)
)
SELECT i.doc_id, i.n_scored, i.lp_in_micro, g.lp_gen_micro,
       (g.lp_gen_micro - i.lp_in_micro) // i.n_scored AS ml_score_micro
FROM s_in i JOIN s_gen g USING (doc_id)
ORDER BY ml_score_micro ASC, doc_id ASC
LIMIT {MOORE_LEWIS_K}
"""


register("sample_moore_lewis", sample_moore_lewis, _moore_lewis_sql())


CALIBRATION_BINS = 10


def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit for the quality/domain classifier — the check
    a production routing gate ships with (is an 80%-confident
    prediction right 80% of the time?): on the HELD-OUT half (odd
    doc_ids; the classifier trains on the even half), documents are
    ranked by the classifier's own top1−top2 margin and cut into
    deciles PER PREDICTED CLASS; each (class, decile) reports volume,
    accuracy, and the margin range — the reliability-diagram table, and
    per-class because routing acts per class. Integer-deterministic:
    margins are integer micro-nats, accuracy is integer permille via
    truncating division (identical DIV semantics both engines), and
    ntile is totalized by the doc_id tie-break. Scale: the scoring
    chain the classifier already runs, plus one window partitioned by
    predicted class — parallel across classes."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    term_counts, class_totals, stats = lm.nb_train(train, label_col="lang")
    per_class = lm.nb_scores(docs, term_counts, class_totals, stats)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("label"))
    top2 = per_class.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    margins = top2.groupBy("doc_id").agg(
        (F.max("score_micro") - F.min("score_micro")).alias("margin_micro"),
        F.min(F.when(F.col("rk") == 1, F.col("label"))).alias("pred_label"),
    )
    held = margins.join(docs.select("doc_id", "lang"), "doc_id").filter(
        F.col("doc_id") % 2 == 1
    )
    wb = Window.partitionBy("pred_label").orderBy(
        F.asc("margin_micro"), F.asc("doc_id")
    )
    # cast: Spark ntile is int, the DuckDB oracle's is BIGINT
    binned = held.withColumn("bin", F.ntile(CALIBRATION_BINS).over(wb).cast("long"))
    return (
        binned.groupBy("pred_label", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("lang") == F.col("pred_label")).cast("long")).alias(
                "n_correct"
            ),
            F.min("margin_micro").cast("long").alias("margin_lo"),
            F.max("margin_micro").cast("long").alias("margin_hi"),
        )
        .withColumn("acc_permille", F.expr("(n_correct * 1000) DIV n_docs"))
        .orderBy("pred_label", "bin")
    )


def _calibration_sql() -> str:
    # Same scoring chain as the classifier and margin oracles.
    return f"""
WITH {_NB_CHAIN_SQL},
top2 AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_micro DESC, label) AS rk
  FROM scored
),
margins AS (
  SELECT doc_id,
         max(score_micro) - min(score_micro) AS margin_micro,
         min(CASE WHEN rk = 1 THEN label END) AS pred_label
  FROM top2 WHERE rk <= 2 GROUP BY doc_id
),
held AS (
  SELECT m.doc_id, m.margin_micro, m.pred_label, d.lang,
         ntile({CALIBRATION_BINS}) OVER (PARTITION BY m.pred_label
                                         ORDER BY m.margin_micro ASC,
                                                  m.doc_id ASC) AS bin
  FROM margins m JOIN documents d USING (doc_id)
  WHERE m.doc_id % 2 = 1
)
SELECT pred_label, bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN lang = pred_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(min(margin_micro) AS BIGINT) AS margin_lo,
       CAST(max(margin_micro) AS BIGINT) AS margin_hi,
       (CAST(sum(CASE WHEN lang = pred_label THEN 1 ELSE 0 END) AS BIGINT)
        * 1000) // CAST(count(*) AS BIGINT) AS acc_permille
FROM held
GROUP BY pred_label, bin
"""


register("classifier_calibration_bins", classifier_calibration_bins, _calibration_sql())


# Shared with the cluster-level leakage-safe split in suite_llm_data
# (defined in the leaf module to keep plan modules acyclic).
from query_processing_over_streaming_data_using_flink_spark.operators.text import (  # noqa: E402
    SPLIT_TEST_PERMILLE,
    SPLIT_VAL_PERMILLE,
)


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-way corpus split (train/val/test) from the
    salted md5 draw (`operators/text.py:sample_hash`): reproducible
    across runs, engines, cluster sizes, and partitionings — unlike
    `randomSplit`, whose assignment depends on partition layout. The
    same doc always lands in the same split, so eval sets stay stable
    as the corpus grows (only NEW docs join each split). Zero-shuffle
    scan + the summary aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    draw = tx.sample_hash(F.col("doc_id"), salt="split", modulus=1000)
    split = (
        F.when(draw < SPLIT_VAL_PERMILLE, F.lit("val"))
        .when(draw < SPLIT_VAL_PERMILLE + SPLIT_TEST_PERMILLE, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        docs.select("doc_id", "lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
    )


def _split_sql() -> str:
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64_sql

    h = md5_hash64_sql("'split:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH assigned AS (
  SELECT doc_id, lang,
         CASE WHEN ({h}) % 1000 < {SPLIT_VAL_PERMILLE} THEN 'val'
              WHEN ({h}) % 1000 < {SPLIT_VAL_PERMILLE + SPLIT_TEST_PERMILLE} THEN 'test'
              ELSE 'train' END AS split
  FROM documents
)
SELECT lang, split, count(*) AS n_docs, min(doc_id) AS first_doc
FROM assigned GROUP BY lang, split
"""


register("split_train_val_test", split_train_val_test, _split_sql())


# --------------------------------------------------------------------------
# Entity resolution: fuzzy pairs -> connected components -> canonicals
# --------------------------------------------------------------------------


def er_resolve_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full entity resolution composed from registered pieces: blocked
    fuzzy candidate pairs (`blocked_fuzzy_pairs`) feed the hardened
    connected-components labeler (`dedup_clusters` — pointer-jumped
    min-label propagation), producing one canonical name per fuzzy
    cluster; each name also reports how many part records it resolves.
    The labeler's ids here are the NAMES themselves (labels only need
    a total order, which strings have) — the min-string name is the
    cluster canonical. Vocabulary-bounded end to end: clustering work
    scales with distinct names, never with part rows."""
    from query_processing_over_streaming_data_using_flink_spark.operators import dedup as dd
    from query_processing_over_streaming_data_using_flink_spark.operators.relational import blocked_fuzzy_pairs

    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("doc_id")).distinct()
    pairs = blocked_fuzzy_pairs(
        part,
        "p_name",
        # '' (not NULL) for one-word names — mirrors DuckDB's split_part
        F.coalesce(F.get(F.split(F.col("p_name"), " "), 1), F.lit("")),
        max_distance=3,
    ).select(F.col("name_a").alias("doc_a"), F.col("name_b").alias("doc_b"))
    clusters = dd.dedup_clusters(names, pairs)
    n_records = part.groupBy(F.col("p_name").alias("doc_id")).agg(
        F.count("*").alias("n_records")
    )
    return clusters.join(n_records, "doc_id").select(
        F.col("doc_id").alias("name"),
        F.col("cluster_id").alias("canonical_name"),
        "cluster_size",
        "n_records",
    )


_ER_RESOLVE_SQL = """
WITH RECURSIVE
names AS (SELECT DISTINCT p_name AS name, split_part(p_name, ' ', 2) AS block FROM part),
pairs AS (
  SELECT a.name AS doc_a, b.name AS doc_b
  FROM names a JOIN names b USING (block)
  WHERE a.name < b.name AND levenshtein(a.name, b.name) <= 3
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT name AS doc_id, name AS label FROM names
  UNION
  SELECT e.src AS doc_id, r.label FROM edges e JOIN reach r ON e.dst = r.doc_id
),
labels AS (SELECT doc_id, min(label) AS canonical_name FROM reach GROUP BY doc_id),
sizes AS (SELECT canonical_name, count(*) AS cluster_size FROM labels GROUP BY canonical_name),
recs AS (SELECT p_name AS doc_id, count(*) AS n_records FROM part GROUP BY 1)
SELECT l.doc_id AS name, l.canonical_name, s.cluster_size, r.n_records
FROM labels l JOIN sizes s USING (canonical_name) JOIN recs r USING (doc_id)
"""

register("er_resolve_part_names", er_resolve_part_names, _ER_RESOLVE_SQL)


# --------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al., 2023)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 4096  # hashed n-gram feature space (paper uses 10k)
DSIR_TARGET_SOURCE = PPL_TRAIN_SOURCE  # src0 doubles as the target domain
DSIR_KEEP_K = 200  # resampled corpus size (< the sf0.01 doc count)
_DSIR_GUMBEL_MOD = 1 << 40  # uniform-draw resolution for the Gumbel key


def _dsir_gram_expr() -> str:
    """Spark SQL expr: word unigrams ++ space-joined bigrams of the
    token array `tk` — DSIR's hashed n-gram feature stream. Bigram arm
    guarded like `lm.doc_bigrams` (sequence() descends on short
    arrays)."""
    return (
        "concat(tk, CASE WHEN size(tk) >= 2 THEN "
        "transform(sequence(1, size(tk) - 1), i -> concat(tk[i-1], ' ', tk[i])) "
        "ELSE array() END)"
    )


def _dsir_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, lw_micro): the DSIR importance weight of every
    document — log w(doc) = Σ_features [ln p̂(b) − ln q̂(b)] where p̂/q̂
    are add-one-smoothed hashed-n-gram bag models of the target
    (source = src0) and raw (whole corpus) distributions.

    Determinism: each bucket's log-ratio is ONE floor-quantized
    micro-nat integer (`lm._lp_micro` of two int64 cross-products), so
    the per-doc weight is an associative integer sum — the oracle hash
    match certifies the fitted feature models and the weights exactly.

    Plan shape (the 100×-scale story): the feature stream is a
    map-side explode; both model fits are hash aggregates onto the
    4096-bucket key space (tiny shuffles, full map-side combine); the
    ratio table is ≤4096 rows and BROADCASTS into the per-instance
    scoring join; the only corpus-sized shuffle is the final per-doc
    sum. Like the KN chain, the int64 cross-products bound the corpus
    size (~10¹⁸ product ceiling) — past that, swap the rational for
    float interpolation."""
    docs = load_table(spark, sf_dir, "documents")
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64
    from query_processing_over_streaming_data_using_flink_spark.operators.layout import fanout

    # Gram explode + md5 bucketing are map-side in the scan task —
    # fan an under-parallel input out so they parallelize.
    docs = fanout(docs)
    feats = (
        docs.withColumn("tk", tx.tokens(F.col("text")))
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(_dsir_gram_expr())).alias("gram"),
        )
        .select(
            "doc_id",
            "source",
            F.pmod(md5_hash64(F.col("gram")), F.lit(DSIR_BUCKETS)).alias("b"),
        )
    )
    totals = feats.agg(
        F.count("*").alias("tot_q"),
        F.count(F.when(F.col("source") == DSIR_TARGET_SOURCE, 1)).alias("tot_p"),
    )
    raw = feats.groupBy("b").agg(F.count("*").alias("c_q"))
    tgt = (
        feats.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("b")
        .agg(F.count("*").alias("c_p"))
    )
    ratios = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            lm._lp_micro(
                (F.coalesce(F.col("c_p"), F.lit(0)) + F.lit(1))
                * (F.col("tot_q") + F.lit(DSIR_BUCKETS)),
                (F.col("c_q") + F.lit(1))
                * (F.col("tot_p") + F.lit(DSIR_BUCKETS)),
            ).alias("lr_micro"),
        )
    )
    return (
        feats.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("lr_micro").alias("lw_micro"),
        )
    )


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR stage 1 — the per-document importance weight surface
    (hashed-n-gram target/raw log-likelihood ratio, integer
    micro-nats). Positive lw_micro = looks more like the target domain
    than the average of the raw pool."""
    docs = load_table(spark, sf_dir, "documents")
    return _dsir_per_doc(spark, sf_dir).join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    ).select("doc_id", "lang", "source", "n_grams", "lw_micro")


def sample_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR stage 2 — Gumbel top-k importance resampling: keep the K
    documents maximizing lw + Gumbel(0,1) noise, which draws WITHOUT
    replacement from the softmax of the importance weights (the
    paper's sampling scheme). The Gumbel is the deterministic salted
    md5 draw pushed through −ln(−ln(u)) and floor-quantized to integer
    micro-nats, so the selection key is an integer sum and the chosen
    set is engine/partitioning/retry-independent. Top-k via
    TakeOrderedAndProject — no global sort at scale."""
    docs = load_table(spark, sf_dir, "documents")
    draw = tx.sample_hash(F.col("doc_id"), salt="dsir", modulus=_DSIR_GUMBEL_MOD)
    u = (draw.cast("double") + F.lit(0.5)) / F.lit(float(_DSIR_GUMBEL_MOD))
    gum = F.floor(-F.log(-F.log(u)) * F.lit(lm.MICRO)).cast("long")
    return (
        _dsir_per_doc(spark, sf_dir)
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
        .withColumn("key_micro", F.col("lw_micro") + gum)
        .select("doc_id", "lang", "source", "lw_micro", "key_micro")
        .orderBy(F.desc("key_micro"), F.asc("doc_id"))
        .limit(DSIR_KEEP_K)
    )


def _dsir_ctes() -> str:
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64_sql

    gh = md5_hash64_sql("gram")
    return f"""
tokd_dsir AS MATERIALIZED (
  SELECT doc_id, source, {_TOKENS} AS tk FROM documents
),
grams_dsir AS MATERIALIZED (
  SELECT doc_id, source, g.gram
  FROM tokd_dsir, UNNEST(
    tk || CASE WHEN len(tk) >= 2
      THEN list_transform(range(2, len(tk) + 1), i -> tk[i-1] || ' ' || tk[i])
      ELSE []::VARCHAR[] END
  ) AS g(gram)
),
feats_dsir AS MATERIALIZED (
  SELECT doc_id, source, ({gh}) % {DSIR_BUCKETS} AS b FROM grams_dsir
),
totals_dsir AS (
  SELECT count(*) AS tot_q,
         count(*) FILTER (WHERE source = '{DSIR_TARGET_SOURCE}') AS tot_p
  FROM feats_dsir
),
raw_dsir AS (SELECT b, count(*) AS c_q FROM feats_dsir GROUP BY b),
tgt_dsir AS (
  SELECT b, count(*) AS c_p FROM feats_dsir
  WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b
),
ratios_dsir AS MATERIALIZED (
  SELECT r.b,
         CAST(floor(ln(((coalesce(t.c_p, 0) + 1) * (s.tot_q + {DSIR_BUCKETS})) /
                       ((r.c_q + 1) * (s.tot_p + {DSIR_BUCKETS}))) * {lm.MICRO}) AS BIGINT)
           AS lr_micro
  FROM raw_dsir r LEFT JOIN tgt_dsir t USING (b) CROSS JOIN totals_dsir s
),
per_doc_dsir AS MATERIALIZED (
  SELECT f.doc_id, count(*) AS n_grams, CAST(sum(r.lr_micro) AS BIGINT) AS lw_micro
  FROM feats_dsir f JOIN ratios_dsir r USING (b) GROUP BY f.doc_id
)
"""


_DSIR_WEIGHTS_SQL = f"""
WITH {_dsir_ctes()}
SELECT p.doc_id, d.lang, d.source, p.n_grams, p.lw_micro
FROM per_doc_dsir p JOIN documents d USING (doc_id)
"""

def _dsir_resample_sql() -> str:
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64_sql

    # Mirror of tx.sample_hash(doc_id, salt="dsir", modulus=2^40):
    # the salted md5 draw, pushed through the Gumbel transform with the
    # same single-division shape as the Spark side.
    h = md5_hash64_sql("'dsir:' || CAST(doc_id AS VARCHAR)")
    u = (
        f"((({h}) % {_DSIR_GUMBEL_MOD})"
        f" + 0.5) / {float(_DSIR_GUMBEL_MOD)}"
    )
    return f"""
WITH {_dsir_ctes()}
SELECT p.doc_id, d.lang, d.source, p.lw_micro,
       p.lw_micro + CAST(floor(-ln(-ln({u})) * {lm.MICRO}) AS BIGINT) AS key_micro
FROM per_doc_dsir p JOIN documents d USING (doc_id)
ORDER BY key_micro DESC, doc_id ASC LIMIT {DSIR_KEEP_K}
"""


register("dsir_importance_weights", dsir_importance_weights, _DSIR_WEIGHTS_SQL)
register("sample_dsir_resample", sample_dsir_resample, _dsir_resample_sql())
