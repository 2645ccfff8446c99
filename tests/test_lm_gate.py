"""Stream==batch equivalence for the streaming LM components: the
incrementally-trained bigram model must equal batch training over the
same corpus (including retraction of deleted documents), and the
streaming perplexity gate must emit exactly the batch scores."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators import lm
from query_processing_over_streaming_data_using_flink_spark.streaming.lm_gate import (
    IncrementalBigramLM,
    run_streaming_lm_train,
    run_streaming_ppl_gate,
)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_dir(spark, tmp_path):
    d = str(tmp_path / "docs")
    spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).repartition(
        4
    ).write.parquet(d)
    return d


def _model_rows(model):
    big, ctx, vocab = model
    return (
        {(r["prev"], r["w"]): r["c_pw"] for r in big.collect()},
        {r["prev"]: r["c_p"] for r in ctx.collect()},
        vocab.collect()[0]["v"],
    )


def test_streamed_lm_equals_batch_training(spark, docs_dir, tmp_path):
    pipe = run_streaming_lm_train(
        spark, docs_dir, str(tmp_path / "state"), files_per_trigger=1
    )
    docs = spark.read.parquet(docs_dir)
    batch = lm.bigram_lm_train(docs)
    assert _model_rows(pipe.model()) == _model_rows(batch)
    # and the scores built on the streamed model match batch scores
    streamed = {
        r["doc_id"]: r["ppl"] for r in lm.perplexity(docs, *pipe.model()).collect()
    }
    expect = {r["doc_id"]: r["ppl"] for r in lm.perplexity(docs, *batch).collect()}
    assert streamed == expect


def test_streamed_lm_retracts_deleted_documents(spark):
    """Signed weights: ingesting a doc then its deletion leaves the
    model equal to never having seen it."""
    base = spark.createDataFrame(
        [(0, "the cat sat", "en"), (1, "a dog ran", "en")],
        "doc_id long, text string, lang string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pipe = IncrementalBigramLM(spark, os.path.join(d, "state"))
        pipe.process_batch(base.withColumn("op", F.lit(1)), 1)
        extra = spark.createDataFrame(
            [(2, "zz yy xx", "en")], "doc_id long, text string, lang string"
        )
        pipe.process_batch(extra.withColumn("op", F.lit(1)), 2)
        pipe.process_batch(extra.withColumn("op", F.lit(-1)), 3)
        got = _model_rows(pipe.model())
        expect = _model_rows(lm.bigram_lm_train(base))
        assert got == expect
        # replayed epoch is a no-op
        pipe.process_batch(extra.withColumn("op", F.lit(1)), 3)
        assert _model_rows(pipe.model()) == expect


def test_streaming_gate_equals_batch_scoring(spark, docs_dir, tmp_path):
    docs = spark.read.parquet(docs_dir)
    train = docs.filter(F.col("source") == "src0")
    model = lm.bigram_lm_train(train)
    out = run_streaming_ppl_gate(
        spark,
        docs_dir,
        model,
        str(tmp_path / "gated"),
        keep_max=35.0,
        files_per_trigger=1,
    )
    got = {r["doc_id"]: (r["ppl"], r["keep"]) for r in out.collect()}
    scored = lm.perplexity(docs, *model).withColumn(
        "keep", F.col("ppl") <= F.lit(35.0)
    )
    expect = {r["doc_id"]: (r["ppl"], r["keep"]) for r in scored.collect()}
    assert got == expect
    assert any(v[1] for v in got.values()) and not all(v[1] for v in got.values())


def test_streaming_nb_router_equals_batch_classification(spark, docs_dir, tmp_path):
    from query_processing_over_streaming_data_using_flink_spark.streaming.lm_gate import run_streaming_nb_router

    docs = spark.read.parquet(docs_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    model = lm.nb_train(train, label_col="lang")
    out = run_streaming_nb_router(
        spark, docs_dir, model, str(tmp_path / "routed"), files_per_trigger=1
    )
    got = {r["doc_id"]: r["pred_label"] for r in out.collect()}
    expect = {
        r["doc_id"]: r["pred_label"]
        for r in lm.nb_classify(docs, *model).collect()
    }
    assert got == expect and len(got) == docs.count()


def test_incremental_lm_restarts_from_state(spark, tmp_path):
    """Recreating the pipeline over an existing state dir must resume
    exactly: earlier epochs' counts are recovered from disk, the next
    epoch folds on top, and the final model equals batch training over
    everything ingested."""
    import os

    d1 = spark.createDataFrame(
        [(0, "the cat sat", "en")], "doc_id long, text string, lang string"
    )
    d2 = spark.createDataFrame(
        [(1, "a dog ran", "en")], "doc_id long, text string, lang string"
    )
    state = str(tmp_path / "state")
    pipe = IncrementalBigramLM(spark, state)
    pipe.process_batch(d1, 1)
    del pipe

    resumed = IncrementalBigramLM(spark, state)  # fresh object, same dir
    resumed.process_batch(d2, 2)
    got = _model_rows(resumed.model())
    expect = _model_rows(lm.bigram_lm_train(d1.unionByName(d2)))
    assert got == expect
    # replaying epoch 1 against the resumed pipeline is still a no-op
    resumed.process_batch(d1, 1)
    assert _model_rows(resumed.model()) == expect


def _kn_model_rows(model):
    t3, t2, b2, b2c, u1, stats = model
    srow = stats.collect()[0]
    return (
        {(r["u"], r["v"], r["w"]): r["c3"] for r in t3.collect()},
        {(r["u"], r["v"]): (r["c2"], r["n1p2"]) for r in t2.collect()},
        {(r["v"], r["w"]): r["cont2"] for r in b2.collect()},
        {r["v"]: (r["ctx2"], r["n1p1"]) for r in b2c.collect()},
        {r["w"]: r["cont1"] for r in u1.collect()},
        (srow["bt"], srow["vs"]),
    )


def test_streamed_kn_lm_equals_batch_training(spark, docs_dir, tmp_path):
    """All six KN count tables and the scores built on them must be
    bit-equal between incremental training (one file per micro-batch)
    and lm.kn_trigram_train over the same corpus."""
    pipe = run_streaming_lm_train(
        spark, docs_dir, str(tmp_path / "state"), files_per_trigger=1,
        model_class="kn",
    )
    docs = spark.read.parquet(docs_dir)
    batch = lm.kn_trigram_train(docs)
    assert _kn_model_rows(pipe.model()) == _kn_model_rows(batch)
    streamed = {
        r["doc_id"]: r["ppl"] for r in lm.kn_perplexity(docs, *pipe.model()).collect()
    }
    expect = {r["doc_id"]: r["ppl"] for r in lm.kn_perplexity(docs, *batch).collect()}
    assert streamed == expect


def test_streamed_kn_lm_retracts_deleted_documents(spark):
    """Retraction through the TYPE-count rollups: deleting the only
    document containing a trigram must drop that type from t3 AND from
    every derived continuation count — equal to never having seen it.
    (This is the case a naive additive maintenance of the rollups gets
    wrong: cont2 is a count of distinct nonzero types, so it must be
    re-derived, not decremented.)"""
    from query_processing_over_streaming_data_using_flink_spark.streaming.lm_gate import (
        IncrementalKneserNeyLM,
    )

    base = spark.createDataFrame(
        [(0, "the cat sat", "en"), (1, "a dog ran", "en")],
        "doc_id long, text string, lang string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pipe = IncrementalKneserNeyLM(spark, os.path.join(d, "state"))
        pipe.process_batch(base.withColumn("op", F.lit(1)), 1)
        extra = spark.createDataFrame(
            [(2, "zz yy xx", "en")], "doc_id long, text string, lang string"
        )
        pipe.process_batch(extra.withColumn("op", F.lit(1)), 2)
        pipe.process_batch(extra.withColumn("op", F.lit(-1)), 3)
        got = _kn_model_rows(pipe.model())
        expect = _kn_model_rows(lm.kn_trigram_train(base))
        assert got == expect
        # replayed epoch is a no-op
        pipe.process_batch(extra.withColumn("op", F.lit(1)), 3)
        assert _kn_model_rows(pipe.model()) == expect


def test_streaming_gate_accepts_kn_model(spark, docs_dir, tmp_path):
    """run_streaming_ppl_gate dispatches on model arity: a 6-frame KN
    model streams to exactly the batch KN scores; a wrong arity raises."""
    docs = spark.read.parquet(docs_dir)
    train = docs.filter(F.col("source") == "src0")
    model = lm.kn_trigram_train(train)
    out = run_streaming_ppl_gate(
        spark,
        docs_dir,
        model,
        str(tmp_path / "gated_kn"),
        keep_max=48.0,
        files_per_trigger=1,
    )
    got = {r["doc_id"]: (r["ppl"], r["keep"]) for r in out.collect()}
    scored = lm.kn_perplexity(docs, *model).withColumn(
        "keep", F.col("ppl") <= F.lit(48.0)
    )
    expect = {r["doc_id"]: (r["ppl"], r["keep"]) for r in scored.collect()}
    assert got == expect
    assert any(v[1] for v in got.values()) and not all(v[1] for v in got.values())
    with pytest.raises(ValueError, match="3 .*or 6"):
        run_streaming_ppl_gate(
            spark, docs_dir, model[:4], str(tmp_path / "bad"), keep_max=48.0
        )


def test_streamed_dsir_model_equals_batch(spark, docs_dir, tmp_path):
    """The incrementally-maintained DSIR bucket histograms must equal
    the batch fit, and scoring the corpus against the streamed ratio
    table must reproduce dsir_importance_weights' lw_micro exactly —
    including after a retraction (deleting an ingested doc restores
    the weights to never-having-seen-it)."""
    from query_processing_over_streaming_data_using_flink_spark.functions.scalar import md5_hash64
    from query_processing_over_streaming_data_using_flink_spark.operators import text as tx
    from query_processing_over_streaming_data_using_flink_spark.plans import suite_quality as q
    from query_processing_over_streaming_data_using_flink_spark.streaming.lm_gate import IncrementalDsirModel

    docs = spark.read.parquet(docs_dir)
    pipe = IncrementalDsirModel(spark, str(tmp_path / "state"))
    pipe.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 1)
    pipe.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 2)
    # an ingest-then-retract pair must be a no-op on the model
    extra = spark.createDataFrame(
        [(10**9, "zz yy xx", "en", "srcX", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pipe.process_batch(extra.withColumn("op", F.lit(1)), 3)
    pipe.process_batch(extra.withColumn("op", F.lit(-1)), 4)

    feats = (
        docs.withColumn("tk", tx.tokens(F.col("text")))
        .select("doc_id", "source", F.explode(F.expr(q._dsir_gram_expr())).alias("gram"))
        .select(
            "doc_id",
            "source",
            F.pmod(md5_hash64(F.col("gram")), F.lit(q.DSIR_BUCKETS)).alias("b"),
        )
    )
    batch_hist = {
        r["b"]: (r["c_q"], r["c_p"])
        for r in feats.groupBy("b")
        .agg(
            F.count("*").alias("c_q"),
            F.count(F.when(F.col("source") == q.DSIR_TARGET_SOURCE, 1)).alias("c_p"),
        )
        .collect()
    }
    streamed_hist = {r["b"]: (r["c_q"], r["c_p"]) for r in pipe.counts().collect()}
    assert streamed_hist == batch_hist

    scored = (
        feats.join(F.broadcast(pipe.ratios()), "b")
        .groupBy("doc_id")
        .agg(F.sum("lr_micro").alias("lw_micro"))
    )
    got = {r["doc_id"]: r["lw_micro"] for r in scored.collect()}
    # docs_dir holds exactly the SF_SMOKE documents (repartitioned), so
    # the batch fit over SF_SMOKE is the ground truth for the stream.
    expect = {
        r["doc_id"]: r["lw_micro"]
        for r in q.dsir_importance_weights(spark, SF_SMOKE).collect()
    }
    assert got == expect
