"""Round-15 KN-family decomposition: is the wall-clock the training
aggregates or the five scoring joins? (r14 verdict item #5 asks for a
written measurement either way.)

Phases, min-of-N each in one JVM (cache cleared between reps):
  full    — text_perplexity_filter_kn end-to-end (the baseline)
  train   — the six model tables persisted + forced (t3 first, then
            the rollups, which read cached t3)
  score   — kn_perplexity over the PRE-materialized model tables
            (the five broadcast joins + per-position arithmetic alone)

Usage: python scripts/profile_kn_r15.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from query_processing_over_streaming_data_using_flink_spark.operators import lm
    from query_processing_over_streaming_data_using_flink_spark.plans.suite_quality import (
        PPL_TRAIN_SOURCE,
    )
    from query_processing_over_streaming_data_using_flink_spark.session import get_spark
    from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

    spark = get_spark("profile_kn_r15")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    docs = load_table(spark, sf_dir, "documents")
    train_docs = docs.filter(F.col("source") == PPL_TRAIN_SOURCE)

    def run_full() -> float:
        t0 = time.time()
        model = lm.kn_trigram_train(train_docs)
        noop(lm.kn_perplexity(docs, *model))
        return round(time.time() - t0, 3)

    def run_split() -> tuple[float, float]:
        t0 = time.time()
        t3, t2, b2, b2c, u1, stats = (
            df.persist() for df in lm.kn_trigram_train(train_docs)
        )
        for df in (t3, t2, b2, b2c, u1, stats):
            noop(df)
        train_sec = round(time.time() - t0, 3)
        t0 = time.time()
        noop(lm.kn_perplexity(docs, t3, t2, b2, b2c, u1, stats))
        return train_sec, round(time.time() - t0, 3)

    # warmup (discarded)
    run_full()
    fulls, trains, scores = [], [], []
    for _ in range(reps):
        spark.catalog.clearCache()
        fulls.append(run_full())
        spark.catalog.clearCache()
        tr, sc = run_split()
        trains.append(tr)
        scores.append(sc)
    print(
        json.dumps(
            {
                "query": "text_perplexity_filter_kn decomposition",
                "full": {"runs": fulls, "min": min(fulls)},
                "train_forced": {"runs": trains, "min": min(trains)},
                "score_on_cached_model": {"runs": scores, "min": min(scores)},
            }
        )
    )


if __name__ == "__main__":
    main()
