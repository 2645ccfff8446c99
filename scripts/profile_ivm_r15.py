"""Round-15 IVM A/B profiler: same SF-1 workload as bench.py's IVM row,
alternating SPARK_GRAFT_IVM_SPLIT between runs in ONE JVM (interleaved
A/B — both arms see the same session/cache/machine state drift).

Usage: python scripts/profile_ivm_r15.py [scale] [pairs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.session import get_spark
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table
from query_processing_over_streaming_data_using_flink_spark.streaming.changelog import (
    build_changelog,
)
from query_processing_over_streaming_data_using_flink_spark.streaming.ivm import (
    run_streaming_q3,
)


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_ivm_r15")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="graft_ivmprof15_")
    off = 100_000_000
    rep = F.explode(F.array(*[F.lit(i) for i in range(scale)])).alias("_rep")

    def replicate(name: str, key_cols: list[str]) -> None:
        df = load_table(spark, sf_dir, name).select("*", rep)
        for k in key_cols:
            df = df.withColumn(k, F.col(k) + F.col("_rep").cast("long") * off)
        df.drop("_rep").write.parquet(os.path.join(tmp, f"{name}.parquet"))

    t0 = time.time()
    replicate("customer", ["c_custkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey"])
    print(f"table_gen {round(time.time() - t0, 3)}s", flush=True)

    n1 = sum(
        load_table(spark, tmp, t).count() for t in ("customer", "orders", "lineitem")
    )
    staged = os.path.join(tmp, "changelog")
    t0 = time.time()
    build_changelog(spark, tmp, window=(n1 * 2) // 3, pin=False).write.parquet(staged)
    print(f"changelog_gen {round(time.time() - t0, 3)}s events={n1*2}", flush=True)

    nfiles = len([f for f in os.listdir(staged) if f.endswith(".parquet")])
    results: dict[str, list[float]] = {"split": [], "unified": []}
    attempt = 0
    # One DISCARDED warmup run per arm first: the first SF-1 IVM run in
    # a fresh JVM pays 2-3x of codegen/scheduler/page-cache warm-in,
    # which otherwise lands entirely on whichever arm goes first.
    for _pair in range(-1, pairs):
        for arm in ("split", "unified"):
            os.environ["SPARK_GRAFT_IVM_SPLIT"] = "1" if arm == "split" else "0"
            state_dir = os.path.join(tmp, f"state{attempt}")
            attempt += 1
            epochs: list[dict] = []

            def on_progress(epoch_id, _top, stats) -> None:
                epochs.append(stats)

            try:
                os.sync()
            except AttributeError:
                pass
            t0 = time.time()
            run_streaming_q3(
                spark,
                staged,
                state_dir,
                files_per_trigger=max(1, nfiles // 4),
                broadcast_threshold_bytes=1 << 30,
                on_progress=on_progress,
            )
            wall = round(time.time() - t0, 3)
            if _pair >= 0:
                results[arm].append(wall)
            phase_tot: dict[str, float] = {}
            for e in epochs:
                for k, v in (e.get("phase_sec") or {}).items():
                    phase_tot[k] = round(phase_tot.get(k, 0.0) + v, 3)
            print(
                json.dumps({"arm": arm, "wall": wall, "phase_totals": phase_tot}),
                flush=True,
            )
    os.environ.pop("SPARK_GRAFT_IVM_SPLIT", None)
    print(
        json.dumps(
            {
                "summary": {
                    a: {"runs": rs, "min": min(rs)} for a, rs in results.items()
                }
            }
        ),
        flush=True,
    )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
