"""Interleaved A/B of registered queries under an env toggle, ONE JVM.

For each query: warmup run (discarded), then `pairs` alternating
(on, off) timed runs through the noop sink, cache cleared before every
run — bench.py's methodology with the toggle interleaved so both arms
see the same session drift.

Usage:
  python scripts/ab_sweep.py <sf_dir> <name1,name2,...> <ENV_VAR> [pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    env_var = sys.argv[3]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from query_processing_over_streaming_data_using_flink_spark import registry
    from query_processing_over_streaming_data_using_flink_spark.session import get_spark

    spark = get_spark("ab_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    for n in names:
        fn = queries[n]

        def run_once() -> float:
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription(f"ab warmup: {n}")
        os.environ[env_var] = "1"
        run_once()  # discarded warmup
        res = {"1": [], "0": []}
        for _ in range(pairs):
            for arm in ("1", "0"):
                os.environ[env_var] = arm
                spark.sparkContext.setJobDescription(f"ab {env_var}={arm}: {n}")
                res[arm].append(run_once())
        os.environ.pop(env_var, None)
        print(
            json.dumps(
                {
                    "query": n,
                    "env": env_var,
                    "on": {"runs": res["1"], "min": min(res["1"])},
                    "off": {"runs": res["0"], "min": min(res["0"])},
                    "ratio_min": round(min(res["1"]) / min(res["0"]), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
