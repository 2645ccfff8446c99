"""Graph-analytics suite — iterative algorithms done Spark-first
(beyond-reference surface; the near-dup connected components in
`suite_llm_data.dedup_clusters_ngram` is the other member).

PageRank is the canonical "needs iteration" workload. The engine runs
it as a FIXED number of dataflow rounds — each round one edge join +
one destination aggregate, exactly the shape GraphX/Pregel lowers to —
with every quantity held in INTEGER micro-units so the whole
computation is deterministic across engines and partitionings and the
DuckDB oracle can replay the same three rounds as unrolled CTEs. At
100 TB the per-round cost is one shuffle on dst; ranks/degrees are
O(nodes) state, never collected to the driver.

Determinism discipline (same as the IVM/ANN families): the only
divisions are IEEE double divisions of exactly-representable integers
(<= ~2e13, far inside the 2^53 mantissa) followed by floor — bit-equal
in both engines; all sums are integer sums (associative)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.registry import register
from query_processing_over_streaming_data_using_flink_spark.sources.catalog import load_table

# Damping d = 0.85 as the exact rational 17/20; ranks in units of
# 10^-12 (integer micro-rank), 3 power-iteration rounds, top-20 out.
PR_Q = 10**12
PR_ROUNDS = 3
PR_TOPK = 20


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct symmetric co-purchase edges: parts appearing in the
    same order. Per-order self-join — bounded by order size, never a
    corpus-wide product."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "o")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph after
    PR_ROUNDS fixed power iterations (damping 17/20, integer
    micro-rank units). Emits (part, degree, rank_q, rank) with
    rank = rank_q / 10^12 — an iterative algorithm whose every round
    is exactly reproducible in the SQL oracle."""
    edges = _edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n_nodes = nodes.agg(F.count("*").alias("n"))

    # r0 = floor(Q / N); base = floor((1-d)·Q / N) = floor(3Q / (20N))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        "deg",
        "n",
        F.floor(F.lit(PR_Q) / F.col("n")).cast("long").alias("r_q"),
    )
    for _ in range(PR_ROUNDS):
        contrib = (
            edges.join(
                ranks.select(F.col("node").alias("src"), "deg", "r_q"), "src"
            )
            .select(
                "dst",
                # floor(17·r / (20·deg)) via exact-double division
                F.floor((F.col("r_q") * 17) / (F.col("deg") * 20.0)).cast("long").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_q"))
        )
        ranks = (
            ranks.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                "deg",
                "n",
                (
                    F.floor(F.lit(3 * PR_Q) / (F.col("n") * 20.0)).cast("long")
                    + F.coalesce(F.col("in_q"), F.lit(0))
                ).alias("r_q"),
            )
        )
    return (
        ranks.select(
            F.col("node").alias("part"),
            F.col("deg").alias("degree"),
            "r_q",
            F.round(F.col("r_q") / float(PR_Q), 8).alias("rank"),
        )
        .orderBy(F.desc("r_q"), F.asc("part"))
        .limit(PR_TOPK)
    )


def _pagerank_sql() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, PR_ROUNDS + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT n.node, n.deg, n.n,
         CAST(floor(3 * {PR_Q} / (n.n * 20.0)) AS BIGINT)
           + coalesce(c.in_q, 0) AS r_q
  FROM {prev} n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(CAST(floor((r.r_q * 17) / (r.deg * 20.0)) AS BIGINT)) AS BIGINT) AS in_q
    FROM edges e JOIN {prev} r ON e.src = r.node
    GROUP BY e.dst
  ) c USING (node)
)"""
        )
        prev = f"r{i}"
    stages = ",\n".join(rounds)
    return f"""
WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
  SELECT node, deg, nn.n, CAST(floor({PR_Q} / nn.n) AS BIGINT) AS r_q
  FROM deg CROSS JOIN nn
),
{stages}
SELECT node AS part, deg AS degree, r_q,
       round(r_q / {float(PR_Q)}, 8) AS rank
FROM {prev}
ORDER BY r_q DESC, part LIMIT {PR_TOPK}
"""


register("graph_pagerank_parts", graph_pagerank_parts, _pagerank_sql())
