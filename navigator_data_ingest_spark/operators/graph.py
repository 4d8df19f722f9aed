"""Iterative graph analytics on DataFrames: fixed-iteration PageRank.

Complements the dedup module's connected components (large-star /
small-star) with the other canonical iterative-graph primitive. The
graph is the part--supplier bipartite graph from lineitem (distinct
(l_partkey, l_suppkey) edges — supply-chain centrality); node ids are
namespaced strings so the two key spaces can share one node column.

Scale shape per iteration: one join of the directed-edge table against
the current rank vector on ``src`` (both sides partitioned by src —
co-partitioned after the first shuffle), one aggregation shuffle on
``dst``. Degrees and the node count are computed once; the node count
reaches the expression via a broadcast one-row crossJoin, NOT a
driver-side collect, so the whole operator remains one lazy plan.
Iterations are unrolled (KMEANS-style determinism) with a
localCheckpoint per round to keep the shared edge subtree from
re-evaluating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_data_ingest_spark.sources.tables import load_table

DAMPING = 0.85
PR_ITERS = 2


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("p"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # undirected: each edge contributes both directions
    ed = edges.select(F.col("p").alias("src"), F.col("s").alias("dst")).union(
        edges.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    )
    deg = ed.groupBy("src").agg(F.count("*").cast("double").alias("d"))
    ntot = deg.agg(F.count("*").cast("double").alias("n"))

    ranks = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(ntot))
        .select("node", (F.lit(1.0) / F.col("n")).alias("r"))
    )
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", (F.col("r") / F.col("d")).alias("c"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("m"))
            .crossJoin(F.broadcast(ntot))
            .select(
                F.col("dst").alias("node"),
                (F.lit(1.0 - DAMPING) / F.col("n") + F.lit(DAMPING) * F.col("m")).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.crossJoin(F.broadcast(ntot))
        # report rank relative to uniform (r * N, ~1.0 scale) so the
        # 6-decimal round keeps meaningful precision at any graph size
        .select("node", F.round(F.col("r") * F.col("n"), 6).alias("rel_rank"))
        .orderBy("node")
    )


def graph_pagerank_sql() -> str:
    d = DAMPING
    return f"""
    WITH e AS (
        SELECT DISTINCT 'p:' || l_partkey AS p, 's:' || l_suppkey AS s
        FROM lineitem
    ),
    ed AS (
        SELECT p AS src, s AS dst FROM e
        UNION ALL
        SELECT s AS src, p AS dst FROM e
    ),
    deg AS (SELECT src, count(*)::double AS d FROM ed GROUP BY src),
    n AS (SELECT count(*)::double AS n FROM deg),
    r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM n) AS r FROM deg),
    r1 AS (
        SELECT ed.dst AS node,
               {1.0 - d} / (SELECT n FROM n) + {d} * sum(r0.r / deg.d) AS r
        FROM ed
        JOIN r0 ON ed.src = r0.node
        JOIN deg ON ed.src = deg.src
        GROUP BY ed.dst
    ),
    r2 AS (
        SELECT ed.dst AS node,
               {1.0 - d} / (SELECT n FROM n) + {d} * sum(r1.r / deg.d) AS r
        FROM ed
        JOIN r1 ON ed.src = r1.node
        JOIN deg ON ed.src = deg.src
        GROUP BY ed.dst
    )
    SELECT node, round(r * (SELECT n FROM n), 6) AS rel_rank
    FROM r2
    ORDER BY node
    """


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part—supplier bipartite graph: how
    many parts have k distinct suppliers. The two-level aggregation
    (edge dedup -> per-node degree -> per-degree count) is the standard
    graph-profiling query; both shuffles are on shrinking keys
    (edges -> nodes -> degree values), so the result is metadata-sized
    long before the driver sees it.
    """
    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    deg = edges.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("degree")
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("degree")
    )
