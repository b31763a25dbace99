"""Graph traversal operators — frontier expansion and BFS shortest path.

Reference surface:
- gatherNodes()/nodes(): breadth-first expansion from seed nodes along
  from->to edge fields, aggregating per frontier
  (solrj/src/java/org/apache/solr/client/solrj/io/graph/GatherNodesStream.java:62)
- shortestPath(): BFS with a visited set
  (solrj/src/java/org/apache/solr/client/solrj/io/graph/ShortestPathStream.java:59)
- {!graph} query: search/join/GraphQParserPlugin.java:27

Spark shape: an iterative DataFrame loop — join frontier to edges,
anti-join the visited set, persist per level. Each hop is one shuffle;
at scale the frontier/visited sets stay distributed (no driver
materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_nodes(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int,
) -> DataFrame:
    """Expand `hops` times along edges (src, dst) from seed nodes (node).

    Returns (node, hop) — each node tagged with the FIRST hop at which it
    was reached (seeds are hop 0).
    """
    e = edges.select(F.col("src").alias("node"), F.col("dst").alias("_next"))
    reached = seeds.select(F.col("node").cast("long").alias("node")).distinct().withColumn(
        "hop", F.lit(0)
    )
    frontier = reached.select("node")
    for h in range(1, hops + 1):
        nxt = (
            frontier.join(e, "node")
            .select(F.col("_next").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .persist()
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt.withColumn("hop", F.lit(h)))
        frontier = nxt.select("node")
    return reached.orderBy("hop", "node")


def bfs_shortest_path(
    edges: DataFrame, src: int, max_hops: int = 6
) -> DataFrame:
    """(node, dist) — minimum #edges from `src` along directed (src, dst),
    up to max_hops. dist is deterministic (BFS level)."""
    seeds = edges.sparkSession.createDataFrame([(src,)], "node long")
    return gather_nodes(edges, seeds, max_hops).withColumnRenamed("hop", "dist")
