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


def score_nodes(
    nodes: DataFrame,
    corpus_freq: DataFrame,
    num_docs: int,
    count_col: str = "count",
) -> DataFrame:
    """scoreNodes() — tf-idf relevance of gathered graph nodes
    (solrj/src/java/org/apache/solr/client/solrj/io/stream/ScoreNodesStream.java:241):

        nodeScore = (ln(termFreq) + 1) * (ln((numDocs+1)/(docFreq+1)) + 1)

    `nodes`: (node, <count_col>) — traversal frequency (the stream's
    count(*) field). `corpus_freq`: (node, df) — global frequency of the
    node, the docFreq the reference fetches from the index's terms
    component. The df table is vocabulary-sized -> broadcast; no
    full-corpus shuffle at query time."""
    return (
        nodes.join(F.broadcast(corpus_freq), "node", "left")
        .select(
            "node",
            F.col(count_col).cast("long").alias("termFreq"),
            F.coalesce(F.col("df"), F.lit(0)).cast("long").alias("docFreq"),
            F.round(
                (F.log(F.col(count_col).cast("double")) + 1.0)
                * (
                    F.log(
                        (F.lit(float(num_docs)) + 1.0)
                        / (F.coalesce(F.col("df"), F.lit(0)).cast("double") + 1.0)
                    )
                    + 1.0
                ),
                4,
            ).alias("nodeScore"),
        )
        .orderBy(F.desc("nodeScore"), "node")
    )


def bfs_shortest_path(
    edges: DataFrame, src: int, max_hops: int = 6
) -> DataFrame:
    """(node, dist) — minimum #edges from `src` along directed (src, dst),
    up to max_hops. dist is deterministic (BFS level)."""
    seeds = edges.sparkSession.createDataFrame([(src,)], "node long")
    return gather_nodes(edges, seeds, max_hops).withColumnRenamed("hop", "dist")
