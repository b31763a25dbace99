"""Graph traversal: BFS levels on a known graph + DuckDB recursive oracle."""

import duckdb

from solr_spark.operators.graph import bfs_shortest_path, gather_nodes

EDGES = [
    (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 1), (7, 8),
]


def test_bfs_levels(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r.node, r.dist) for r in bfs_shortest_path(edges, 1, max_hops=6).collect()}
    assert got == {(1, 0), (2, 1), (3, 1), (4, 2), (5, 3), (6, 4)}


def test_gather_nodes_disconnected(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(7,)], "node long")
    got = {(r.node, r.hop) for r in gather_nodes(edges, seeds, 3).collect()}
    assert got == {(7, 0), (8, 1)}


def test_bfs_matches_duckdb_recursive(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = sorted((r.node, r.dist) for r in bfs_shortest_path(edges, 1, 6).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", EDGES)
    ref = con.execute(
        """
        WITH RECURSIVE walk(node, dist) AS (
          SELECT 1::BIGINT, 0
          UNION ALL
          SELECT e.dst, walk.dist + 1 FROM walk JOIN e ON e.src = walk.node
          WHERE walk.dist < 6
        )
        SELECT node, min(dist)::INT AS dist FROM walk GROUP BY node ORDER BY node
        """
    ).fetchall()
    assert got == [(n, d) for n, d in ref]
