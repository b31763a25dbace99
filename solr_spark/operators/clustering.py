"""Search-result clustering (the clustering search component).

Role of the reference's ClusteringComponent
(solr/modules/clustering/src/java/org/apache/solr/handler/clustering/
ClusteringComponent.java:1 — runs a Carrot2 algorithm over ONE result
page's snippets and labels the clusters).

Spark-first shape: the result page is small by construction (rows=k of
a top-k search), so clustering is a page-sized problem just like the
reference's — the heavy part, scoring 100 TB down to the page, is the
BM25 engine. The page's term vectors build with the same
sqrt(tf)·(ln((n+1)/(df+1))+1) weighting the math-expression
termVectors() uses, k-means++ (seeded, deterministic) assigns clusters,
and each cluster is labeled by its centroid's top features — Lingo-ish
labels without the Carrot2 dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokens_col


def cluster_results(
    docs: DataFrame,
    n_clusters: int = 3,
    id_col: str = "docid",
    text_col: str = "text",
    n_labels: int = 3,
    min_df: float = 0.05,
    max_df: float = 0.6,
    seed: int = 0,
) -> DataFrame:
    """Cluster a (small) result page. Returns one row per cluster:
    (cluster, size, labels array<string>, docids array<long>).

    `docs` is a top-k result page joined to its text — page-sized input
    is the contract (like the reference component); the function
    collects it onto the driver deliberately."""
    import numpy as np

    from solr_spark.functions import statseval as SE

    rows = (
        docs.select(
            F.col(id_col).cast("long").alias("_id"),
            tokens_col(text_col).alias("_toks"),
        )
        .collect()
    )
    if not rows:
        return docs.sparkSession.createDataFrame(
            [],
            "cluster int, size long, labels array<string>,"
            " docids array<long>",
        )
    n = len(rows)
    dfreq: dict = {}
    for r in rows:
        for w in set(r["_toks"]):
            dfreq[w] = dfreq.get(w, 0) + 1
    lo, hi = n * min_df, n * max_df
    feats = sorted(w for w, c in dfreq.items() if lo <= c <= hi)
    fidx = {w: i for i, w in enumerate(feats)}
    mat = np.zeros((n, len(feats)))
    for i, r in enumerate(rows):
        tf: dict = {}
        for w in r["_toks"]:
            if w in fidx:
                tf[w] = tf.get(w, 0) + 1
        for w, c in tf.items():
            mat[i, fidx[w]] = np.sqrt(c) * (np.log((n + 1) / (dfreq[w] + 1)) + 1)
    # length-normalize so k-means clusters by direction (cosine-ish)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    k = min(n_clusters, n)
    cent, assign = SE.kmeans(mat, k, seed=seed)
    out = []
    for c in range(k):
        members = [rows[i]["_id"] for i in range(n) if assign[i] == c]
        if not members:
            continue
        top = np.argsort(-cent[c], kind="stable")[:n_labels]
        labels = [feats[j] for j in top if cent[c][j] > 0]
        out.append((c, len(members), labels, sorted(members)))
    spark = docs.sparkSession
    return spark.createDataFrame(
        out,
        "cluster int, size long, labels array<string>, docids array<long>",
    ).orderBy(F.desc("size"), "cluster")
