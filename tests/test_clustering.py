"""ClusteringComponent analogue: page-sized k-means over tf-idf term
vectors with centroid-top-feature labels."""

import pytest

from solr_spark.operators.clustering import cluster_results


def _page(spark):
    rows = []
    for i in range(8):
        rows.append((i, "spark hash join shuffle join hash broadcast"))
    for i in range(8, 16):
        rows.append((i, "python pandas arrow batch pandas numpy frame"))
    for i in range(16, 20):
        rows.append((i, "window frame rows aggregate rank dense lag"))
    return spark.createDataFrame(rows, "docid long, text string")


def test_clusters_separate_topics(spark):
    out = cluster_results(
        _page(spark), n_clusters=3, min_df=0.01, max_df=0.9
    ).collect()
    assert sum(r["size"] for r in out) == 20
    by_size = sorted(out, key=lambda r: -r["size"])
    # the two 8-doc topics form the two largest clusters
    assert by_size[0]["size"] == 8 and by_size[1]["size"] == 8
    all_labels = {lb for r in out for lb in r["labels"]}
    assert all_labels & {"hash", "join", "shuffle", "spark", "broadcast"}
    assert all_labels & {"pandas", "arrow", "python", "numpy", "batch"}


def test_deterministic(spark):
    a = cluster_results(_page(spark), 3, min_df=0.01, max_df=0.9).collect()
    b = cluster_results(_page(spark), 3, min_df=0.01, max_df=0.9).collect()
    assert a == b


def test_empty_page(spark):
    empty = spark.createDataFrame([], "docid long, text string")
    assert cluster_results(empty).count() == 0


def test_fewer_docs_than_clusters(spark):
    two = spark.createDataFrame(
        [(1, "spark join"), (2, "pandas arrow")], "docid long, text string"
    )
    out = cluster_results(two, n_clusters=5, min_df=0.0, max_df=1.0).collect()
    assert sum(r["size"] for r in out) == 2
