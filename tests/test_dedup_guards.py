"""Scale guards: bounded pair counts under pathological duplication."""

from pyspark.sql import functions as F

from solr_spark.operators.dedup import lsh_candidate_pairs, ngram_jaccard_pairs


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "docid long, toks array<string>")


def test_lsh_giant_band_emits_star_not_quadratic(spark):
    """100 identical docs share every band (> MAX_BAND=64): the operator
    must emit a linear hub-spoke set (99 pairs), not 100*99/2 = 4950,
    while keeping the cluster connected through the hub."""
    rows = [(i, ["alpha", "beta", "gamma", "delta"]) for i in range(100)]
    # a small genuine near-dup pair that must still surface all-pairs
    rows += [(200, ["zeta", "eta", "theta", "iota"]),
             (201, ["zeta", "eta", "theta", "iota"])]
    pairs = lsh_candidate_pairs(_tok_df(spark, rows)).collect()
    giant = [(r.a, r.b) for r in pairs if r.b < 200]
    assert len(giant) == 99
    assert all(a == 0 for a, _ in giant)  # hub = min docid
    assert (200, 201) in {(r.a, r.b) for r in pairs}


def test_ngram_jaccard_common_shingle_bounded(spark):
    """A boilerplate shingle planted in every doc may not produce the
    all-pairs explosion: with the df filter the join only meets on the
    rare shingles, so unrelated docs never pair up."""
    boiler = ["copy", "right", "notice"]
    rows = [
        (i, boiler + [f"uniq{i}a", f"uniq{i}b", f"uniq{i}c", f"uniq{i}d"])
        for i in range(150)
    ]
    # one true near-dup pair sharing rare shingles
    rows += [(300, boiler + ["shared", "rare", "content", "here"]),
             (301, boiler + ["shared", "rare", "content", "there"])]
    got = ngram_jaccard_pairs(_tok_df(spark, rows), n=3, top=50, max_df=100)
    pairs = {(r.a, r.b) for r in got.collect()}
    assert (300, 301) in pairs
    # the 150 boilerplate-only docs pair with nobody
    assert all(a >= 300 for a, _ in pairs), sorted(pairs)[:5]


def test_ngram_jaccard_unfiltered_still_available(spark):
    """max_df is a parameter: a permissive setting restores full pairs."""
    rows = [(i, ["a", "b", "c", "d"]) for i in range(4)]
    got = ngram_jaccard_pairs(_tok_df(spark, rows), n=3, top=50, max_df=10**9)
    assert got.count() == 6  # all 4C2 pairs, jaccard 1.0


def test_embedding_lsh_dense_bucket_emits_star_not_quadratic(spark):
    """A dense near-dup cluster landing in ONE hyperplane bucket (100
    identical vectors > max_bucket) must produce hub-spoke pairs (99,
    hub = min id), not 100*99/2 — the embedding twin of the MAX_BAND
    guard (round-2 VERDICT "What's wrong" #1); an under-cap genuine
    near-dup pair must still surface all-pairs."""
    from solr_spark.operators.dedup import embedding_near_dups_lsh

    dim = 8
    dense = [(i, [1.0, 0.5, -0.25, 0.75, -0.5, 0.3, 0.9, -0.1])
             for i in range(100)]
    # a small separate near-identical pair (must pair directly, a<->b)
    other = [(200, [-1.0, 0.8, 0.6, -0.7, 0.2, -0.9, 0.4, 0.5]),
             (201, [-1.0, 0.8, 0.6, -0.7, 0.2, -0.9, 0.4, 0.51])]
    emb = spark.createDataFrame(
        dense + other, "vec_id long, embedding array<double>"
    )
    got = embedding_near_dups_lsh(
        emb, threshold=0.9, n_planes=4, n_tables=2, dim=dim
    )
    pairs = {(r.a, r.b) for r in got.collect()}
    giant = {(a, b) for a, b in pairs if b < 200}
    assert len(giant) == 99, len(giant)
    assert all(a == 0 for a, _ in giant)  # hub = min id
    assert (200, 201) in pairs
    # permissive cap restores all-pairs for the dense cluster
    full = embedding_near_dups_lsh(
        emb, threshold=0.9, n_planes=4, n_tables=1, dim=dim,
        max_bucket=10**6,
    )
    assert sum(1 for r in full.collect() if r.b < 200) == 100 * 99 // 2


def test_near_dup_clusters_transitive(spark):
    """Min-label propagation: chains merge transitively, components get
    the min docid as label, disjoint components stay apart."""
    from solr_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "a long, b long",
    )
    got = {r.docid: r.cluster for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}
    # a path of diameter 7 needs multiple propagation rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30, 37)], "a long, b long"
    )
    got2 = {r.docid: r.cluster for r in near_dup_clusters(chain).collect()}
    assert set(got2.values()) == {30} and len(got2) == 8
