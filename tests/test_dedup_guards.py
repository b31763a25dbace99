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
