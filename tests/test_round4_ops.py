"""Round-4 additions: persisted LSH ANN index, analyzer round-4 stages
(Porter stemmer, multi-token synonym graph, WDGF catenation), new
update processors, value-source tranche 4."""

import hashlib
import struct

import pytest
from pyspark.sql import functions as F


def _vec(i, dim=8):
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{i}:{d}".encode()).digest()
        out.append(struct.unpack("<i", h[:4])[0] / 2**31)
    return out


def test_lsh_build_search_persisted(spark, tmp_path):
    """Persisted multi-table hyperplane LSH: build once (partitioned by
    tbl/bucket), search from the parquet alone in a fresh session; the
    probed scan must carry the (tbl, bucket) partition filters, and
    full-probe search must equal exact brute force."""
    from solr_spark.operators.similarity import cosine_topk, lsh_build, lsh_search

    emb = spark.createDataFrame(
        [(i, _vec(i)) for i in range(400)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "lsh")
    lsh_build(emb, path, n_planes=4, n_tables=4)
    q = _vec(123)
    s2 = spark.newSession()
    # probing every bucket of every table == exact brute force
    full = [
        r["vec_id"]
        for r in lsh_search(s2, path, q, k=5, probe_hamming=4).collect()
    ]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assert full == exact and exact[0] == 123
    # 1-bit probes: the query's own bucket is always probed, so the
    # true nearest (the query vector itself) is always found
    near = [
        r["vec_id"] for r in lsh_search(s2, path, q, k=5, probe_hamming=1).collect()
    ]
    assert near[0] == 123
    # partition pruning: the scan plan carries tbl/bucket filters
    plan = (
        lsh_search(s2, path, q, k=5, probe_hamming=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "bucket" in plan and "tbl" in plan


def test_lsh_search_dim_mismatch(spark, tmp_path):
    from solr_spark.operators.similarity import lsh_build, lsh_search

    emb = spark.createDataFrame(
        [(i, _vec(i, 6)) for i in range(50)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "lsh6")
    lsh_build(emb, path, n_planes=3, n_tables=2)
    with pytest.raises(ValueError, match="dim"):
        lsh_search(spark, path, _vec(0, 8), k=3)


def test_lsh_persisted_matches_inline(spark, tmp_path):
    """The persisted index and the inline cosine_topk_lsh use identical
    plane seeds, so identical (planes, tables, probes) give identical
    candidate sets → identical results."""
    from solr_spark.operators.similarity import (
        cosine_topk_lsh,
        lsh_build,
        lsh_search,
    )

    emb = spark.createDataFrame(
        [(i, _vec(i)) for i in range(300)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "lshp")
    lsh_build(emb, path, n_planes=4, n_tables=3, seed=42)
    q = _vec(7)
    a = [
        (r["vec_id"], r["sim"])
        for r in lsh_search(spark, path, q, k=8, probe_hamming=1).collect()
    ]
    b = [
        (r["vec_id"], r["sim"])
        for r in cosine_topk_lsh(
            emb, q, k=8, n_planes=4, n_tables=3, seed=42, probe_hamming=1
        ).collect()
    ]
    assert a == b
