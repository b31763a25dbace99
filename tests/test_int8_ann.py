"""int8 scalar quantization for the ANN path: exactness of the
quantization contract + recall of the two-phase rescore search."""

import math

from pyspark.sql import functions as F  # noqa: F401

from solr_spark.operators import similarity as SIM


def _emb(spark, n=200, dim=8):
    rows = []
    for i in range(n):
        # deterministic pseudo-vectors spread over the sphere
        v = [math.sin(0.7 * i + 1.3 * d) for d in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_quantize_contract(spark):
    q = SIM.quantize_int8(_emb(spark, 20)).collect()
    for r in q:
        assert all(-127 <= x <= 127 for x in r["q"])
        assert r["q_scale"] > 0
        # max|q| must hit 127 (symmetric scale is tight) unless the
        # vector is all-zero
        assert max(abs(x) for x in r["q"]) == 127


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = SIM.quantize_int8(df).collect()[0]
    assert list(r["q"]) == [0, 0, 0] and r["q_scale"] == 1.0


def test_int8_rescored_equals_exact_topk(spark):
    emb = _emb(spark)
    qv = [math.cos(0.3 * d) for d in range(8)]
    rec = SIM.int8_recall_at_k(emb, qv, k=10, rescore=4).collect()[0]
    assert rec["recall"] == 1.0, rec


def test_int8_approx_close_without_rescore(spark):
    emb = _emb(spark)
    qv = [math.cos(0.3 * d) for d in range(8)]
    exact = {
        r["vec_id"] for r in SIM.cosine_topk(emb, qv, k=10).collect()
    }
    qemb = SIM.quantize_int8(emb)
    approx = {
        r["vec_id"]
        for r in SIM.cosine_topk_int8(qemb, qv, k=10, emb=None).collect()
    }
    # raw int8 ranking is allowed small slips, not collapse
    assert len(exact & approx) >= 7


def test_int8_sim_error_bounded(spark):
    """Each approximate sim must sit within the quantization error
    bound of the exact sim (|err| <= dim * scale_d * scale_q / norms,
    loosely bounded here by 2/127 per unit-normalized term)."""
    emb = _emb(spark, 50)
    qv = [math.cos(0.3 * d) for d in range(8)]
    qemb = SIM.quantize_int8(emb)
    approx = {
        r["vec_id"]: r["sim"]
        for r in SIM.cosine_topk_int8(qemb, qv, k=50, emb=None).collect()
    }
    exact = {
        r["vec_id"]: r["sim"]
        for r in SIM.cosine_topk(emb, qv, k=50).collect()
    }
    for vid, s in exact.items():
        assert abs(approx[vid] - s) < 0.05, (vid, approx[vid], s)


# --------------------------------------------------- PCA compression


def test_pca_components_orthonormal(spark):
    emb = _emb(spark, 100, dim=8)
    comps = SIM.pca_fit(emb, 4)
    assert len(comps) == 4 and all(len(c) == 8 for c in comps)
    for i in range(4):
        ni = math.sqrt(sum(x * x for x in comps[i]))
        assert abs(ni - 1.0) < 1e-6
        # sign normalization: pivot coordinate positive
        piv = max(range(8), key=lambda j: abs(comps[i][j]))
        assert comps[i][piv] > 0
        for j in range(i + 1, 4):
            d = sum(a * b for a, b in zip(comps[i], comps[j]))
            assert abs(d) < 1e-6


def test_pca_full_rank_preserves_distances(spark):
    """Projecting onto ALL components is an isometry up to the mean
    shift — cosine top-k of CENTERED data must be preserved; here we
    check pairwise distances instead (rotation-invariant)."""
    emb = _emb(spark, 60, dim=6)
    comps = SIM.pca_fit(emb, 6)
    proj = {r["vec_id"]: list(r["embedding"])
            for r in SIM.pca_project(emb, comps).collect()}
    orig = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for a, b in [(0, 1), (5, 17), (30, 59)]:
        d0 = math.sqrt(sum((x - y) ** 2 for x, y in zip(orig[a], orig[b])))
        d1 = math.sqrt(sum((x - y) ** 2 for x, y in zip(proj[a], proj[b])))
        assert abs(d0 - d1) < 1e-6


def test_pca_recall_reasonable(spark):
    emb = _emb(spark, 200, dim=8)
    qv = [math.cos(0.3 * d) for d in range(8)]
    rec = SIM.pca_recall_at_k(emb, qv, k=10, n_components=6).collect()[0]
    assert rec["recall"] >= 0.6, rec
