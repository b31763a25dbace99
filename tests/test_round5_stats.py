"""Statistical evaluator tranche 7b: distributions, hypothesis tests,
clustering, curve fitting (reference: solrj io/eval *Distribution/
TTest/MannWhitneyU/KolmogorovSmirnov/ChiSquareDataSet/GTestDataSet/
Anova/Kmeans/Dbscan/Knn/PolyFit/OlsRegress/Convolution/FFT evaluators).

The numpy layer is checked against closed-form / textbook values; the
streamexpr integration is checked end-to-end through eval_expr.
"""

import math

import numpy as np
import pytest

from solr_spark.functions import statseval as SE
from solr_spark.plans.streamexpr import eval_expr


# ---------------------------------------------------------- numpy layer


def test_ttest_welch_textbook():
    # classic example: equal-size samples
    a = [30.02, 29.99, 30.11, 29.97, 30.01, 29.99]
    b = [29.89, 29.93, 29.72, 29.98, 30.02, 29.98]
    t, p = SE.ttest(a, b)
    # Welch: t = 1.959, df = 7.03, p ~ 0.0907 (published worked example)
    assert t == pytest.approx(1.959, abs=1e-3)
    assert p == pytest.approx(0.0907, abs=2e-3)


def test_ttest_onesample_and_paired():
    b = [5.1, 4.9, 5.3, 5.0, 4.8, 5.2]
    t, p = SE.ttest_onesample(5.0, b)
    m, sd = np.mean(b), np.std(b, ddof=1)
    assert t == pytest.approx((m - 5.0) / (sd / math.sqrt(6)))
    a = [5.2, 5.0, 5.4, 5.1, 4.9, 5.3]
    t2, p2 = SE.paired_ttest(a, b)
    # differences all +0.1 -> sd 0, t -> inf? no: exactly constant diffs
    # give sd ~ 1e-16; use a varied pair instead
    a = [5.2, 5.1, 5.35, 5.0, 5.0, 5.25]
    t2, p2 = SE.paired_ttest(a, b)
    d = np.array(a) - np.array(b)
    want = d.mean() / (d.std(ddof=1) / math.sqrt(len(d)))
    assert t2 == pytest.approx(float(want))
    assert 0 <= p2 <= 1


def test_mann_whitney_textbook():
    # small worked example with known U
    a = [1, 2, 3, 4, 5]
    b = [6, 7, 8, 9, 10]
    u, p = SE.mann_whitney(a, b)
    assert u == 25.0  # complete separation: Umax = n1*n2
    assert p < 0.02
    # symmetric overlap -> U near n1*n2/2, p near 1
    u2, p2 = SE.mann_whitney([1, 3, 5, 7], [2, 4, 6, 8])
    assert p2 > 0.5


def test_chi_square_dataset():
    stat, p = SE.chi_square_dataset([10, 20, 30], [10, 20, 30])
    assert stat == 0.0 and p == pytest.approx(1.0)
    # unequal sums use the sqrt weight (commons formula)
    stat2, p2 = SE.chi_square_dataset([10, 20, 30], [30, 20, 10])
    w = 1.0
    want = sum(
        (o1 / w - o2 * w) ** 2 / (o1 + o2)
        for o1, o2 in [(10, 30), (20, 20), (30, 10)]
    )
    assert stat2 == pytest.approx(want)
    assert p2 == pytest.approx(float(1 - 0.5 * 0), abs=1.0)  # in range
    assert 0 <= p2 <= 1


def test_gtest_dataset():
    g, p = SE.gtest_dataset([120, 80], [100, 100])
    # manual: 2*sum o*ln(o/e) with e from pooled margins
    o = np.array([[120.0, 80.0], [100.0, 100.0]])
    rs, cs, n = o.sum(1), o.sum(0), o.sum()
    e = np.outer(rs, cs) / n
    want = 2 * (o * np.log(o / e)).sum()
    assert g == pytest.approx(float(want), rel=1e-9)
    assert 0 <= p <= 1


def test_anova():
    g1, g2, g3 = [1.0, 2, 3], [2.0, 3, 4], [8.0, 9, 10]
    f, p = SE.anova([g1, g2, g3])
    # recompute with the standard formula
    allv = np.array(g1 + g2 + g3)
    grand = allv.mean()
    ssb = sum(3 * (np.mean(g) - grand) ** 2 for g in (g1, g2, g3))
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in (g1, g2, g3))
    want = (ssb / 2) / (ssw / 6)
    assert f == pytest.approx(float(want))
    assert p < 0.01


def test_ks():
    rngd = np.random.default_rng(7)
    a = rngd.normal(0, 1, 400)
    b = rngd.normal(0, 1, 400)
    p_same = SE.ks_2samp(a, b)
    p_diff = SE.ks_2samp(a, rngd.normal(2, 1, 400))
    assert p_same > 0.05 and p_diff < 1e-6
    # standardize so the sample matches N(0,1) exactly in its first two
    # moments — isolates the d/p computation from sampling luck
    xs = np.sort((a - a.mean()) / a.std(ddof=0))
    from solr_spark.functions.special import norm_cdf

    d, p = SE.ks_dist(norm_cdf(xs), xs)
    assert d < 0.06 and p > 0.05


def test_kmeans_dbscan_deterministic():
    pts = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [5.0, 5.0], [5.1, 5.0], [5.0, 5.1]]
    cent, assign = SE.kmeans(pts, 2)
    assert len(set(assign[:3])) == 1 and len(set(assign[3:])) == 1
    assert assign[0] != assign[3]
    cent2, assign2 = SE.kmeans(pts, 2)
    assert (assign == assign2).all()  # seeded determinism
    labels = SE.dbscan(pts, eps=0.5, min_pts=2)
    assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
    lone = SE.dbscan(pts + [[99.0, 99.0]], eps=0.5, min_pts=2)
    assert lone[-1] == -1  # noise


def test_polyfit_ols_conv_fft():
    y = [1.0, 4.0, 9.0, 16.0, 25.0]
    fit = SE.polyfit_values(y, degree=2)
    assert np.allclose(fit, y, atol=1e-8)
    ols = SE.ols_regress([[1.0], [2.0], [3.0], [4.0]], [3.0, 5.0, 7.0, 9.0])
    assert ols["regressionParameters"][0] == pytest.approx(2.0)
    assert ols["intercept"] == pytest.approx(1.0)
    assert ols["RSquared"] == pytest.approx(1.0)
    assert np.allclose(SE.conv([1, 2], [1, 1]), [1.0, 3.0, 2.0])
    re, im = SE.fft_pair([1.0, 0.0, 0.0, 0.0])
    assert np.allclose(re, 0.25 * 4 * np.ones(4) * [1, 1, 1, 1])
    back = SE.ifft_real(re, im)
    assert np.allclose(back, [1.0, 0.0, 0.0, 0.0])
    assert SE.find_delay([0, 0, 1, 0], [1, 0, 0, 0]) == 2


# ------------------------------------------------------- spark layer


def _one(spark, expr, **arrays):
    if arrays:
        row = {
            k: [list(map(float, r)) for r in v]
            if isinstance(v[0], (list, tuple))
            else list(map(float, v))
            for k, v in arrays.items()
        }
        schema = ", ".join(
            f"{k} array<array<double>>"
            if isinstance(arrays[k][0], (list, tuple))
            else f"{k} array<double>"
            for k in sorted(row)
        )
        df = spark.createDataFrame([tuple(row[k] for k in sorted(row))], schema)
        out = eval_expr(f"select(search(t), {expr} as out)", {"t": df})
    else:
        out = eval_expr(f"select(calc(), {expr} as out)", {"t": spark.range(1)})
    return out.collect()[0]["out"]


def test_spark_distributions(spark):
    assert _one(
        spark, "cumulativeProbability(normalDistribution(0, 1), 1.96)"
    ) == pytest.approx(0.9750021, abs=1e-6)
    assert _one(
        spark, "probability(poissonDistribution(3), 2)"
    ) == pytest.approx(math.exp(-3) * 9 / 2)
    assert _one(
        spark, "probability(normalDistribution(0, 1), -1, 1)"
    ) == pytest.approx(0.6826894921, abs=1e-8)
    assert _one(
        spark, "density(uniformDistribution(0, 4), 2)"
    ) == pytest.approx(0.25)
    s = _one(spark, "sample(uniformDistribution(0, 1), 100)")
    assert len(s) == 100 and all(0 <= v <= 1 for v in s)
    s2 = _one(spark, "sample(uniformDistribution(0, 1), 100)")
    assert s == s2  # seeded determinism
    e = _one(spark, "cumulativeProbability(empiricalDistribution(a), 2.5)",
             a=[1.0, 2.0, 3.0, 4.0])
    assert e == pytest.approx(0.5)


def test_spark_tests_and_fitting(spark):
    a = [30.02, 29.99, 30.11, 29.97, 30.01, 29.99]
    b = [29.89, 29.93, 29.72, 29.98, 30.02, 29.98]
    r = _one(spark, "ttest(a, b)", a=a, b=b)
    assert r["t-statistic"] == pytest.approx(1.959, abs=1e-3)
    r2 = _one(spark, "mannWhitney(a, b)", a=a, b=b)
    assert 0 <= r2["p-value"] <= 1
    r3 = _one(spark, "chiSquareDataSet(a, b)",
              a=[10.0, 20, 30], b=[30.0, 20, 10])
    assert r3["p-value"] < 0.05
    fit = _one(spark, "polyfit(a, 2)", a=[1.0, 4.0, 9.0, 16.0])
    assert fit == pytest.approx([1.0, 4.0, 9.0, 16.0], abs=1e-6)
    ols = _one(spark, "olsRegress(m, y)",
               m=[[1.0], [2.0], [3.0]], y=[3.0, 5.0, 7.0])
    assert ols["intercept"] == pytest.approx(1.0)


def test_spark_kmeans_knn(spark):
    m = [[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]]
    km = _one(spark, "kmeans(m, 2)", m=m)
    assert len(km["centroids"]) == 2
    assert km["clusters"][0] == km["clusters"][1]
    assert km["clusters"][0] != km["clusters"][2]
    c0 = _one(spark, "getCluster(kmeans(m, 2), 0)", m=m)
    assert len(c0) == 2
    nn = _one(spark, "knn(m, array(0.05, 0.0), 2)", m=m)
    assert sorted(nn) == [[0.0, 0.0], [0.1, 0.0]]
    cents = _one(spark, "getCentroids(kmeans(m, 2))", m=m)
    assert len(cents) == 2 and len(cents[0]) == 2
