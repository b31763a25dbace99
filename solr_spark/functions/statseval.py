"""Statistical-test, distribution, and clustering evaluators in numpy.

The reference's math-expression layer backs these with commons-math
(solrj io/eval: TTestEvaluator, PairedTTestEvaluator,
MannWhitneyUEvaluator, KolmogorovSmirnovEvaluator,
ChiSquareDataSetEvaluator, GTestDataSetEvaluator, AnovaEvaluator,
NormalDistributionEvaluator & friends, SampleEvaluator,
ProbabilityEvaluator, CumulativeProbabilityEvaluator, DensityEvaluator,
KmeansEvaluator, MultiKmeansEvaluator, DbscanEvaluator, KnnEvaluator,
PolyFitEvaluator, ConvolutionEvaluator, FFTEvaluator,
FindDelayEvaluator, OlsRegressEvaluator). Each function here reproduces
the commons-math formula on numpy arrays; the streamexpr layer wraps
them in Arrow-batched pandas UDFs so whole batches evaluate per call.

Determinism: commons-math samples with an unseeded Well19937c; sampling
here is seeded (default seed=0, overridable) so tests and oracle twins
are reproducible — documented divergence, the draws are still i.i.d.
from the same distribution.
"""

from __future__ import annotations

import math

import numpy as np

from solr_spark.functions.special import (
    betainc,
    chi2_sf,
    f_sf,
    gammainc_lower,
    norm_cdf,
    norm_pdf,
    t_sf2,
)

# ---------------------------------------------------------------- tests


def ttest(a, b) -> tuple[float, float]:
    """Welch two-sample t (commons TTest.t / tTest two-array forms)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    n1, n2 = len(a), len(b)
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / n1 + v2 / n2
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2 * se2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    return float(t), float(t_sf2(t, df))


def ttest_onesample(mu: float, b) -> tuple[float, float]:
    b = np.asarray(b, float)
    n = len(b)
    t = (b.mean() - mu) / math.sqrt(b.var(ddof=1) / n)
    return float(t), float(t_sf2(t, n - 1))


def paired_ttest(a, b) -> tuple[float, float]:
    d = np.asarray(a, float) - np.asarray(b, float)
    return ttest_onesample(0.0, d)


def _ranks_with_ties(x: np.ndarray) -> np.ndarray:
    """1-based ranks, ties averaged (commons NaturalRanking TIES_AVERAGED)."""
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def mann_whitney(a, b) -> tuple[float, float]:
    """commons MannWhitneyUTest: U = max(U1, U2); asymptotic normal
    p-value from Umin, no tie correction."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    n1, n2 = len(a), len(b)
    ranks = _ranks_with_ties(np.concatenate([a, b]))
    u1 = ranks[:n1].sum() - n1 * (n1 + 1) / 2.0
    u2 = n1 * n2 - u1
    umax, umin = max(u1, u2), min(u1, u2)
    mu = n1 * n2 / 2.0
    sd = math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    z = (umin - mu) / sd
    return float(umax), float(2.0 * norm_cdf(z))


def ks_2samp(a, b) -> float:
    """Two-sample KS p-value via the asymptotic Kolmogorov distribution
    (commons uses exactP below n*m<10⁴; the asymptotic form agrees to
    ~1e-2 there and exactly in the large-sample regime — documented)."""
    a = np.sort(np.asarray(a, float))
    b = np.sort(np.asarray(b, float))
    n, m = len(a), len(b)
    grid = np.concatenate([a, b])
    ca = np.searchsorted(a, grid, side="right") / n
    cb = np.searchsorted(b, grid, side="right") / m
    d = np.abs(ca - cb).max()
    lam = d * math.sqrt(n * m / (n + m))
    return _kolmogorov_sf(lam)


def ks_dist(cdf_vals: np.ndarray, sample) -> tuple[float, float]:
    """One-sample KS against a distribution: `cdf_vals` is F(x_i) for
    the SORTED sample. Returns (d, p)."""
    x = np.asarray(sample, float)
    n = len(x)
    order = np.argsort(x, kind="stable")
    f = np.asarray(cdf_vals, float)[order]
    i = np.arange(1, n + 1)
    d = max(np.max(i / n - f), np.max(f - (i - 1) / n))
    return float(d), _kolmogorov_sf(d * math.sqrt(n))


def _kolmogorov_sf(lam: float) -> float:
    if lam <= 0:
        return 1.0
    s = 0.0
    for k in range(1, 101):
        term = (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        s += term
        if abs(term) < 1e-16:
            break
    return float(min(1.0, max(0.0, 2.0 * s)))


def chi_square_dataset(a, b) -> tuple[float, float]:
    """commons ChiSquareTest.chiSquareDataSetsComparison + its p."""
    o1 = np.asarray(a, float)
    o2 = np.asarray(b, float)
    s1, s2 = o1.sum(), o2.sum()
    unequal = s1 != s2
    weight = math.sqrt(s1 / s2) if unequal else 1.0
    dev = o1 / weight - o2 * weight
    stat = float((dev * dev / (o1 + o2)).sum())
    return stat, float(chi2_sf(stat, len(o1) - 1))


def gtest_dataset(a, b) -> tuple[float, float]:
    """commons GTest.gDataSetsComparison: 2N(H(colsums)+H(rows flat)
    −H(rowsums)−H(flat)) entropy identity on the 2×k table."""
    o = np.array([np.asarray(a, float), np.asarray(b, float)])
    n = o.sum()

    def _h(v):
        v = v[v > 0] / n
        return float(-(v * np.log(v)).sum())

    g = 2.0 * n * (_h(o.sum(axis=0)) + _h(o.sum(axis=1)) - _h(o.ravel()))
    return float(g), float(chi2_sf(g, len(a) - 1))


def anova(groups: list) -> tuple[float, float]:
    """commons OneWayAnova: returns (f-ratio, p-value)."""
    groups = [np.asarray(g, float) for g in groups]
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    df1, df2 = k - 1, n - k
    f = (ssb / df1) / (ssw / df2)
    return float(f), float(f_sf(f, df1, df2))


# ---------------------------------------------------------- distributions
#
# A distribution value is the 4-tuple (dtype, p1, p2, data) the struct
# Column carries. CDF/PDF/PMF/sampling dispatch on dtype.


def dist_cdf(dtype: str, p1: float, p2: float, data, x) -> float:
    x = float(x)
    if dtype == "normal":
        return float(norm_cdf(x, p1, p2))
    if dtype == "uniform":
        if x < p1:
            return 0.0
        return min(1.0, (x - p1) / (p2 - p1))
    if dtype == "uniformInt":
        k = math.floor(x)
        if k < p1:
            return 0.0
        return min(1.0, (k - p1 + 1) / (p2 - p1 + 1))
    if dtype == "binomial":
        from solr_spark.functions.special import binom_cdf

        return float(binom_cdf(x, p1, p2))
    if dtype == "poisson":
        from solr_spark.functions.special import poisson_cdf

        return float(poisson_cdf(x, p1))
    if dtype == "gamma":
        return float(gammainc_lower(p1, max(0.0, x) / p2))
    if dtype == "beta":
        return float(betainc(p1, p2, min(1.0, max(0.0, x))))
    if dtype == "weibull":
        return 0.0 if x <= 0 else 1.0 - math.exp(-((x / p2) ** p1))
    if dtype == "logNormal":
        # commons LogNormalDistribution(scale=μ, shape=σ)
        return 0.0 if x <= 0 else float(norm_cdf(math.log(x), p1, p2))
    if dtype == "constant":
        return 1.0 if x >= p1 else 0.0
    if dtype == "geometric":
        k = math.floor(x)
        return 0.0 if k < 0 else 1.0 - (1.0 - p1) ** (k + 1)
    if dtype == "triangular":
        a, c, b = p1, p2, data[0]
        if x <= a:
            return 0.0
        if x >= b:
            return 1.0
        if x <= c:
            return (x - a) ** 2 / ((b - a) * (c - a))
        return 1.0 - (b - x) ** 2 / ((b - a) * (b - c))
    if dtype == "zipf":
        n, s = int(p1), p2
        norm = sum(1.0 / k**s for k in range(1, n + 1))
        k = min(n, math.floor(x))
        if k < 1:
            return 0.0
        return sum(1.0 / j**s for j in range(1, k + 1)) / norm
    if dtype == "empirical":
        arr = np.asarray(data, float)
        return float(np.searchsorted(np.sort(arr), x, side="right") / len(arr))
    if dtype == "enumerated":
        arr = np.asarray(data, float)
        return float((arr <= x).sum() / len(arr))
    raise ValueError(f"unknown distribution {dtype!r}")


def dist_density(dtype: str, p1: float, p2: float, data, x) -> float:
    x = float(x)
    if dtype == "normal":
        return float(norm_pdf(x, p1, p2))
    if dtype == "uniform":
        return 1.0 / (p2 - p1) if p1 <= x <= p2 else 0.0
    if dtype == "gamma":
        if x <= 0:
            return 0.0
        return math.exp(
            (p1 - 1) * math.log(x) - x / p2 - math.lgamma(p1) - p1 * math.log(p2)
        )
    if dtype == "beta":
        if not 0 < x < 1:
            return 0.0
        return math.exp(
            math.lgamma(p1 + p2)
            - math.lgamma(p1)
            - math.lgamma(p2)
            + (p1 - 1) * math.log(x)
            + (p2 - 1) * math.log1p(-x)
        )
    if dtype == "weibull":
        if x <= 0:
            return 0.0
        return (p1 / p2) * (x / p2) ** (p1 - 1) * math.exp(-((x / p2) ** p1))
    if dtype == "logNormal":
        if x <= 0:
            return 0.0
        return float(norm_pdf(math.log(x), p1, p2)) / x
    if dtype == "triangular":
        a, c, b = p1, p2, data[0]
        if x < a or x > b:
            return 0.0
        if x <= c:
            return 2.0 * (x - a) / ((b - a) * (c - a))
        return 2.0 * (b - x) / ((b - a) * (b - c))
    if dtype == "empirical":
        # commons EmpiricalDistribution density: kernel over 10 bins —
        # approximated here as the histogram density (documented)
        arr = np.sort(np.asarray(data, float))
        lo, hi = arr[0], arr[-1]
        if hi == lo or not lo <= x <= hi:
            return 0.0
        nb = 10
        w = (hi - lo) / nb
        b = min(nb - 1, int((x - lo) / w))
        cnt = ((arr >= lo + b * w) & (arr < lo + (b + 1) * w)).sum()
        if b == nb - 1:
            cnt = (arr >= lo + b * w).sum()
        return float(cnt / (len(arr) * w))
    # discrete pmf doubles as density
    return dist_pmf(dtype, p1, p2, data, x)


def dist_pmf(dtype: str, p1: float, p2: float, data, x) -> float:
    k = int(round(float(x)))
    if dtype == "binomial":
        n, p = int(p1), p2
        if not 0 <= k <= n:
            return 0.0
        return math.exp(
            math.lgamma(n + 1)
            - math.lgamma(k + 1)
            - math.lgamma(n - k + 1)
            + (k * math.log(p) if k else 0.0)
            + ((n - k) * math.log1p(-p) if n - k else 0.0)
        )
    if dtype == "poisson":
        if k < 0:
            return 0.0
        return math.exp(-p1 + k * math.log(p1) - math.lgamma(k + 1))
    if dtype == "uniformInt":
        return 1.0 / (p2 - p1 + 1) if p1 <= k <= p2 else 0.0
    if dtype == "geometric":
        return p1 * (1 - p1) ** k if k >= 0 else 0.0
    if dtype == "zipf":
        n, s = int(p1), p2
        if not 1 <= k <= n:
            return 0.0
        return (1.0 / k**s) / sum(1.0 / j**s for j in range(1, n + 1))
    if dtype == "enumerated":
        arr = np.asarray(data, float)
        return float((arr == float(x)).sum() / len(arr))
    if dtype == "constant":
        return 1.0 if float(x) == p1 else 0.0
    raise ValueError(f"no pmf for distribution {dtype!r}")


def dist_sample(
    dtype: str, p1: float, p2: float, data, n: int, seed: int = 0
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if dtype == "normal":
        return rng.normal(p1, p2, n)
    if dtype == "uniform":
        return rng.uniform(p1, p2, n)
    if dtype == "uniformInt":
        return rng.integers(int(p1), int(p2) + 1, n).astype(float)
    if dtype == "binomial":
        return rng.binomial(int(p1), p2, n).astype(float)
    if dtype == "poisson":
        return rng.poisson(p1, n).astype(float)
    if dtype == "gamma":
        return rng.gamma(p1, p2, n)
    if dtype == "beta":
        return rng.beta(p1, p2, n)
    if dtype == "weibull":
        return p2 * rng.weibull(p1, n)
    if dtype == "logNormal":
        return rng.lognormal(p1, p2, n)
    if dtype == "constant":
        return np.full(n, p1)
    if dtype == "geometric":
        return (rng.geometric(p1, n) - 1).astype(float)  # commons counts failures
    if dtype == "triangular":
        return rng.triangular(p1, p2, data[0], n)
    if dtype == "zipf":
        pmf = np.array(
            [1.0 / k**p2 for k in range(1, int(p1) + 1)], dtype=float
        )
        pmf /= pmf.sum()
        return rng.choice(np.arange(1, int(p1) + 1), size=n, p=pmf).astype(float)
    if dtype in ("empirical", "enumerated"):
        return rng.choice(np.asarray(data, float), size=n, replace=True)
    raise ValueError(f"cannot sample distribution {dtype!r}")


# ------------------------------------------------------------- clustering


def kmeans(
    matrix, k: int, max_iter: int = 50, seed: int = 0, trials: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd's k-means with k-means++ seeding (commons
    KMeansPlusPlusClusterer), seeded RNG for determinism. Returns
    (centroids k×d, assignments n). `trials` > 1 = multiKmeans: best of
    N runs by within-cluster sum of squares."""
    x = np.asarray(matrix, float)
    best = None
    for t in range(trials):
        rng = np.random.default_rng(seed + t)
        cent = _kpp_init(x, k, rng)
        for _ in range(max_iter):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            new = np.array(
                [
                    x[assign == j].mean(axis=0) if (assign == j).any() else cent[j]
                    for j in range(k)
                ]
            )
            if np.allclose(new, cent):
                cent = new
                break
            cent = new
        wcss = float(d[np.arange(len(x)), assign].sum())
        if best is None or wcss < best[0]:
            best = (wcss, cent, assign)
    return best[1], best[2]


def _kpp_init(x: np.ndarray, k: int, rng) -> np.ndarray:
    cent = [x[rng.integers(len(x))]]
    for _ in range(1, k):
        d2 = np.min(
            ((x[:, None, :] - np.array(cent)[None, :, :]) ** 2).sum(axis=2),
            axis=1,
        )
        tot = d2.sum()
        if tot == 0:
            cent.append(x[rng.integers(len(x))])
            continue
        cent.append(x[np.searchsorted(np.cumsum(d2 / tot), rng.random())])
    return np.array(cent)


def dbscan(matrix, eps: float, min_pts: int) -> np.ndarray:
    """Classic DBSCAN (commons DBSCANClusterer); returns assignment
    array with -1 for noise, cluster ids in discovery order."""
    x = np.asarray(matrix, float)
    n = len(x)
    d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2))
    labels = np.full(n, -2)
    cid = -1
    for i in range(n):
        if labels[i] != -2:
            continue
        neigh = np.where(d[i] <= eps)[0]
        if len(neigh) < min_pts:
            labels[i] = -1
            continue
        cid += 1
        labels[i] = cid
        stack = [j for j in neigh if j != i]
        while stack:
            j = stack.pop()
            if labels[j] == -1:
                labels[j] = cid
            if labels[j] != -2:
                continue
            labels[j] = cid
            nj = np.where(d[j] <= eps)[0]
            if len(nj) >= min_pts:
                stack.extend(jj for jj in nj if labels[jj] == -2)
    return labels


# --------------------------------------------------------------- fitting


def polyfit_values(y, x=None, degree: int = 3) -> np.ndarray:
    """PolyFitEvaluator: least-squares poly fit, returns FITTED values."""
    y = np.asarray(y, float)
    x = np.arange(len(y), dtype=float) if x is None else np.asarray(x, float)
    coef = np.polyfit(x, y, degree)
    return np.polyval(coef, x)


def ols_regress(matrix, y) -> dict:
    """OLSRegressionEvaluator (commons OLSMultipleLinearRegression):
    X gains an intercept column; returns the fields Solr serializes."""
    x = np.asarray(matrix, float)
    y = np.asarray(y, float)
    xd = np.column_stack([np.ones(len(x)), x])
    coef, *_ = np.linalg.lstsq(xd, y, rcond=None)
    resid = y - xd @ coef
    sse = float((resid**2).sum())
    sst = float(((y - y.mean()) ** 2).sum())
    return {
        "regressionParameters": [float(c) for c in coef[1:]],
        "intercept": float(coef[0]),
        "RSquared": 1.0 - sse / sst if sst else 0.0,
        "residuals": [float(r) for r in resid],
    }


def conv(a, b) -> np.ndarray:
    return np.convolve(np.asarray(a, float), np.asarray(b, float))


def fft_pair(a) -> tuple[np.ndarray, np.ndarray]:
    z = np.fft.fft(np.asarray(a, float))
    return z.real, z.imag


def ifft_real(re, im) -> np.ndarray:
    return np.fft.ifft(np.asarray(re, float) + 1j * np.asarray(im, float)).real


def find_delay(a, b) -> int:
    """FindDelayEvaluator: argmax of full cross-correlation of a
    against b, expressed as the delay of b relative to a."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    xc = np.correlate(a, b, mode="full")
    return int(np.argmax(xc) - (len(b) - 1))


# ----------------------------------------------- interpolation / fitting
#
# The reference wraps commons-math interpolators/fitters in
# VectorFunction objects that serialize as fitted values and evaluate
# via predict() (io/eval LerpEvaluator, SplineEvaluator,
# AkimaEvaluator, LoessEvaluator, DerivativeEvaluator,
# IntegrateEvaluator, HarmonicFitEvaluator, GaussFitEvaluator,
# OscillateEvaluator, KnnRegressionEvaluator). Here a function value is
# the (ftype, xs, ys, params) 4-tuple the struct Column carries;
# `fn_predict` dispatches.


def _natural_cubic_coeffs(x: np.ndarray, y: np.ndarray):
    """Natural cubic spline second derivatives (classic tridiagonal
    solve, Numerical Recipes spline())."""
    n = len(x)
    y2 = np.zeros(n)
    u = np.zeros(n)
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        u[i] = (
            6.0
            * (
                (y[i + 1] - y[i]) / (x[i + 1] - x[i])
                - (y[i] - y[i - 1]) / (x[i] - x[i - 1])
            )
            / (x[i + 1] - x[i - 1])
            - sig * u[i - 1]
        ) / p
    for i in range(n - 2, -1, -1):
        y2[i] = y2[i] * y2[i + 1] + u[i]
    return y2


def _spline_eval(x: np.ndarray, y: np.ndarray, y2: np.ndarray, v: float) -> float:
    n = len(x)
    klo = int(np.clip(np.searchsorted(x, v) - 1, 0, n - 2))
    khi = klo + 1
    h = x[khi] - x[klo]
    a = (x[khi] - v) / h
    b = (v - x[klo]) / h
    return float(
        a * y[klo]
        + b * y[khi]
        + ((a**3 - a) * y2[klo] + (b**3 - b) * y2[khi]) * h * h / 6.0
    )


def _akima_slopes(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Akima 1970 slope weighting (what commons AkimaSplineInterpolator
    implements)."""
    n = len(x)
    m = np.diff(y) / np.diff(x)
    mm = np.concatenate(
        [[2 * m[0] - m[1], 2 * (2 * m[0] - m[1]) - m[0]][::-1], m,
         [2 * m[-1] - m[-2], 2 * (2 * m[-1] - m[-2]) - m[-1]]]
    )
    t = np.zeros(n)
    for i in range(n):
        w1 = abs(mm[i + 3] - mm[i + 2])
        w2 = abs(mm[i + 1] - mm[i])
        t[i] = (
            (w1 * mm[i + 1] + w2 * mm[i + 2]) / (w1 + w2)
            if (w1 + w2) > 0
            else (mm[i + 1] + mm[i + 2]) / 2.0
        )
    return t


def _akima_eval(x, y, t, v: float) -> float:
    n = len(x)
    i = int(np.clip(np.searchsorted(x, v) - 1, 0, n - 2))
    h = x[i + 1] - x[i]
    s = (v - x[i]) / h
    m = (y[i + 1] - y[i]) / h
    # cubic hermite with akima slopes
    h00 = 2 * s**3 - 3 * s**2 + 1
    h10 = s**3 - 2 * s**2 + s
    h01 = -2 * s**3 + 3 * s**2
    h11 = s**3 - s**2
    return float(h00 * y[i] + h10 * h * t[i] + h01 * y[i + 1] + h11 * h * t[i + 1])


def _loess_eval(x, y, v: float, bandwidth: float = 0.3) -> float:
    """Tricube-weighted local LINEAR regression at v (the smoothing
    kernel commons LoessInterpolator uses; the reference then splines
    the smoothed points — the direct local fit agrees on the data range
    and is documented as the approximation)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = len(x)
    r = max(2, int(math.ceil(bandwidth * n)))
    d = np.abs(x - v)
    idx = np.argsort(d, kind="stable")[:r]
    dmax = d[idx].max() or 1.0
    w = (1 - (d[idx] / dmax) ** 3) ** 3
    xw, yw = x[idx], y[idx]
    sw = w.sum()
    mx, my = (w * xw).sum() / sw, (w * yw).sum() / sw
    sxx = (w * (xw - mx) ** 2).sum()
    if sxx == 0:
        return float(my)
    b = (w * (xw - mx) * (yw - my)).sum() / sxx
    return float(my + b * (v - mx))


def fn_predict(ftype: str, xs, ys, params, v: float) -> float:
    """Evaluate a function value (interpolation/fit/regression model)
    at point v."""
    base, _, deriv = ftype.partition("#")
    if deriv:
        h = max(1e-6, abs(v) * 1e-6)
        f = lambda u: fn_predict(base, xs, ys, params, u)  # noqa: E731
        return (f(v + h) - f(v - h)) / (2 * h)
    x = None if xs is None else np.asarray(xs, float)
    y = None if ys is None else np.asarray(ys, float)
    if base == "lerp":
        return float(np.interp(v, x, y))
    if base == "spline":
        return _spline_eval(x, y, _natural_cubic_coeffs(x, y), v)
    if base == "akima":
        return _akima_eval(x, y, _akima_slopes(x, y), v)
    if base == "loess":
        bw = params[0] if params else 0.3
        return _loess_eval(x, y, v, bw)
    if base == "oscillate":
        amp, om, phase = params
        return float(amp * math.sin(om * v + phase))
    if base == "gaussian":
        norm, mean, sigma = params
        return float(norm * math.exp(-((v - mean) ** 2) / (2 * sigma**2)))
    if base == "harmonic":
        amp, om, phase = params
        return float(amp * math.cos(om * v + phase))
    raise ValueError(f"cannot predict function type {ftype!r}")


def fn_integral(ftype: str, xs, ys, params, lo: float, hi: float) -> float:
    """Numeric integral of a function value over [lo, hi] (composite
    Simpson, 1024 panels — the reference uses Romberg)."""
    n = 1024
    grid = np.linspace(lo, hi, n + 1)
    vals = np.array([fn_predict(ftype, xs, ys, params, v) for v in grid])
    h = (hi - lo) / n
    return float(h / 3 * (vals[0] + vals[-1] + 4 * vals[1:-1:2].sum() + 2 * vals[2:-1:2].sum()))


def gauss_fit(x, y) -> tuple[float, float, float]:
    """Gaussian a·exp(−(v−b)²/2c²) fit: moment-based start (commons
    ParameterGuesser) refined by Gauss-Newton on (a, b, c)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    a = float(y.max())
    b = float(x[np.argmax(y)])
    w = y.clip(min=0) / max(1e-300, y.clip(min=0).sum())
    c = float(max(1e-6, math.sqrt(((x - (x * w).sum()) ** 2 * w).sum())))
    for _ in range(100):
        e = np.exp(-((x - b) ** 2) / (2 * c * c))
        f = a * e
        r = y - f
        ja = e
        jb = f * (x - b) / (c * c)
        jc = f * (x - b) ** 2 / (c**3)
        jac = np.column_stack([ja, jb, jc])
        try:
            step, *_ = np.linalg.lstsq(jac, r, rcond=None)
        except np.linalg.LinAlgError:
            break
        a, b, c = a + step[0], b + step[1], c + step[2]
        c = max(1e-9, abs(c))
        if np.abs(step).max() < 1e-12:
            break
    return float(a), float(b), float(c)


def harmonic_fit(x, y) -> tuple[float, float, float]:
    """amp·sin(ω v + φ) fit: FFT picks the dominant frequency, then the
    linear system y = A sin(ωx) + B cos(ωx) solves amp/phase; a 1-D
    golden-section refine on ω (commons HarmonicCurveFitter role)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)

    def _fit_at(om):
        s, c = np.sin(om * x), np.cos(om * x)
        coef, *_ = np.linalg.lstsq(np.column_stack([s, c]), y, rcond=None)
        resid = y - coef[0] * s - coef[1] * c
        return coef, float((resid**2).sum())

    # FFT seed (assumes near-uniform x spacing for the seed only)
    dt = np.median(np.diff(np.sort(x)))
    freqs = np.fft.rfftfreq(len(x), dt)
    mag = np.abs(np.fft.rfft(y - y.mean()))
    om0 = 2 * math.pi * freqs[1 + int(np.argmax(mag[1:]))]
    lo, hi = om0 * 0.5, om0 * 1.5
    gr = (math.sqrt(5) - 1) / 2
    a_, b_ = lo, hi
    for _ in range(80):
        c1, c2 = b_ - gr * (b_ - a_), a_ + gr * (b_ - a_)
        if _fit_at(c1)[1] < _fit_at(c2)[1]:
            b_ = c2
        else:
            a_ = c1
    om = (a_ + b_) / 2
    (A, B), _ = _fit_at(om)
    amp = math.hypot(A, B)
    phase = math.atan2(B, A)
    return float(amp), float(om), float(phase)


def knn_regress_predict(points, yvals, k: int, query) -> float:
    """KnnRegressionEvaluator predict: mean y of the k nearest rows."""
    x = np.asarray(points, float)
    q = np.asarray(query, float)
    d = ((x - q[None, :]) ** 2).sum(axis=1)
    idx = np.argsort(d, kind="stable")[:k]
    return float(np.asarray(yvals, float)[idx].mean())


def fuzzy_kmeans(matrix, k: int, fuzziness: float = 2.0,
                 max_iter: int = 100, seed: int = 0):
    """Fuzzy c-means (commons FuzzyKMeansClusterer), seeded. Returns
    (centroids, membership n×k, hard assignments)."""
    x = np.asarray(matrix, float)
    n = len(x)
    rng = np.random.default_rng(seed)
    u = rng.random((n, k))
    u /= u.sum(axis=1, keepdims=True)
    m = fuzziness
    for _ in range(max_iter):
        um = u**m
        cent = (um.T @ x) / um.sum(axis=0)[:, None]
        d = np.sqrt(((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2))
        d = np.maximum(d, 1e-12)
        inv = d ** (-2.0 / (m - 1))
        new_u = inv / inv.sum(axis=1, keepdims=True)
        if np.abs(new_u - u).max() < 1e-9:
            u = new_u
            break
        u = new_u
    return cent, u, u.argmax(axis=1)


def markov_sample(transition, n: int, seed: int = 0, start: int = 0):
    """MarkovChainEvaluator.sample: seeded walk over the row-stochastic
    transition matrix, emitting visited states."""
    p = np.asarray(transition, float)
    rng = np.random.default_rng(seed)
    state = int(start)
    out = []
    for _ in range(n):
        state = int(rng.choice(len(p), p=p[state] / p[state].sum()))
        out.append(state)
    return out


# ------------------------------------------------- computational geometry


def convex_hull(points) -> np.ndarray:
    """2-D convex hull, Andrew monotone chain (counter-clockwise
    vertices, no duplicate endpoint) — the role commons-math's
    MonotoneChain plays for ConvexHullEvaluator."""
    pts = sorted({(float(p[0]), float(p[1])) for p in points})
    if len(pts) <= 2:
        return np.asarray(pts, float)

    def _cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1], float)


def hull_area(vertices) -> float:
    v = np.asarray(vertices, float)
    x, y = v[:, 0], v[:, 1]
    return float(0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def hull_perimeter(vertices) -> float:
    v = np.asarray(vertices, float)
    return float(np.sqrt(((v - np.roll(v, -1, axis=0)) ** 2).sum(axis=1)).sum())


def hull_barycenter(vertices) -> np.ndarray:
    return np.asarray(vertices, float).mean(axis=0)


def enclosing_disk(points) -> tuple[np.ndarray, float, np.ndarray]:
    """Smallest enclosing disk, Welzl's algorithm (seeded shuffle for
    the randomized recursion; exact result independent of order).
    Returns (center, radius, support points)."""
    pts = [np.asarray(p, float) for p in points]
    rng = np.random.default_rng(0)
    rng.shuffle(pts)

    def _circle2(a, b):
        return (a + b) / 2, float(np.linalg.norm(a - b) / 2)

    def _circle3(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if abs(d) < 1e-18:
            return None
        ux = (
            (ax**2 + ay**2) * (by - cy)
            + (bx**2 + by**2) * (cy - ay)
            + (cx**2 + cy**2) * (ay - by)
        ) / d
        uy = (
            (ax**2 + ay**2) * (cx - bx)
            + (bx**2 + by**2) * (ax - cx)
            + (cx**2 + cy**2) * (bx - ax)
        ) / d
        ctr = np.array([ux, uy])
        return ctr, float(np.linalg.norm(a - ctr))

    def _in(c, r, p):
        return np.linalg.norm(p - c) <= r + 1e-9

    c, r, support = pts[0], 0.0, [pts[0]]
    for i, p in enumerate(pts):
        if _in(c, r, p):
            continue
        c, r, support = p, 0.0, [p]
        for j in range(i):
            q = pts[j]
            if _in(c, r, q):
                continue
            c, r = _circle2(p, q)
            support = [p, q]
            for kk in range(j):
                s = pts[kk]
                if _in(c, r, s):
                    continue
                res = _circle3(p, q, s)
                if res is not None:
                    c, r = res
                    support = [p, q, s]
    return c, float(r), np.asarray(support, float)
