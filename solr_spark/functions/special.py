"""Special functions for the statistical evaluator layer, in pure numpy.

The reference's stat evaluators (solrj io/eval: TTestEvaluator,
ChiSquareDataSetEvaluator, GTestDataSetEvaluator, MannWhitneyEvaluator,
AnovaEvaluator, the *Distribution evaluators) delegate to commons-math
distribution classes, which bottom out in Gamma/Beta regularized
functions. The sandbox has no scipy, so the three regularized functions
are implemented here with the standard published algorithms (power
series + Lentz continued fractions, as in Abramowitz & Stegun §6.5/§26.5
and the commons-math Gamma/Beta classes): double-precision accurate to
~1e-12 over the argument ranges statistical tests use.

Everything is vectorized over numpy arrays so the pandas-UDF layer can
evaluate a whole Arrow batch per call.
"""

from __future__ import annotations

import math

import numpy as np

_erf_v = np.vectorize(math.erf, otypes=[float])
_lgamma_v = np.vectorize(math.lgamma, otypes=[float])

_EPS = 1e-15
_FPMIN = 1e-300
_MAX_ITER = 500


def erf(x):
    return _erf_v(np.asarray(x, dtype=float))


def lgamma(x):
    return _lgamma_v(np.asarray(x, dtype=float))


def norm_cdf(x, mean=0.0, sd=1.0):
    z = (np.asarray(x, dtype=float) - mean) / (sd * math.sqrt(2.0))
    return 0.5 * (1.0 + erf(z))


def norm_pdf(x, mean=0.0, sd=1.0):
    z = (np.asarray(x, dtype=float) - mean) / sd
    return np.exp(-0.5 * z * z) / (sd * math.sqrt(2.0 * math.pi))


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def _betainc_scalar(a: float, b: float, x: float) -> float:
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


_betainc_v = np.vectorize(_betainc_scalar, otypes=[float])


def betainc(a, b, x):
    """Regularized incomplete beta I_x(a, b)."""
    return _betainc_v(a, b, x)


def _gammainc_scalar(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x <= 0.0:
        return 0.0
    if x < a + 1.0:
        # series representation
        ap = a
        s = 1.0 / a
        term = s
        for _ in range(_MAX_ITER):
            ap += 1.0
            term *= x / ap
            s += term
            if abs(term) < abs(s) * _EPS:
                break
        return s * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q(a, x), Lentz
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    q = math.exp(-x + a * math.log(x) - math.lgamma(a)) * h
    return 1.0 - q


_gammainc_v = np.vectorize(_gammainc_scalar, otypes=[float])


def gammainc_lower(a, x):
    """Regularized lower incomplete gamma P(a, x) = γ(a,x)/Γ(a)."""
    return _gammainc_v(a, x)


# ---- CDFs built on the three primitives ----

def t_sf2(t, df):
    """Two-sided t-test p-value: P(|T| >= |t|) = I_{df/(df+t²)}(df/2, ½)."""
    t = np.asarray(t, dtype=float)
    df = np.asarray(df, dtype=float)
    return betainc(df / 2.0, 0.5, df / (df + t * t))


def chi2_sf(x, df):
    """P(X >= x) for chi-square with df degrees of freedom."""
    return 1.0 - gammainc_lower(np.asarray(df, float) / 2.0,
                                np.asarray(x, float) / 2.0)


def f_sf(f, df1, df2):
    """P(X >= f) for the F distribution (one-way ANOVA p-value)."""
    f = np.asarray(f, dtype=float)
    df1 = np.asarray(df1, dtype=float)
    df2 = np.asarray(df2, dtype=float)
    return betainc(df2 / 2.0, df1 / 2.0, df2 / (df2 + df1 * f))


def binom_cdf(k, n, p):
    """P(X <= k) = I_{1-p}(n-k, k+1)."""
    k = np.floor(np.asarray(k, dtype=float))
    n = np.asarray(n, dtype=float)
    out = np.where(
        k < 0, 0.0, np.where(k >= n, 1.0, betainc(n - k, k + 1.0, 1.0 - p))
    )
    return out


def poisson_cdf(k, lam):
    """P(X <= k) = Q(k+1, λ) = 1 - P(k+1, λ)."""
    k = np.floor(np.asarray(k, dtype=float))
    return np.where(k < 0, 0.0, 1.0 - gammainc_lower(k + 1.0, lam))


def gamma_cdf(x, shape, scale):
    return gammainc_lower(shape, np.asarray(x, dtype=float) / scale)
