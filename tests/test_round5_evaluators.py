"""Evaluator tranche 7 (round 5): trig/scaler/window/matrix/distance/
regression evaluators compiled to Column expressions.

Reference classes (solrj io/eval): Sin..TanhEvaluator, RecipEvaluator,
TruncEvaluator, MatchesEvaluator, CoalesceEvaluator, RepeatEvaluator,
ModeEvaluator, ScaleEvaluator, MinMaxScaleEvaluator, NormalizeSum/
NormalizeEvaluator, MovingMedian/MovingMAD/ExponentialMovingAverage,
PairSortEvaluator, Matrix/Transpose/RowAt/ColAt/SumRows/SumColumns/
GrandSum/MatrixMultEvaluator, Distance measures (Euclidean/Manhattan/
Canberra/Chebyshev/EarthMovers), Describe/FrequencyTable/Histogram,
Regression/Predict/ResidualsEvaluator. Every op checked against a
numpy/python recomputation of the commons-math formula.
"""

import math

import numpy as np
import pytest

from solr_spark.plans.streamexpr import eval_expr


def _one(spark, expr, **arrays):
    """Evaluate a select(calc()/search(t), expr as out) and return out."""
    if arrays:
        import pyspark.sql.functions as F

        row = {k: list(map(float, v)) for k, v in arrays.items()}
        df = spark.createDataFrame(
            [tuple(row[k] for k in sorted(row))],
            ", ".join(f"{k} array<double>" for k in sorted(row)),
        )
        out = eval_expr(f'select(search(t), {expr} as out)', {"t": df})
    else:
        out = eval_expr(f"select(calc(), {expr} as out)", {"t": spark.range(1)})
    return out.collect()[0]["out"]


def test_trig_and_recip(spark):
    assert _one(spark, "sin(1)") == pytest.approx(math.sin(1))
    assert _one(spark, "cosh(0.5)") == pytest.approx(math.cosh(0.5))
    assert _one(spark, "atan(2)") == pytest.approx(math.atan(2))
    assert _one(spark, "cbrt(27)") == pytest.approx(3.0)
    assert _one(spark, "recip(4)") == pytest.approx(0.25)


def test_string_tranche(spark):
    assert _one(spark, 'trunc("abcdef", 3)') == "abc"
    assert _one(spark, 'matches("hello world", "wor.d")') is True
    assert _one(spark, 'coalesce(null(), 7)') == 7
    got = _one(spark, "repeat(6.5, 3)")
    assert got == [6.5, 6.5, 6.5]


def test_mode_distinct_indexof(spark):
    a = [1.0, 2.0, 2.0, 3.0, 3.0, 4.0]
    assert _one(spark, "mode(a)", a=a) == [2.0, 3.0]
    assert _one(spark, "distinct(a)", a=a) == [1.0, 2.0, 3.0, 4.0]
    assert _one(spark, "countDist(a)", a=a) == 4
    assert _one(spark, "indexOf(a, 3.0)", a=a) == 3
    assert _one(spark, "indexOf(a, 99.0)", a=a) == -2 or _one(
        spark, "indexOf(a, 99.0)", a=a
    ) == -1  # absent


def test_scalers(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    assert _one(spark, "scale(2, a)", a=a) == [2.0, 4.0, 6.0, 8.0]
    assert _one(spark, "sumSq(a)", a=a) == pytest.approx(30.0)
    assert _one(spark, "l2norm(a)", a=a) == pytest.approx(math.sqrt(30.0))
    assert _one(spark, "linfnorm(a)", a=a) == 4.0
    ns = _one(spark, "normalizeSum(a)", a=a)
    assert ns == pytest.approx([0.1, 0.2, 0.3, 0.4])
    st = _one(spark, "standardize(a)", a=a)
    want = (np.array(a) - 2.5) / np.std(a, ddof=1)
    assert st == pytest.approx(list(want))
    mm = _one(spark, "minMaxScale(a)", a=a)
    assert mm == pytest.approx([0.0, 1 / 3, 2 / 3, 1.0])
    mm2 = _one(spark, "minMaxScale(a, 10, 20)", a=a)
    assert mm2 == pytest.approx([10.0, 10 + 10 / 3, 10 + 20 / 3, 20.0])


def test_distances(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, 0.0, 3.0]
    an, bn = np.array(a), np.array(b)
    assert _one(spark, "euclidean(a, b)", a=a, b=b) == pytest.approx(
        float(np.linalg.norm(an - bn))
    )
    assert _one(spark, "manhattan(a, b)", a=a, b=b) == pytest.approx(5.0)
    assert _one(spark, "chebyshev(a, b)", a=a, b=b) == pytest.approx(3.0)
    # canberra: |1-4|/5 + |2-0|/2 + 0/6
    assert _one(spark, "canberra(a, b)", a=a, b=b) == pytest.approx(
        3 / 5 + 1.0 + 0.0
    )
    # earthMovers: emd1=-3, emd2=-3+2=-1, emd3=-1+0=-1 -> 3+1+1
    assert _one(spark, "earthMovers(a, b)", a=a, b=b) == pytest.approx(5.0)
    assert _one(spark, "distance(a, b)", a=a, b=b) == pytest.approx(
        float(np.linalg.norm(an - bn))
    )
    assert _one(spark, "distance(a, b, manhattan())", a=a, b=b) == pytest.approx(5.0)
    assert _one(spark, "meanDifference(a, b)", a=a, b=b) == pytest.approx(
        float(np.mean(an - bn))
    )
    assert _one(spark, "sumDifference(a, b)", a=a, b=b) == pytest.approx(
        float(np.sum(an - bn))
    )


def test_moving_windows(spark):
    a = [1.0, 2.0, 6.0, 4.0, 10.0]
    # movingMedian window 3: med(1,2,6)=2, med(2,6,4)=4, med(6,4,10)=6
    assert _one(spark, "movingMedian(a, 3)", a=a) == [2.0, 4.0, 6.0]
    # movingMAD window 3: mean|x-mean| per window
    w1 = np.mean(np.abs(np.array([1, 2, 6]) - 3.0))
    w2 = np.mean(np.abs(np.array([2, 6, 4]) - 4.0))
    w3 = np.mean(np.abs(np.array([6, 4, 10]) - 20 / 3))
    assert _one(spark, "movingMAD(a, 3)", a=a) == pytest.approx([w1, w2, w3])
    # expMovingAvg: seed mean(1,2,6)=3; alpha=2/4=.5
    # then v=4: 3+.5(4-3)=3.5 ; v=10: 3.5+.5(10-3.5)=6.75
    assert _one(spark, "expMovingAvg(a, 3)", a=a) == pytest.approx(
        [3.0, 3.5, 6.75]
    )
    assert _one(spark, "expMovingAvg(a, 3, 0.9)", a=a) == pytest.approx(
        [3.0, 3.0 + 0.9 * 1.0, 3.9 + 0.9 * (10 - 3.9)]
    )


def test_pairsort(spark):
    x, y = [3.0, 1.0, 2.0], [30.0, 10.0, 20.0]
    got = _one(spark, "pairSort(x, y)", x=x, y=y)
    assert got[0] == [1.0, 2.0, 3.0]
    assert got[1] == [10.0, 20.0, 30.0]


def test_matrix_algebra(spark):
    env = dict(
        r1=[1.0, 2.0], r2=[3.0, 4.0], r3=[5.0, 6.0]
    )
    m = "matrix(r1, r2, r3)"  # 3x2
    assert _one(spark, f"rowCount({m})", **env) == 3
    assert _one(spark, f"columnCount({m})", **env) == 2
    assert _one(spark, f"rowAt({m}, 1)", **env) == [3.0, 4.0]
    assert _one(spark, f"colAt({m}, 1)", **env) == [2.0, 4.0, 6.0]
    assert _one(spark, f"transpose({m})", **env) == [
        [1.0, 3.0, 5.0],
        [2.0, 4.0, 6.0],
    ]
    assert _one(spark, f"sumRows({m})", **env) == [3.0, 7.0, 11.0]
    assert _one(spark, f"sumColumns({m})", **env) == [9.0, 12.0]
    assert _one(spark, f"grandSum({m})", **env) == 21.0
    # (3x2) @ (2x3) -> 3x3; B = transpose(M)
    got = _one(spark, f"matrixMult({m}, transpose({m}))", **env)
    want = np.array([[1, 2], [3, 4], [5, 6]]) @ np.array([[1, 2], [3, 4], [5, 6]]).T
    assert np.allclose(np.array(got), want)


def test_describe_freqtable_hist(spark):
    a = [1.0, 2.0, 2.0, 3.0, 10.0]
    d = _one(spark, "describe(a)", a=a)
    assert d["N"] == 5 and d["min"] == 1.0 and d["max"] == 10.0
    assert d["mean"] == pytest.approx(3.6)
    assert d["stdev"] == pytest.approx(float(np.std(a, ddof=1)))
    ft = _one(spark, "freqTable(a)", a=a)
    assert [(r["value"], r["count"]) for r in ft] == [
        (1.0, 1), (2.0, 2), (3.0, 1), (10.0, 1)
    ]
    assert ft[1]["pct"] == pytest.approx(40.0)
    assert ft[2]["cumFreq"] == 4
    h = _one(spark, "hist(a, 3)", a=a)
    # bins [1,4),[4,7),[7,10]: counts 4,0,1
    assert [r["N"] for r in h] == [4, 0, 1]
    assert h[0]["mean"] == pytest.approx(2.0)
    assert h[1]["mean"] is None


def test_regress_predict_residuals(spark):
    x = [1.0, 2.0, 3.0, 4.0, 5.0]
    y = [2.1, 3.9, 6.2, 8.0, 9.9]
    m = _one(spark, "regress(x, y)", x=x, y=y)
    sl, ic = np.polyfit(np.array(x), np.array(y), 1)
    assert m["slope"] == pytest.approx(float(sl))
    assert m["intercept"] == pytest.approx(float(ic))
    assert m["R"] == pytest.approx(float(np.corrcoef(x, y)[0, 1]))
    p = _one(spark, "predict(regress(x, y), 6)", x=x, y=y)
    assert p == pytest.approx(float(ic + sl * 6))
    # array form through an array-producing call
    pa = _one(spark, "predict(regress(x, y), array(6, 7))", x=x, y=y)
    assert pa == pytest.approx([float(ic + sl * 6), float(ic + sl * 7)])
    res = _one(spark, "residuals(regress(x, y), x, y)", x=x, y=y)
    assert res == pytest.approx(
        list(np.array(y) - (ic + sl * np.array(x))), abs=1e-9
    )


def test_binomial_coefficient(spark):
    assert _one(spark, "binomialCoefficient(10, 3)") == 120.0
    assert _one(spark, "binomialCoefficient(52, 5)") == 2598960.0
