"""Evaluator tranche 7c: function values (interpolators/fitters/
simulators), geometry, and the remaining scalar names.

Reference classes (solrj io/eval): LerpEvaluator, SplineEvaluator,
AkimaEvaluator, LoessEvaluator, DerivativeEvaluator, IntegrateEvaluator,
OscillateEvaluator, GaussFitEvaluator, HarmonicFitEvaluator,
KnnRegressionEvaluator, MarkovChainEvaluator, FuzzyKmeansEvaluator,
OutliersEvaluator, ConvexHullEvaluator + accessors,
EnclosingDiskEvaluator + accessors, FactorialEvaluator, CopyOfEvaluator,
PrimesEvaluator, ConversionEvaluator, GetValueEvaluator, CellStream.
"""

import math

import numpy as np
import pytest

from solr_spark.plans.streamexpr import eval_expr


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


def test_scalar_tail(spark):
    assert _one(spark, "factorial(5)") == 120.0
    assert _one(spark, "copyOf(a, 2)", a=[1.0, 2.0, 3.0]) == [1.0, 2.0]
    assert _one(spark, "copyOf(a, 5)", a=[1.0, 2.0, 3.0]) == [1.0, 2.0, 3.0, 0.0, 0.0]
    assert _one(spark, "primes(4, 10)") == [11.0, 13.0, 17.0, 19.0]
    assert _one(spark, 'convert("miles", "kilometers", 10)') == pytest.approx(
        16.09344
    )
    assert _one(spark, 'convert("inches", "centimeters", 2)') == pytest.approx(5.08)
    assert _one(
        spark, 'dateTime("2024-03-05 07:08:09", "yyyy-MM-dd HH")'
    ) == "2024-03-05 07"


def test_interpolators_predict(spark):
    x = list(np.linspace(0, 10, 21))
    y = [v * v for v in x]
    assert _one(spark, "predict(lerp(x, y), 3.25)", x=x, y=y) == pytest.approx(
        (9.0 + 12.25) / 2
    )
    assert _one(spark, "predict(spline(x, y), 3.3)", x=x, y=y) == pytest.approx(
        3.3**2, abs=1e-2
    )
    assert _one(spark, "predict(akima(x, y), 4.7)", x=x, y=y) == pytest.approx(
        4.7**2, abs=5e-2
    )
    assert _one(spark, "predict(loess(x, y), 5.0)", x=x, y=y) == pytest.approx(
        25.0, abs=2.0
    )
    # array form maps element-wise
    got = _one(spark, "predict(lerp(x, y), array(1.0, 2.0))", x=x, y=y)
    assert got == pytest.approx([1.0, 4.0])
    # derivative of spline(x^2) at 3 ~ 6
    assert _one(
        spark, "predict(derivative(spline(x, y)), 3.0)", x=x, y=y
    ) == pytest.approx(6.0, abs=0.05)
    # integral of lerp(x^2) over [0, 10] ~ 1000/3 (trapezoid bias ok)
    assert _one(spark, "integral(lerp(x, y), 0, 10)", x=x, y=y) == pytest.approx(
        1000 / 3, rel=1e-2
    )


def test_oscillate_and_fits(spark):
    m = _one(spark, "oscillate(2, 0.5, 1)")
    assert m["ftype"] == "oscillate" and len(m["y"]) == 128
    assert m["y"][0] == pytest.approx(2 * math.sin(1))
    assert _one(spark, "predict(oscillate(2, 0.5, 1), 3)") == pytest.approx(
        2 * math.sin(0.5 * 3 + 1)
    )
    xs = list(np.linspace(-5, 5, 101))
    ys = [3.0 * math.exp(-((v - 1.2) ** 2) / (2 * 0.8**2)) for v in xs]
    g = _one(spark, "gaussfit(x, y)", x=xs, y=ys)
    assert g["params"][0] == pytest.approx(3.0, abs=1e-5)
    assert g["params"][1] == pytest.approx(1.2, abs=1e-5)
    ys2 = [2.5 * math.sin(0.7 * v + 0.3) for v in xs]
    h = _one(spark, "harmfit(x, y)", x=xs, y=ys2)
    assert h["params"][0] == pytest.approx(2.5, abs=1e-3)
    assert h["params"][1] == pytest.approx(0.7, abs=1e-3)
    assert _one(
        spark, "getValue(oscillate(2, 0.5, 1), \"ftype\")"
    ) == "oscillate"


def test_knn_regress_markov_fuzzy(spark):
    got = _one(
        spark,
        "predict(knnRegress(m, y, 2), array(0.4))",
        m=[[0.0], [1.0], [10.0]],
        y=[0.0, 2.0, 100.0],
    )
    assert got == 1.0
    s = _one(spark, "sample(markovChain(m), 4)", m=[[0.0, 1.0], [1.0, 0.0]])
    assert s == [1.0, 0.0, 1.0, 0.0]
    fk = _one(
        spark, "fuzzyKmeans(m, 2)",
        m=[[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]],
    )
    assert fk["clusters"][0] == fk["clusters"][1] != fk["clusters"][2]
    mm = _one(
        spark, "getMembershipMatrix(fuzzyKmeans(m, 2))",
        m=[[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]],
    )
    assert len(mm) == 4 and all(abs(sum(r) - 1.0) < 1e-9 for r in mm)


def test_outliers(spark):
    out = _one(
        spark,
        "outliers(normalDistribution(0, 1), a, 0.05, 0.95)",
        a=[0.0, -4.0, 0.5, 6.0],
    )
    assert [o["idx"] for o in out] == [1, 3]
    assert out[0]["cumulativeProbability"] < 0.001


def test_geometry(spark):
    sq = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.5, 0.5]]
    h = _one(spark, "convexHull(m)", m=sq)
    assert len(h["vertices"]) == 4
    assert h["area"] == pytest.approx(1.0)
    assert h["boundarySize"] == pytest.approx(4.0)
    assert _one(spark, "getArea(convexHull(m))", m=sq) == pytest.approx(1.0)
    assert _one(spark, "getBaryCenter(convexHull(m))", m=sq) == pytest.approx(
        [0.5, 0.5]
    )
    d = _one(spark, "enclosingDisk(m)", m=[[0.0, 0.0], [2.0, 0.0], [1.0, 1.0]])
    assert d["radius"] == pytest.approx(1.0)
    assert d["center"] == pytest.approx([1.0, 0.0])
    assert _one(
        spark, "getRadius(enclosingDisk(m))", m=[[0.0, 0.0], [2.0, 0.0]]
    ) == pytest.approx(1.0)
    proj = _one(
        spark,
        "projectToBorder(enclosingDisk(m), matrix(p1))",
        m=[[0.0, 0.0], [2.0, 0.0]],
        p1=[1.0, 0.5],
    )
    # center (1,0) r=1; point (1,0.5) -> (1, 1)
    assert proj[0] == pytest.approx([1.0, 1.0])


def test_cell_stream(spark, ):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = eval_expr('cell("rows", search(t))', {"t": df})
    row = out.collect()[0]
    assert len(row["rows"]) == 2
    assert sorted(r["s"] for r in row["rows"]) == ["a", "b"]


def test_labeled_matrix_family(spark):
    docs = spark.createDataFrame(
        [
            ("d1", ["spark", "hash", "join", "spark"]),
            ("d2", ["spark", "merge", "sortx"]),
            ("d3", ["python", "arrow", "hash"]),
            ("d4", ["window", "frame", "rows"]),
        ],
        "id string, terms array<string>",
    )
    t = {"docs": docs}
    tv = eval_expr(
        'select(cell("c", search(docs)), '
        'termVectors(c, minTermLength=4, minDocFreq=0.1, maxDocFreq=0.9)'
        " as tv)",
        t,
    ).collect()[0]["tv"]
    # df: spark 2/4=.5, hash 2/4=.5, others 1/4=.25 -> all within band,
    # but len>=4 drops nothing here (all words >= 4 chars)
    assert tv["rowLabels"] == ["d1", "d2", "d3", "d4"]
    assert "hash" in tv["colLabels"] and "spark" in tv["colLabels"]
    import math as m

    si = tv["colLabels"].index("spark")
    # d1 has tf(spark)=2, df=2, n=4 -> sqrt(2)*(ln(5/3)+1)
    assert tv["matrix"][0][si] == pytest.approx(
        m.sqrt(2) * (m.log(5 / 3) + 1)
    )
    top = eval_expr(
        'select(cell("c", search(docs)), topFeatures(termVectors(c, '
        "minTermLength=4, minDocFreq=0.1, maxDocFreq=0.9), 1) as tf)",
        t,
    ).collect()[0]["tf"]
    assert len(top) == 4 and all(len(r) == 1 for r in top)
    labels = eval_expr(
        'select(cell("c", search(docs)), getRowLabels(termVectors(c)) as rl)',
        t,
    ).collect()[0]["rl"]
    assert labels == ["d1", "d2", "d3", "d4"]


def test_pivot_latlon_mvnormal(spark):
    rows = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
        "g string, h string, v double",
    )
    pv = eval_expr(
        'select(cell("c", search(rows)), pivot(c, "g", "h", "v") as p)',
        {"rows": rows},
    ).collect()[0]["p"]
    assert pv["rowLabels"] == ["a", "b"] and pv["colLabels"] == ["x", "y"]
    assert pv["matrix"] == [[1.0, 2.0], [3.0, 0.0]]

    geo = spark.createDataFrame(
        [("p1", "45.5,-122.6"), ("p2", "37.7,-122.4")], "id string, loc string"
    )
    ll = eval_expr(
        'select(cell("c", search(geo)), latlonVectors(c, field="loc") as m)',
        {"geo": geo},
    ).collect()[0]["m"]
    assert ll["matrix"][0] == pytest.approx([45.5, -122.6])
    assert ll["colLabels"] == ["lat", "lon"]

    s = _one(
        spark,
        "sample(multiVariateNormalDistribution(array(0, 10), m), 200)",
        m=[[1.0, 0.0], [0.0, 1.0]],
    )
    import numpy as np

    arr = np.array(s)
    assert arr.shape == (200, 2)
    assert abs(arr[:, 0].mean()) < 0.3 and abs(arr[:, 1].mean() - 10) < 0.3


def test_fit_accessors(spark):
    assert _one(spark, "getAmplitude(oscillate(2, 0.5, 1))") == 2.0
    assert _one(spark, "getAngularFrequency(oscillate(2, 0.5, 1))") == 0.5
    assert _one(spark, "getPhase(oscillate(2, 0.5, 1))") == 1.0
