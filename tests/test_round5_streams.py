"""Stream-expression tranche 6: the remaining data-plane stream types
(shuffle/export/sql/noop/calc/hashRollup/facet2D/recNum/parseCSV/cat/
cache family/knnSearch), each compiled to a Catalyst plan.

Reference classes: ShuffleStream, the /export handler, SqlHandler
(ParallelSQL), NoOpStream, CalculatorStream, HashRollupStream,
Facet2DStream, RecNumStream, CsvStream/TsvStream, CatStream,
put/get/remove/listCache (Lang.java registry), KnnStream.
"""

import pyspark.sql.functions as F
import pytest

from solr_spark.plans.streamexpr import StreamExprError, eval_expr


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], ["x", "y"][i % 2], float(i)) for i in range(30)],
        "id long, g string, h string, v double",
    )


def test_shuffle_export_are_search(spark, tbl):
    t = {"t": tbl}
    got = eval_expr('shuffle(t, q="g:a", fl="id,v", sort="id asc")', t).collect()
    want = eval_expr('search(t, q="g:a", fl="id,v", sort="id asc")', t).collect()
    assert got == want and len(got) == 10
    exp = eval_expr('export(t, fl="id", sort="id desc")', t).collect()
    assert [r["id"] for r in exp] == list(range(29, -1, -1))


def test_noop_identity(spark, tbl):
    t = {"t": tbl}
    assert (
        eval_expr('noop(search(t, q="g:b"))', t).collect()
        == eval_expr('search(t, q="g:b")', t).collect()
    )


def test_sql_stream(spark, tbl):
    t = {"t": tbl}
    got = eval_expr(
        'sql(stmt="SELECT g, count(*) AS n FROM t GROUP BY g ORDER BY g")', t
    ).collect()
    assert [(r["g"], r["n"]) for r in got] == [("a", 10), ("b", 10), ("c", 10)]


def test_calc_evaluator_source(spark, tbl):
    got = eval_expr("select(calc(), add(2, 3) as s, mult(4, 5) as p)", {"t": tbl})
    row = got.collect()[0]
    assert row["s"] == 5 and row["p"] == 20


def test_hash_rollup_matches_rollup(spark, tbl):
    t = {"t": tbl}
    a = eval_expr('sort(hashRollup(search(t), over="g", sum(v)), by="g asc")', t)
    b = eval_expr('sort(rollup(sort(search(t), by="g asc"), over="g", sum(v)), by="g asc")', t)
    assert a.collect() == b.collect()


def test_facet2d(spark, tbl):
    t = {"t": tbl}
    got = eval_expr(
        'facet2D(t, x="g", y="h", dimensions="2,1", count(*))', t
    ).collect()
    # 10 rows per g; x-buckets tie at 10 -> a,b picked; per x the top h
    assert len(got) == 2
    assert {r["g"] for r in got} <= {"a", "b", "c"}
    for r in got:
        assert r["count(*)"] == 5


def test_recnum(spark, tbl):
    t = {"t": tbl}
    got = eval_expr('recNum(search(t, q="g:a"), by="id desc")', t).collect()
    assert [r["recNum"] for r in got] == list(range(10))
    assert got[0]["id"] == 27  # highest id in g:a gets recNum 0


def test_cat_parsecsv(spark, tmp_path):
    p = tmp_path / "csv"
    p.mkdir()
    (p / "a.csv").write_text("k,v\n1,one\n2,two\n")
    t = {"_s": spark.range(1)}
    lines = eval_expr(f'cat("{p}")', t)
    assert lines.count() == 3 and set(lines.columns) == {"file", "line"}
    parsed = eval_expr(f'parseCSV(cat("{p}"))', t).orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in parsed] == [("1", "one"), ("2", "two")]


def test_parsecsv_stream_form(spark):
    df = spark.createDataFrame([("1|x",), ("2|y",)], "line string")
    got = eval_expr('parseCSV(search(raw), fields="a,b")', {"raw": df})
    # '|' is not the csv sep; use fields over comma -> rebuild with comma
    df2 = spark.createDataFrame([("1,x",), ("2,y",)], "line string")
    got = eval_expr('parseCSV(search(raw), fields="a,b")', {"raw": df2})
    assert sorted((r["a"], r["b"]) for r in got.collect()) == [("1", "x"), ("2", "y")]


def test_cache_family(spark, tbl):
    t = {"t": tbl}
    put = eval_expr('putCache("sp", "k1", search(t, q="g:a"))', t).collect()
    assert put[0]["cached"] == 10
    got = eval_expr('getCache("sp", "k1")', t)
    assert got.count() == 10
    keys = eval_expr('listCache("sp")', t).collect()
    assert [r["key"] for r in keys] == ["k1"]
    rm = eval_expr('removeCache("sp", "k1")', t).collect()
    assert rm[0]["removed"] == 1
    with pytest.raises(StreamExprError):
        eval_expr('getCache("sp", "k1")', t)


def test_knn_search(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark hash join merge"),
            (2, "spark hash join shuffle"),
            (3, "python pandas arrow"),
            (4, "spark hash merge window"),
        ],
        "id long, text string",
    )
    got = eval_expr('knnSearch(docs, id="1", qf="text", k=2)', {"docs": docs}).collect()
    ids = [r["id"] for r in got]
    assert 1 not in ids  # excludes the target
    assert set(ids) <= {2, 4}  # the docs sharing terms with doc 1
    assert got[0]["score"] >= got[-1]["score"]
