"""IGain/TextLogit (pyspark.ml) + block join semantics."""

import pytest
from pyspark.sql import functions as F

from solr_spark.operators import blockjoin as BJ
from solr_spark.operators.ml import igain_terms, textlogit_classify


@pytest.fixture(scope="module")
def labeled_corpus(spark):
    """200 docs: positives contain 'signal' terms, negatives 'noise';
    both share filler vocabulary."""
    rows = []
    for i in range(200):
        pos = i % 2 == 0
        toks = ["the", "a", "filler", f"junk{i % 7}"]
        toks += ["signal", "marker"] if pos else ["noise", "static"]
        rows.append((i, toks, 1 if pos else 0))
    df = spark.createDataFrame(rows, "docid long, toks array<string>, label int")
    return df.select("docid", "toks"), df.select("docid", "label")


def test_igain_picks_discriminative_terms(labeled_corpus):
    toks, labels = labeled_corpus
    top = igain_terms(toks, labels, limit=4, min_df=5).collect()
    top_terms = {r.term for r in top}
    # the four perfectly-splitting terms carry IG = H(0.5) = 1.0
    assert top_terms == {"signal", "marker", "noise", "static"}
    assert all(abs(r.igain - 1.0) < 1e-6 for r in top)


def test_igain_useless_terms_score_zero(labeled_corpus):
    toks, labels = labeled_corpus
    allt = igain_terms(toks, labels, limit=100, min_df=5).collect()
    by_term = {r.term: r.igain for r in allt}
    # filler appears everywhere -> excluded (df == n); junk terms split
    # nothing -> IG ~ 0
    assert "filler" not in by_term and "the" not in by_term
    assert all(abs(by_term[f"junk{j}"]) < 0.05 for j in range(7))


def test_textlogit_separates_classes(labeled_corpus):
    toks, labels = labeled_corpus
    conf = textlogit_classify(
        toks, labels, ["signal", "marker", "noise", "static"]
    ).collect()
    correct = sum(r.cnt for r in conf if r.label == r.prediction)
    total = sum(r.cnt for r in conf)
    assert correct / total >= 0.99  # perfectly separable


def test_ltr_rescore_orders_by_model(spark, labeled_corpus):
    from solr_spark.operators.ml import ltr_rescore, textlogit_train

    toks, labels = labeled_corpus
    model, _ = textlogit_train(toks, labels, ["signal", "noise"])
    cands = toks.select(
        "docid",
        F.array_contains("toks", "signal").cast("double").alias("f_0"),
        F.array_contains("toks", "noise").cast("double").alias("f_1"),
    ).limit(40)
    # the model was trained on features named f_0/f_1 via textlogit_train
    top = ltr_rescore(cands, model, ["f_0", "f_1"], k=10).collect()
    assert len(top) == 10
    labs = {r.docid: r.label for r in labels.collect()}
    # all top-rescored docs are positives (perfectly separable)
    assert all(labs[r.docid] == 1 for r in top)
    scores = [r.ltr_score for r in top]
    assert scores == sorted(scores, reverse=True)


def test_reduce_groups_arbitrary_operation(spark):
    """reduce() with a non-SQL group operation: per-group trimmed mean."""
    import pandas as pd

    from solr_spark.operators.streams import reduce_groups

    rows = [(g, float(v)) for g in ("a", "b") for v in range(10)]
    rows.append(("a", 1000.0))  # outlier the trim must drop
    df = spark.createDataFrame(rows, "g string, v double")

    def trimmed_mean(key, pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["v"].sort_values()
        trim = max(1, len(s) // 10)
        return pd.DataFrame({"g": [key[0]], "tmean": [s.iloc[trim:-trim].mean()]})

    got = {r.g: r.tmean for r in reduce_groups(df, ["g"], trimmed_mean, "g string, tmean double").collect()}
    assert abs(got["a"] - 5.0) < 1e-9  # outlier trimmed
    assert abs(got["b"] - 4.5) < 1e-9


def test_blockjoin_parent_child_roundtrip(spark):
    parents = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "A")], "pid long, pclass string"
    )
    children = spark.createDataFrame(
        [(1, 10), (1, 60), (2, 5), (3, 70), (3, 80)], "pid long, v long"
    )
    # {!parent}: parents with a child v > 50 -> 1 and 3
    got = sorted(
        r.pid for r in BJ.parent_query(parents, children, "pid", F.col("v") > 50).collect()
    )
    assert got == [1, 3]
    # {!child}: children of class-A parents -> pids 1,1,3,3
    kids = sorted(
        (r.pid, r.v)
        for r in BJ.child_query(parents, children, "pid", F.col("pclass") == "A").collect()
    )
    assert kids == [(1, 10), (1, 60), (3, 70), (3, 80)]
    # uniqueBlock: distinct parents per bucket of v>=50 children
    ub = {r[0]: r[1] for r in BJ.unique_block(
        children.where("v >= 50").withColumn("bucket", F.lit("x")), "bucket", "pid"
    ).collect()}
    assert ub == {"x": 2}


def test_model_store_load_classify(spark, tmp_path):
    """Train in one session, classify in ANOTHER from the stored parquet
    (ModelStream.java:49 role): classify_stored needs only the
    (term, weight) parquet - no pyspark.ml objects - and must reproduce
    the trained model's probabilities and predictions."""
    from solr_spark.operators.ml import (
        classify_stored, model_store, textlogit_train,
    )
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    rows = [
        (i, (["spam", "buy", "now"] if i % 2 else ["ham", "hello", "friend"])
            + [f"w{i % 7}"], float(i % 2))
        for i in range(80)
    ]
    tok = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "docid long, toks array<string>"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "docid long, label double"
    )
    feats = ["spam", "buy", "ham", "hello", "w3"]
    model, assembled = textlogit_train(tok, labels, feats)
    path = str(tmp_path / "model")
    model_store(model, feats, path, spark)

    # a FRESH session state scores from the parquet alone
    s2 = spark.newSession()
    tok2 = s2.createDataFrame(
        [(i, t) for i, t, _ in rows], "docid long, toks array<string>"
    )
    got = {r["docid"]: r for r in classify_stored(tok2, s2, path).collect()}

    exp_rows = model.transform(assembled).select(
        "docid", vector_to_array(F.col("probability")).getItem(1).alias("p"),
        "prediction",
    ).collect()
    for r in exp_rows:
        g = got[r["docid"]]
        assert abs(g["prob"] - r["p"]) < 1e-6, r["docid"]
        assert g["prediction"] == int(r["prediction"])
    # perfect separation on this toy set
    assert all(g["prediction"] == i % 2 for i, g in got.items())


def test_childfield_pick_and_missing(spark):
    """childfield(field): per-parent child value with explicit pick
    (max_by on (order_by, field) — deterministic under ties); parents
    with no matching child carry null."""
    from solr_spark.operators import blockjoin as BJ

    parents = spark.createDataFrame([(1,), (2,), (3,)], "pid long")
    children = spark.createDataFrame(
        [(1, 10.0, 5.0), (1, 20.0, 9.0), (1, 30.0, 9.0),  # qty tie -> max price
         (2, 40.0, 1.0)],                                  # filtered out below
        "pid long, price double, qty double",
    )
    out = {
        r["pid"]: r["childfield"]
        for r in BJ.childfield(
            parents, children, "pid", field="price",
            child_pred=F.col("qty") >= 2.0, order_by="qty",
        ).collect()
    }
    assert out == {1: 30.0, 2: None, 3: None}
    lo = {
        r["pid"]: r["childfield"]
        for r in BJ.childfield(
            parents, children, "pid", field="price",
            order_by="qty", descending=False,
        ).collect()
    }
    assert lo[2] == 40.0 and lo[1] == 10.0
