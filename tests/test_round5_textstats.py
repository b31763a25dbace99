"""Round-5 textstats additions: deterministic corpus mixing +
within-doc repetition signals (Gopher-style quality filters)."""

from pyspark.sql import functions as F

from solr_spark.operators import textstats as TS

RATES = {"0": 1.0, "1": 0.0, "2": 0.5}


def _docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_mix_sample_rates_and_bounds(spark):
    kept = TS.mix_sample(_docs(spark), "doc_id", "grp", RATES, default=0.25)
    by_grp = {
        r["grp"]: r["n"]
        for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert by_grp.get("0") == 500, "rate 1.0 must keep every row"
    assert "1" not in by_grp, "rate 0.0 must keep no rows"
    # md5 buckets are uniform; 500 draws at p=0.5 / p=0.25 stay well
    # inside these bounds
    assert 180 < by_grp.get("2", 0) < 320
    assert 60 < by_grp.get("3", 0) < 190


def test_mix_sample_partitioning_independent(spark):
    a = TS.mix_sample(_docs(spark), "doc_id", "grp", RATES, default=0.25)
    b = TS.mix_sample(
        _docs(spark).repartition(13), "doc_id", "grp", RATES, default=0.25
    )
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b


def test_repetition_signals_hand_case(spark):
    tok = spark.createDataFrame(
        [
            (0, ["a", "b", "a", "b", "c"]),  # bigrams: ab ba ab bc
            (1, ["x"]),  # too short: no bigrams
            (2, ["p", "q"]),  # one bigram, unique
        ],
        "docid long, toks array<string>",
    )
    out = {r["docid"]: r for r in TS.repetition_signals(tok).collect()}
    assert out[0]["n_bigrams"] == 4
    assert out[0]["top_bigram_frac"] == 0.5  # 'a b' twice of 4
    assert out[0]["dup_bigram_frac"] == 0.5  # the two 'a b' instances
    assert out[1]["n_bigrams"] == 0
    assert out[1]["top_bigram_frac"] == 0.0
    assert out[2]["n_bigrams"] == 1
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 1.0


def test_repetition_signals_parametric_n(spark):
    tok = spark.createDataFrame(
        [
            (0, ["a", "b", "c", "a", "b", "c"]),  # trigrams: abc bca cab abc
            (1, ["x", "y"]),  # too short for n=3
        ],
        "docid long, toks array<string>",
    )
    out = {r["docid"]: r for r in TS.repetition_signals(tok, n=3).collect()}
    assert out[0]["n_bigrams"] == 4
    assert out[0]["top_bigram_frac"] == 0.5  # 'a b c' twice of 4
    assert out[0]["dup_bigram_frac"] == 0.5
    assert out[1]["n_bigrams"] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        TS.repetition_signals(tok, n=1)
