"""FreeText suggester (Lucene FreeTextSuggester role): n-gram model +
stupid-backoff suggestions."""

import pytest

from solr_spark.operators.relevance import freetext_model, suggest_freetext


@pytest.fixture(scope="module")
def model(spark):
    docs = spark.createDataFrame(
        [
            ("hash join beats hash aggregate",),
            ("hash join wins again",),
            ("hash jam tomorrow",),
            ("merge join sometimes",),
        ],
        "text string",
    )
    return freetext_model(docs, "text").persist()


def test_bigram_counts(model):
    rows = {
        (r["context"], r["word"]): r["cnt"]
        for r in model.where("order = 2").collect()
    }
    assert rows[("hash", "join")] == 2
    assert rows[("hash", "jam")] == 1
    assert rows[("hash", "aggregate")] == 1


def test_suggest_open_context(spark, model):
    got = suggest_freetext(model, "hash ").collect()
    words = [r["word"] for r in got]
    assert words[0] == "join"  # 2/4 continuations
    assert got[0]["score"] == pytest.approx(0.5)
    assert set(words) == {"join", "jam", "aggregate"}


def test_suggest_prefix(spark, model):
    got = suggest_freetext(model, "hash j").collect()
    assert [r["word"] for r in got] == ["join", "jam"]
    # scores stay conditioned on the FULL context distribution
    assert got[0]["score"] == pytest.approx(2 / 4)
    assert got[1]["score"] == pytest.approx(1 / 4)


def test_trigram_beats_bigram(spark, model):
    got = suggest_freetext(model, "merge join s").collect()
    # trigram context "merge join" -> "sometimes"
    assert got[0]["word"] == "sometimes"
    assert got[0]["score"] == pytest.approx(1.0)


def test_backoff(spark, model):
    # context "zzz hash": trigram context "zzz hash" unseen -> backoff
    # to bigram "hash" with alpha penalty
    got = suggest_freetext(model, "zzz hash j").collect()
    assert got[0]["word"] == "join"
    assert got[0]["score"] == pytest.approx(0.4 * 2 / 4)


def test_no_match(spark, model):
    assert suggest_freetext(model, "qqqq zz").count() == 0
