"""Payload queries: DelimitedPayloadTokenFilter index side +
payload_score / payload_check (PayloadScoreQParserPlugin /
PayloadCheckQParserPlugin semantics) on a pinned-docid corpus."""

import pytest
from pyspark.sql import functions as F

from solr_spark.index.builder import build_index
from solr_spark.query.payloads import payload_check, payload_score

DOCS = {
    0: "a|1.0 b|2.0 c|3.0",
    1: "a|10.0 a|20.0 b",
    2: "b|5.0 a|7.0",
    3: "x|1.5 a|4.0 b|6.0 y",
}


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    rows = [
        (f"r{i}", f"p/{i}", f"c{i}", "en", text, i)
        for i, text in DOCS.items()
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
        "content string, docid long"
    )
    out = str(tmp_path_factory.mktemp("pay") / "index")
    return build_index(
        spark, corpus, out, num_buckets=4, build_blocks=False,
        build_positions=True, analyzer={"delimited_payloads": "|"},
    )


def _score(index, q, func):
    return {
        r["docid"]: r["score"] for r in payload_score(index, q, func).collect()
    }


def test_index_shape(index):
    assert index.meta["has_payloads"]
    pos = index.positions()
    assert "payload" in pos.columns
    # bare tokens (no payload) index with NULL payload at their position
    row = pos.where(
        (F.col("docid") == 1) & (F.col("pos") == 3)
    ).collect()[0]
    assert row["payload"] is None
    # terms are stripped of the delimiter+payload suffix
    terms = {r["term"] for r in index.term_stats().collect()}
    assert {"a", "b", "c", "x", "y"} <= terms
    assert not any("|" in t for t in terms)


def test_single_term_functions(index):
    assert _score(index, "a", "max") == {0: 1.0, 1: 20.0, 2: 7.0, 3: 4.0}
    assert _score(index, "a", "min") == {0: 1.0, 1: 10.0, 2: 7.0, 3: 4.0}
    assert _score(index, "a", "sum") == {0: 1.0, 1: 30.0, 2: 7.0, 3: 4.0}
    assert _score(index, "a", "average") == {0: 1.0, 1: 15.0, 2: 7.0, 3: 4.0}


def test_null_payloads_ignored_by_agg(index):
    # doc 1's bare 'b' has NULL payload -> matches with score 0
    # (Lucene PayloadFunction.docScore, numPayloadsSeen == 0)
    got = _score(index, "b", "max")
    assert got == {0: 2.0, 1: 0.0, 2: 5.0, 3: 6.0}


def test_multi_term_span(index):
    # 'a b' in-order adjacent spans: doc 0 (1,2), doc 1 (a@2 b@3, b's
    # payload NULL -> avg over {20.0}), doc 3 (4,6)
    got = _score(index, "a b", "avg")
    assert got == {0: 1.5, 1: 20.0, 3: 5.0}
    got = _score(index, "a b", "sum")
    assert got == {0: 3.0, 1: 20.0, 3: 10.0}


def test_absent_term_and_bad_func(index):
    assert _score(index, "zzz", "max") == {}
    with pytest.raises(ValueError):
        payload_score(index, "a", "median")


def test_payload_check_ops(index):
    def chk(q, pays, op="eq"):
        return {
            r["docid"]: r["n_spans"]
            for r in payload_check(index, q, pays, op).collect()
        }

    assert chk("a", [7.0]) == {2: 1}
    assert chk("a b", [1.0, 2.0]) == {0: 1}
    # doc 1's b payload is NULL -> predicate unknown -> span dropped
    assert chk("a b", [3.0, 5.0], op="gte") == {3: 1}
    assert chk("a", [5.0], op="lt") == {0: 1, 3: 1}
    with pytest.raises(ValueError):
        payload_check(index, "a", [1.0], op="ne")


def test_non_payload_index_rejects(spark, tmp_path):
    corpus = spark.createDataFrame(
        [("r", "p", "c", "en", "a b", 0)],
        "repo string, path string, commit string, lang string, "
        "content string, docid long",
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "plain"), num_buckets=2,
        build_blocks=False, build_positions=True,
    )
    with pytest.raises(ValueError):
        payload_score(idx, "a", "max")


def test_multifield_payloads_rejected(spark, tmp_path):
    corpus = spark.createDataFrame(
        [("a|1.0", "b|2.0", 0)], "f1 string, f2 string, docid long"
    )
    with pytest.raises(ValueError):
        build_index(
            spark, corpus, str(tmp_path / "mf"), num_buckets=2,
            fields=["f1", "f2"],
            analyzer={"delimited_payloads": "|"},
        )
