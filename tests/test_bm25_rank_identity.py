"""Engine vs independent NumPy oracle: rank-identical top-k, score equality.

The golden-output contract of the reference's test suite
(assertQ/assertJQ with numeric delta,
solr/test-framework/src/java/org/apache/solr/SolrTestCaseJ4.java:953,1026)
re-expressed as engine ≡ oracle on a fixed query set; also the
distributed ≡ control contract
(solr/test-framework/src/java/org/apache/solr/BaseDistributedSearchTestCase.java)
since the oracle is single-node and the engine is partitioned.
"""

import pytest
from pyspark.sql import functions as F

from solr_spark.index.builder import build_index
from solr_spark.oracle.bm25_oracle import OracleIndex
from solr_spark.query.engine import bm25_topk
from solr_spark.sources.corpus import synthesize_corpus

N_DOCS = 400

QUERIES = [
    ("return", "OR", 10),            # head term
    ("return", "OR", 1),
    ("return", "OR", 100),
    ("jsonParser", "OR", 10),        # mid term, camelCase split
    ("json_parser", "OR", 10),       # delimiter variant — same tokens
    ("zzzNotAThing", "OR", 10),      # absent term -> empty
    ("import buffer size", "OR", 10),
    ("return import", "AND", 10),
    ("parse build read write", "OR", 25),
    ("httpClient userName", "AND", 10),
    ("return zzzNotAThing", "AND", 10),   # AND with absent -> empty
    ("return zzzNotAThing", "OR", 10),    # OR ignores absent
    ("return return import", "OR", 10),   # duplicate query term: qtf=2
    ("utf8Parser2", "OR", 10),
    ("UTF8PARSER2", "OR", 10),            # case variant
    ("value data self", "OR", 50),
]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    corpus = synthesize_corpus(spark, N_DOCS, seed=42, partitions=4).persist()
    out = str(tmp_path_factory.mktemp("bm25") / "index")
    index = build_index(spark, corpus, out, num_buckets=4, salt_threshold=150, num_salts=4)
    docs = (
        index.docs()
        .join(corpus, ["repo", "path", "commit"])
        .select("docid", "content")
        .collect()
    )
    oracle = OracleIndex.build([(r.docid, r.content) for r in docs])
    return index, oracle


def _assert_rank_identical(got, expect):
    assert len(got) == len(expect)
    for (gd, gs), (ed, es) in zip(got, expect):
        assert gs == pytest.approx(es, abs=1e-9)
    # rank identity with tolerance for float-sum ordering inside score ties:
    # docids must match exactly wherever scores are distinct beyond 1e-9
    for i, ((gd, gs), (ed, es)) in enumerate(zip(got, expect)):
        if gd != ed:
            assert abs(gs - es) < 1e-9 and abs(gs - expect[i][1]) < 1e-9, (
                f"rank {i}: {gd} != {ed} with distinct scores"
            )


@pytest.mark.parametrize("qtext,mode,k", QUERIES)
def test_rank_identity(setup, qtext, mode, k):
    index, oracle = setup
    got = [(r.docid, r.score) for r in bm25_topk(index, qtext, k=k, mode=mode).collect()]
    expect = oracle.search(qtext, k=k, mode=mode)
    _assert_rank_identical(got, expect)


def test_parallelism_metamorphic(setup, spark):
    """Same query at different shuffle parallelism -> identical results."""
    index, oracle = setup
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = [(r.docid, round(r.score, 9)) for r in bm25_topk(index, "import buffer size", 20).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        b = [(r.docid, round(r.score, 9)) for r in bm25_topk(index, "import buffer size", 20).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_payload_fetch(setup):
    index, _ = setup
    rows = bm25_topk(index, "return import", k=5, with_payload=True).collect()
    assert len(rows) == 5
    assert all(r.sha256 and r.repo for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
