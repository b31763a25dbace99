"""Block-max pruned path ≡ flat path (exactness of the pruning).

The reference's contract for its pruned collectors is that results match
unpruned search (MaxScoreCollectorTest.java et al.); here: wand == flat
== oracle on every query shape, plus evidence that pruning actually
skips blocks on mixed head+tail queries.
"""

import pytest
from pyspark.sql import functions as F

from solr_spark.index.builder import build_index
from solr_spark.query.engine import bm25_topk
from solr_spark.query.wand import bm25_topk_wand
from solr_spark.sources.corpus import synthesize_corpus

N_DOCS = 500

QUERIES = [
    ("return", "OR", 10),
    ("jsonParser", "OR", 10),
    ("import buffer size", "OR", 10),
    ("return import", "AND", 10),
    ("parse build read write", "OR", 25),
    ("httpClient userName", "AND", 10),
    ("return zzzNotAThing", "OR", 10),
    ("return zzzNotAThing", "AND", 10),
    ("return parseShard1 bufferSize", "OR", 5),   # head+tail pruning stress
    ("value data self import return", "OR", 50),
    ("utf8Parser2", "OR", 100),
]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    # tail_card=5000 gives true tail tokens (df ~ 10 of 500 docs);
    # block_size=16 so posting lists span many blocks at this corpus size
    # — the skip-demonstration below needs real idf spread + granularity
    corpus = synthesize_corpus(spark, N_DOCS, seed=42, partitions=4, tail_card=5000)
    out = str(tmp_path_factory.mktemp("wand") / "index")
    return build_index(
        spark, corpus, out, num_buckets=4, salt_threshold=200, num_salts=4,
        block_size=16,
    )


@pytest.mark.parametrize("qtext,mode,k", QUERIES)
def test_wand_equals_flat(index, qtext, mode, k):
    flat = [(r.docid, round(r.score, 9)) for r in bm25_topk(index, qtext, k, mode).collect()]
    wand = [(r.docid, round(r.score, 9)) for r in bm25_topk_wand(index, qtext, k, mode).collect()]
    assert wand == flat


@pytest.mark.parametrize("qtext,mode,k", QUERIES[:6])
def test_wand_distributed_path_equals_flat(index, monkeypatch, qtext, mode, k):
    """Force the over-budget (distributed) formulation: same results."""
    import solr_spark.query.wand as W

    monkeypatch.setattr(W, "DRIVER_DECODE_MAX_POSTINGS", 0)
    flat = [(r.docid, round(r.score, 9)) for r in bm25_topk(index, qtext, k, mode).collect()]
    wand = [(r.docid, round(r.score, 9)) for r in bm25_topk_wand(index, qtext, k, mode).collect()]
    assert wand == flat


def test_pruning_skips_work(index):
    """On a mixed head+tail OR query the head term (tiny idf -> tiny ub)
    must be classified non-essential: its posting blocks are skipped
    during candidate generation, and results stay exact."""
    dbg: dict = {}
    qtext, k = "return parseShard1 bufferSize", 5
    wand = [(r.docid, round(r.score, 9)) for r in bm25_topk_wand(index, qtext, k, debug=dbg).collect()]
    flat = [(r.docid, round(r.score, 9)) for r in bm25_topk(index, qtext, k).collect()]
    assert wand == flat
    assert dbg.get("essential"), dbg
    assert "return" not in dbg["essential"], dbg
    assert dbg["blocks_decoded"] < dbg["blocks_total"], dbg


def test_multifield_wand_equals_flat_and_single_field(spark, tmp_path):
    """Round-3: per-field block-max metadata (fid-aware encoder) — the
    pruned path must equal the flat path on EVERY field of a multi-field
    index, and the content field must score identically to a
    single-field index of the same column (per-field avgdl correct)."""
    from pyspark.sql import functions as F

    from solr_spark.index.builder import build_index
    from solr_spark.query.engine import bm25_topk
    from solr_spark.query.wand import bm25_topk_wand
    from solr_spark.sources.corpus import synthesize_corpus

    corpus = synthesize_corpus(spark, 1500, seed=5, partitions=4).withColumn(
        "title", F.concat_ws(" ", F.col("path"), F.col("lang"))
    )
    mf = build_index(
        spark, corpus.select("repo", "path", "commit", "content", "title"),
        str(tmp_path / "mf"), num_buckets=4, salt_threshold=400, num_salts=4,
        fields=["content", "title"], build_blocks=True,
    )
    assert mf.meta["has_blocks"]
    sf = build_index(
        spark, corpus.select("repo", "path", "commit", "content"),
        str(tmp_path / "sf"), num_buckets=4, salt_threshold=400, num_salts=4,
        build_blocks=True,
    )
    for q in ["jsonParser bufferSize", "return import", "parseShard7 return"]:
        for field in ["content", "title"]:
            flat = [(r.docid, round(r.score, 9))
                    for r in bm25_topk(mf, q, k=10, field=field).collect()]
            wand = [(r.docid, round(r.score, 9))
                    for r in bm25_topk_wand(mf, q, k=10, field=field).collect()]
            assert flat == wand, (q, field)
        mfc = [(r.docid, round(r.score, 9))
               for r in bm25_topk(mf, q, k=10, field="content").collect()]
        sfc = [(r.docid, round(r.score, 9))
               for r in bm25_topk(sf, q, k=10).collect()]
        assert mfc == sfc, q


def test_multifield_batch_equals_single(spark, tmp_path):
    """bm25_topk_batch(field=) on a multi-field index equals per-query
    bm25_topk(field=) for every query in the batch."""
    from pyspark.sql import functions as F

    from solr_spark.index.builder import build_index
    from solr_spark.query.engine import bm25_topk, bm25_topk_batch
    from solr_spark.sources.corpus import synthesize_corpus

    corpus = synthesize_corpus(spark, 800, seed=5, partitions=4).withColumn(
        "title", F.concat_ws(" ", F.col("path"), F.col("lang"))
    )
    mf = build_index(
        spark, corpus.select("repo", "path", "commit", "content", "title"),
        str(tmp_path / "mfb"), num_buckets=4, salt_threshold=400, num_salts=4,
        fields=["content", "title"],
    )
    queries = {"q1": "return import", "q2": "jsonParser", "q3": "java py"}
    for field in ("content", "title"):
        batch = bm25_topk_batch(mf, queries, k=6, field=field).collect()
        got = {}
        for r in batch:
            got.setdefault(r["qid"], []).append((r["docid"], round(r["score"], 9)))
        for qid, qt in queries.items():
            want = [(r["docid"], round(r["score"], 9))
                    for r in bm25_topk(mf, qt, k=6, field=field).collect()]
            assert got.get(qid, []) == want, (field, qid)
