"""Round-5 serving layer: driver-side caches + query micro-batching.

Covers the interactive-latency work the round-4 study motivated:
- term-dictionary LRU on the Index handle (Lucene TermInfosReader cache
  analogue) incl. NEGATIVE entries, with maintenance invalidation;
- query-result cache (Solr queryResultCache,
  SolrIndexSearcher.java:123-124) with new-searcher semantics: a
  delete through the handle invalidates cached results;
- the inline CASE-WHEN scoring fast path == the broadcast-qrel join;
- QueryBatcher waves are rank-identical to per-query bm25_topk.
"""

import os
import sys
from concurrent.futures import ThreadPoolExecutor

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solr_spark.index.builder import build_index  # noqa: E402
from solr_spark.query import engine  # noqa: E402
from solr_spark.query.engine import bm25_topk  # noqa: E402
from solr_spark.query.serving import QueryBatcher, bm25_search  # noqa: E402
from solr_spark.sources.corpus import synthesize_corpus  # noqa: E402

N_DOCS = 600


@pytest.fixture(scope="module")
def corpus(spark):
    return synthesize_corpus(spark, N_DOCS, seed=11, partitions=4).persist()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srv") / "index")
    return build_index(
        spark, corpus, out, num_buckets=4, salt_threshold=100, num_salts=4
    )


def test_dict_lru_serves_repeat_seeks_without_spark(index):
    terms = ["return", "import", "zz_definitely_absent_zz"]
    first = index.term_stats_for(terms)
    assert "return" in first and "zz_definitely_absent_zz" not in first
    # the LRU now holds the hits AND the negative entry: a repeat seek
    # must not touch Spark at all — poison the dictionary frame to prove it
    saved = index.term_stats
    index.term_stats = lambda: (_ for _ in ()).throw(
        AssertionError("dictionary seek hit Spark on a warm cache")
    )
    try:
        again = index.term_stats_for(terms)
    finally:
        index.term_stats = saved
    assert again == first


def test_dict_lru_invalidated_by_maintenance(index):
    index.term_stats_for(["return"])
    assert index._dict_lru
    index.invalidate_caches()
    assert index._dict_lru is None and not index._df_cache


def test_query_result_cache_hit_and_delete_invalidation(spark, corpus, tmp_path):
    from solr_spark.index.maintenance import delete_by_ids

    idx = build_index(
        spark, corpus, str(tmp_path / "qr"), num_buckets=4,
        salt_threshold=100, num_salts=4,
    )
    rows1 = bm25_search(idx, "return import", k=5)
    rows2 = bm25_search(idx, "return import", k=5)
    assert rows2 is rows1  # identity => served from the LRU, no job ran
    top = rows1[0]["docid"]
    delete_by_ids(idx, [top])
    rows3 = bm25_search(idx, "return import", k=5)
    assert rows3 is not rows1  # new-searcher semantics: cache dropped
    assert all(r["docid"] != top for r in rows3)


def test_inline_fastpath_equals_qrel_join(index, monkeypatch):
    q = "return import self value data"
    fast = bm25_topk(index, q, k=12).collect()
    monkeypatch.setattr(engine, "QREL_INLINE_MAX", 0)  # force the join path
    join = bm25_topk(index, q, k=12).collect()
    assert [r["docid"] for r in fast] == [r["docid"] for r in join]
    for a, b in zip(fast, join):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)


def test_batcher_waves_match_per_query_topk(index):
    texts = [
        "return value", "import self", "data return import",
        "bufferSize", "jsonParser return", "self self value",
        "zz_definitely_absent_zz", "import", "value data self return",
    ]
    batcher = QueryBatcher(index, k=7, use_cache=False, max_wait_ms=15)
    try:
        with ThreadPoolExecutor(max_workers=6) as pool:
            served = list(pool.map(batcher.search, texts))
    finally:
        batcher.close()
    for text, rows in zip(texts, served):
        want = bm25_topk(index, text, k=7).collect()
        assert [r["docid"] for r in rows] == [w["docid"] for w in want], text
        for r, w in zip(rows, want):
            assert r["score"] == pytest.approx(w["score"], rel=1e-9)


def test_batcher_populates_result_cache(index):
    batcher = QueryBatcher(index, k=5, use_cache=True, max_wait_ms=5)
    try:
        rows = batcher.search("return data")
        # a follow-up bm25_search on the SAME handle key is a pure hit
        assert bm25_search(index, "return data", k=5) is rows
    finally:
        batcher.close()


def test_deletes_snapshot_cached_per_version(spark, corpus, tmp_path):
    from solr_spark.index.maintenance import delete_by_ids, expunge_deletes

    idx = build_index(
        spark, corpus, str(tmp_path / "delsnap"), num_buckets=4,
        salt_threshold=100, num_salts=4,
    )
    assert idx.deleted_rows_estimate() == 0
    delete_by_ids(idx, [0, 1])
    ids1 = idx.deleted_ids()
    assert idx.deleted_ids() is ids1  # same sidecar version -> memoized
    assert idx.deleted_rows_estimate() == 2
    delete_by_ids(idx, [2])
    assert idx.deleted_ids() is not ids1  # version bumped -> rebuilt
    assert {r["docid"] for r in idx.deleted_ids().collect()} == {0, 1, 2}
    # full lifecycle through the SAME handle: memoized table frames must
    # never serve stale listings across the expunge rewrite
    expunge_deletes(idx)
    assert not idx.has_deletes()
    assert bm25_topk(idx, "return", k=3).count() > 0
    assert 0 not in {r["docid"] for r in idx.docs().select("docid").collect()}


def test_pin_memory_rank_identical_and_unpinned_on_invalidate(spark, corpus, tmp_path):
    idx = build_index(
        spark, corpus, str(tmp_path / "pin"), num_buckets=4,
        salt_threshold=100, num_salts=4,
    )
    cold = bm25_topk(idx, "return import", k=8).collect()
    idx.pin_memory()
    assert len(idx._pinned) == 2
    hot = bm25_topk(idx, "return import", k=8).collect()
    assert [r["docid"] for r in hot] == [r["docid"] for r in cold]
    for a, b in zip(hot, cold):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)
    # idempotent: re-pinning must not double-persist
    idx.pin_memory()
    assert len(idx._pinned) == 2
    pinned = list(idx._pinned)
    idx.invalidate_caches()  # commit == cold searcher: pins released
    assert not idx._pinned
    for df in pinned:
        assert not df.storageLevel.useMemory


def test_mode_case_normalized_and_invalid_raises(spark, corpus, tmp_path):
    """mode='and' (any case) must give AND semantics — a lowercase mode
    silently scoring as OR is a wrong result set; unknown modes raise."""
    idx = build_index(spark, corpus, str(tmp_path / "mode"), num_buckets=4)
    assert bm25_topk(idx, "zz_definitely_absent_zz return", k=5, mode="and").count() == 0
    upper = {r["docid"] for r in bm25_topk(idx, "return import", k=8, mode="AND").collect()}
    lower = {r["docid"] for r in bm25_topk(idx, "return import", k=8, mode="and").collect()}
    assert upper == lower and upper
    with pytest.raises(ValueError):
        bm25_topk(idx, "return", k=5, mode="XOR")
