"""TaggerRequestHandler analogue (solr/core handler/tagger/Tagger.java):
dictionary phrase tagging with ALL and LONGEST_DOMINANT_RIGHT overlap
policies, verified against a hand-computed example and the DuckDB twin.
"""

import duckdb
import pytest

from solr_spark.operators.tagger import tag_text, tag_text_sql


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the hash join beats sort merge join here"),
            (2, "table scan then hash join then table scan"),
            (3, "nothing to see"),
            (4, "hash hash join"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def dictionary(spark):
    return spark.createDataFrame(
        [
            ("t_hj", "hash join"),
            ("t_smj", "sort merge join"),
            ("t_ts", "table scan"),
            ("t_hash", "hash"),
        ],
        "tag string, name string",
    )


def test_tag_all(spark, corpus, dictionary):
    got = sorted(
        (r["docid"], r["tag"], r["start_pos"], r["end_pos"])
        for r in tag_text(corpus, dictionary).collect()
    )
    # doc1: hash join @1-3, sort merge join @4-7, hash @1
    # doc2: table scan @0-2, hash join @3-5, table scan @6-8, hash @3
    # doc4: hash @0, hash @1, hash join @1-3
    assert got == [
        (1, "t_hash", 1, 2),
        (1, "t_hj", 1, 3),
        (1, "t_smj", 4, 7),
        (2, "t_hash", 3, 4),
        (2, "t_hj", 3, 5),
        (2, "t_ts", 0, 2),
        (2, "t_ts", 6, 8),
        (4, "t_hash", 0, 1),
        (4, "t_hash", 1, 2),
        (4, "t_hj", 1, 3),
    ]


def test_tag_longest_dominant_right(spark, corpus, dictionary):
    got = sorted(
        (r["docid"], r["tag"], r["start_pos"])
        for r in tag_text(
            corpus, dictionary, overlaps="LONGEST_DOMINANT_RIGHT"
        ).collect()
    )
    # doc1: smj (len3) wins, then hj (len2, no overlap with smj)
    # doc2: both table scans + hash join survive (hash @3 overlapped)
    # doc4: hash join wins over hash@1; hash@0 survives (no overlap)
    assert got == [
        (1, "t_hj", 1),
        (1, "t_smj", 4),
        (2, "t_hj", 3),
        (2, "t_ts", 0),
        (2, "t_ts", 6),
        (4, "t_hash", 0),
        (4, "t_hj", 1),
    ]


def test_tagger_duckdb_twin(spark, corpus, dictionary):
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    sql = tag_text_sql(
        dict_cte=(
            "dict(tag, name) AS (VALUES ('t_hj', 'hash join'), "
            "('t_smj', 'sort merge join'), ('t_ts', 'table scan'), "
            "('t_hash', 'hash'))"
        )
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    got = sorted(
        (r["docid"], r["tag"], r["start_pos"], r["end_pos"])
        for r in tag_text(corpus, dictionary).collect()
    )
    assert got == want


def test_tagger_plan_is_broadcast(spark, corpus, dictionary):
    plan = tag_text(corpus, dictionary)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
