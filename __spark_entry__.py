"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes the engine's operator surface (SURVEY.md §2) as
self-contained callables over the harness parquet tables; `oracle_sql()`
pairs each with DuckDB SQL generated from the SAME shared definitions
(analyzer regexes, SmallFloat table, BM25 constants, wordlists) so the
two sides agree exactly. Doubles that involve arithmetic are rounded to
4 decimals on both sides; big sums go through exact DECIMAL components
(solr_spark.functions.det) to be addition-order independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokens_sql
from solr_spark.functions.det import (
    davg_sql,
    dstddev_sql,
    dsum,
    dsum_sql,
)
from solr_spark.operators import collapse as C
from solr_spark.operators import dedup as D
from solr_spark.operators import facets as FA
from solr_spark.operators import relevance as R
from solr_spark.operators import similarity as SIM
from solr_spark.operators import streams as S
from solr_spark.operators import textstats as TS
from solr_spark.oracle import sqlgen as G
from solr_spark.query.inline import bm25_inline_topk, doc_tokens


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents")


def _tok(spark, sf_dir):
    return doc_tokens(_docs(spark, sf_dir), id_col="doc_id", text_col="text")


def _bm25(qtext, k=10, mode="OR"):
    def run(spark, sf_dir):
        return bm25_inline_topk(
            _docs(spark, sf_dir), qtext, k=k, mode=mode, id_col="doc_id", text_col="text"
        )

    return run


def _qvec(spark, sf_dir):
    row = (
        _t(spark, sf_dir, "embeddings").where(F.col("vec_id") == 0).head()
    )
    return [float(v) for v in row["embedding"]]


# ---------------------------------------------------------------- queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 with payload fetch on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    top = bm25_inline_topk(
        _docs(spark, sf_dir), "spark hash window merge", k=10,
        id_col="doc_id", text_col="text",
    )
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("docid"), "lang", "source", "n_chars"
    )
    return top.join(docs, "docid").orderBy(F.desc("score"), "docid")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable] = {}

    # --- BM25 / search core (SURVEY §2.A) ---
    q["bm25_topk_or"] = _bm25("spark hash window merge", 10)
    q["bm25_topk_and"] = _bm25("table spark vector", 10, "AND")
    q["bm25_single_head"] = _bm25("table", 10)
    q["bm25_topk100"] = _bm25("customer query group", 100)
    q["bm25_absent_term"] = _bm25("zzzqqqnope", 10)
    q["bm25_and_with_absent"] = _bm25("table zzzqqqnope", 10, "AND")
    q["bm25_dup_terms"] = _bm25("spark spark window", 10)

    # --- term dictionary / relevance ---
    q["terms_top_df"] = lambda s, d: R.terms_component(_tok(s, d), limit=20)
    q["significant_terms"] = lambda s, d: R.significant_terms(
        _tok(s, d), "spark", min_fg=3, limit=15
    )

    # --- facets & stats (SURVEY §2.B) ---
    q["facet_lang"] = lambda s, d: FA.terms_facet(_docs(s, d), "lang", limit=10)
    q["facet_source_min20"] = lambda s, d: FA.terms_facet(
        _docs(s, d), "source", limit=50, mincount=20
    )
    q["facet_range_events"] = lambda s, d: FA.range_facet(
        _t(s, d, "events"), "value", 0.0, 500.0, 50.0
    )
    q["facet_query_events"] = lambda s, d: FA.query_facet(
        _t(s, d, "events"),
        {
            "big_value": F.col("value") > 400.0,
            "clicks": F.col("event_type") == "click",
            "errors": F.col("event_type") == "error",
        },
    )
    q["facet_pivot_nation_segment"] = lambda s, d: FA.pivot_facet(
        _t(s, d, "customer").join(
            _t(s, d, "nation"), F.col("c_nationkey") == F.col("n_nationkey")
        ),
        ["n_name", "c_mktsegment"],
        limit=100,
    )
    q["stats_lineitem_price"] = lambda s, d: FA.stats_facet(
        _t(s, d, "lineitem"), "l_extendedprice"
    )

    # --- collapse / expand / grouping ---
    q["collapse_orders_by_cust"] = lambda s, d: C.collapse(
        _t(s, d, "orders"),
        "o_custkey",
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
    ).select("o_custkey", "o_orderkey", "o_totalprice").orderBy("o_custkey")
    q["grouping_top2_by_priority"] = lambda s, d: C.grouping(
        _t(s, d, "orders"),
        "o_orderpriority",
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        group_limit=2,
    ).select(
        "o_orderpriority",
        F.col("grp_rank").cast("long").alias("grp_rank"),
        "o_orderkey",
        "o_totalprice",
    ).orderBy("o_orderpriority", "grp_rank")

    # --- joins / set streams (SURVEY §2.C) ---
    q["join_semi_big_spenders"] = lambda s, d: S.intersect_on(
        _t(s, d, "customer"),
        _t(s, d, "orders").where(F.col("o_totalprice") > 490000).select(
            F.col("o_custkey").alias("c_custkey")
        ),
        ["c_custkey"],
    ).select("c_custkey", "c_name").orderBy("c_custkey")
    q["anti_join_no_orders"] = lambda s, d: S.complement_on(
        _t(s, d, "customer"),
        _t(s, d, "orders").select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"],
    ).select("c_custkey").orderBy("c_custkey")
    q["timeseries_events_daily"] = lambda s, d: S.timeseries(
        _t(s, d, "events"),
        "ts",
        "day",
        [F.count(F.lit(1)).alias("cnt"), dsum(F.col("value"), "sum_value")],
    )
    q["cursor_page_orders"] = lambda s, d: S.cursor_page(
        _t(s, d, "orders").select("o_orderkey", "o_totalprice"),
        [("o_totalprice", False), ("o_orderkey", True)],
        (400000.0, 0),
        10,
    )
    q["export_sorted_lineitem"] = lambda s, d: S.export_sorted(
        _t(s, d, "lineitem"),
        [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        ["l_orderkey", "l_linenumber", "l_quantity"],
    ).limit(500)

    # --- SQL surface (SURVEY §2.D) ---
    def tpch_q1(s, d):
        _t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
        return s.sql(
            f"""
            SELECT l_returnflag, l_linestatus,
                   {_SPARK_DSUM('l_quantity')} AS sum_qty,
                   {_SPARK_DSUM('l_extendedprice')} AS sum_base_price,
                   {_SPARK_DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem_v
            WHERE l_shipdate <= '1996-12-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
            """
        )

    q["sql_tpch_q1"] = tpch_q1

    # --- dedup / fingerprints (training-data ops) ---
    q["dedup_exact"] = lambda s, d: D.exact_duplicates(_docs(s, d), "doc_id", "text")
    q["dedup_minhash_sig"] = lambda s, d: D.minhash_signatures(
        _tok(s, d)
    ).orderBy("docid")
    q["dedup_lsh_pairs"] = lambda s, d: D.lsh_candidate_pairs(_tok(s, d))
    q["dedup_ngram_jaccard"] = lambda s, d: D.ngram_jaccard_pairs(
        _tok(s, d), n=3, top=20
    )
    q["simhash64"] = lambda s, d: D.simhash64(_tok(s, d)).orderBy("docid")

    # --- embedding similarity ---
    q["ann_cosine_topk"] = lambda s, d: SIM.cosine_topk(
        _t(s, d, "embeddings"), _qvec(s, d), k=10
    )
    q["ann_cosine_lsh"] = lambda s, d: SIM.cosine_topk_lsh(
        _t(s, d, "embeddings"), _qvec(s, d), k=10
    )

    # --- text analysis ---
    q["token_counts"] = lambda s, d: TS.token_counts(_tok(s, d))
    q["text_quality"] = lambda s, d: TS.quality_score(
        _docs(s, d), "doc_id", "text", _tok(s, d)
    )
    q["lang_id"] = lambda s, d: TS.lang_id(_tok(s, d))
    q["doc_fingerprint"] = lambda s, d: TS.fingerprint(_tok(s, d))

    return q


def _SPARK_DSUM(expr: str) -> str:
    return f"round(cast(sum(cast(({expr}) as decimal(30,6))) as double), 4)"


# ------------------------------------------------------------- oracle SQL

_DOC_TOKS_SQL = f"toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents)"
_POST_SQL = "post AS (SELECT DISTINCT docid, unnest(toks) AS term FROM toks)"


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["bm25_topk_or"] = G.bm25_sql("spark hash window merge", 10)
    o["bm25_topk_and"] = G.bm25_sql("table spark vector", 10, "AND")
    o["bm25_single_head"] = G.bm25_sql("table", 10)
    o["bm25_topk100"] = G.bm25_sql("customer query group", 100)
    o["bm25_absent_term"] = G.bm25_sql("zzzqqqnope", 10)
    o["bm25_and_with_absent"] = G.bm25_sql("table zzzqqqnope", 10, "AND")
    o["bm25_dup_terms"] = G.bm25_sql("spark spark window", 10)

    o["terms_top_df"] = G.terms_top_df_sql(20)
    o["significant_terms"] = G.significant_terms_sql("spark", 3, 15)

    o["facet_lang"] = """
        SELECT lang AS value, count(*) AS cnt FROM documents
        GROUP BY lang ORDER BY cnt DESC, value LIMIT 10"""
    o["facet_source_min20"] = """
        SELECT source AS value, count(*) AS cnt FROM documents
        GROUP BY source HAVING count(*) >= 20
        ORDER BY cnt DESC, value LIMIT 50"""
    o["facet_range_events"] = """
        SELECT 0.0 + floor((value - 0.0) / 50.0) * 50.0 AS bucket_start,
               count(*) AS cnt
        FROM events WHERE value >= 0.0 AND value < 500.0
        GROUP BY 1 ORDER BY bucket_start"""
    o["facet_query_events"] = """
        SELECT 'big_value' AS name, count(*) FILTER (value > 400.0) AS cnt FROM events
        UNION ALL
        SELECT 'clicks', count(*) FILTER (event_type = 'click') FROM events
        UNION ALL
        SELECT 'errors', count(*) FILTER (event_type = 'error') FROM events
        ORDER BY name"""
    o["facet_pivot_nation_segment"] = """
        SELECT n_name, c_mktsegment, count(*) AS cnt
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, c_mktsegment
        ORDER BY cnt DESC, n_name, c_mktsegment LIMIT 100"""
    o["stats_lineitem_price"] = f"""
        SELECT round(min(l_extendedprice), 4) AS min_v,
               round(max(l_extendedprice), 4) AS max_v,
               {dsum_sql('l_extendedprice')} AS sum_v,
               count(l_extendedprice) AS count_v,
               sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT AS missing_v,
               {davg_sql('l_extendedprice')} AS mean_v,
               {dstddev_sql('l_extendedprice')} AS stddev_v
        FROM lineitem"""

    o["collapse_orders_by_cust"] = """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
          ) AS rn FROM orders
        ) AS t WHERE rn = 1 ORDER BY o_custkey"""
    o["grouping_top2_by_priority"] = """
        SELECT o_orderpriority, rn AS grp_rank, o_orderkey, o_totalprice FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
          ) AS rn FROM orders
        ) AS t WHERE rn <= 2 ORDER BY o_orderpriority, rn"""

    o["join_semi_big_spenders"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 490000)
        ORDER BY c_custkey"""
    o["anti_join_no_orders"] = """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey"""
    o["timeseries_events_daily"] = f"""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
               count(*) AS cnt,
               {dsum_sql('value')} AS sum_value
        FROM events GROUP BY 1 ORDER BY bucket_ts"""
    o["cursor_page_orders"] = """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice < 400000.0
           OR (o_totalprice = 400000.0 AND o_orderkey > 0)
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""
    o["export_sorted_lineitem"] = """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 500"""

    o["sql_tpch_q1"] = f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql('l_quantity')} AS sum_qty,
               {dsum_sql('l_extendedprice')} AS sum_base_price,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= '1996-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""

    o["dedup_exact"] = """
        SELECT md5(text) AS sig, count(*) AS cnt, min(doc_id) AS min_id
        FROM documents GROUP BY md5(text) HAVING count(*) >= 2 ORDER BY sig"""

    minhash_cols = ",\n               ".join(
        f"min(md5('{i}' || ':' || term)) AS h{i}" for i in range(D.NUM_HASHES)
    )
    o["dedup_minhash_sig"] = f"""
        WITH {_DOC_TOKS_SQL}, {_POST_SQL}
        SELECT docid, {minhash_cols}
        FROM post GROUP BY docid ORDER BY docid"""

    band_exprs = []
    for bi in range(D.NUM_HASHES // D.BAND_SIZE):
        cols = "||'|'||".join(f"h{bi * D.BAND_SIZE + j}" for j in range(D.BAND_SIZE))
        band_exprs.append(f"({bi}, md5({cols}))")
    o["dedup_lsh_pairs"] = f"""
        WITH {_DOC_TOKS_SQL}, {_POST_SQL},
        sig AS (SELECT docid, {minhash_cols} FROM post GROUP BY docid),
        bands AS (
          SELECT docid, b.* FROM sig,
          LATERAL (VALUES {",".join(band_exprs)}) AS b(band_idx, band_hash)
        )
        SELECT DISTINCT x.docid AS a, y.docid AS b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
        WHERE x.docid < y.docid
        ORDER BY a, b"""

    o["dedup_ngram_jaccard"] = f"""
        WITH {_DOC_TOKS_SQL},
        sh AS (
          SELECT docid,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, len(toks) - 1)]) AS shingles
          FROM toks WHERE len(toks) >= 3
        ),
        sizes AS (SELECT docid, len(shingles) AS nsh FROM sh),
        ex AS (SELECT docid, unnest(shingles) AS s FROM sh),
        pairs AS (
          SELECT x.docid AS a, y.docid AS b, count(*) AS shared
          FROM ex x JOIN ex y ON x.s = y.s AND x.docid < y.docid
          GROUP BY x.docid, y.docid
        )
        SELECT a, b,
               round(shared::DOUBLE / (sa.nsh + sb.nsh - shared)::DOUBLE, 4) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.docid = a
        JOIN sizes sb ON sb.docid = b
        ORDER BY jaccard DESC, a, b LIMIT 20"""

    o["ann_cosine_topk"] = """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 4) AS sim
        FROM embeddings, q
        ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qv) DESC, vec_id
        LIMIT 10"""

    o["token_counts"] = TS.token_counts_sql()
    o["text_quality"] = TS.quality_score_sql()
    o["lang_id"] = TS.lang_id_sql()
    o["doc_fingerprint"] = TS.fingerprint_sql()

    # no oracle (rows-only check): ann_cosine_lsh (approximate recall path),
    # simhash64 (bit-vote SQL twin lands in a later round)
    return o
