"""Full search execution: parsed query -> scored, filtered top-k.

The Spark shape of the reference's /select component pipeline
(solr/core/src/java/org/apache/solr/handler/component/SearchHandler.java:286
prepare/process; QueryComponent.java:133 parse, :328 execute):

- q clauses score (BM25); fq filters never score and are applied as
  cheap predicates/semi-joins BEFORE aggregation (the filter/query
  separation of search/SolrIndexSearcher.java:956);
- MUST / MUST_NOT via matched-count checks and an anti-join
  (BooleanQuery semantics, parser/SolrQueryParserBase.java);
- prefix/fuzzy expansions contribute constant score 1.0 per matching
  expansion (multiterm constant-score rewrite);
- two-phase payload fetch: stored columns join only the k winners
  (QueryComponent.java:1213 GET_FIELDS).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.functions.bm25 import idf_py, tf_part_col
from solr_spark.index.builder import Index
from solr_spark.plans.qparser import ParsedQuery, parse_query
from solr_spark.query.expand_ops import fuzzy_query, prefix_query


def _filter_pred(fname: str, op: str, val) -> Column:
    c = F.col(fname)
    if op == "eq":
        return c.cast("string") == str(val)
    if op == "prefix":
        return c.cast("string").startswith(str(val))
    if op == "range":
        lo, hi = val
        return (c >= lo) & (c <= hi)
    raise ValueError(op)


def search(
    index: Index,
    q: str,
    k: int = 10,
    with_payload: bool = False,
) -> DataFrame:
    """Execute a lucene-syntax query string against the index."""
    pq: ParsedQuery = parse_query(q)
    spark = index.spark
    scoring_terms: dict[str, int] = {}
    for t in pq.should + pq.must:
        for tok in _analyze_term(t):
            scoring_terms[tok] = scoring_terms.get(tok, 0) + 1
    must_terms = sorted({tok for t in pq.must for tok in _analyze_term(t)})

    parts: list[DataFrame] = []
    n_musts_present = 0
    if scoring_terms:
        stats = index.term_stats_for(list(scoring_terms))
        avgdl = float(index.meta["avgdl"])
        must_tids = {stats[t]["tid"] for t in must_terms if t in stats}
        n_musts_present = len(must_tids)
        if stats:
            qrel = spark.createDataFrame(
                [
                    (
                        s["tid"],
                        float(scoring_terms[t]),
                        idf_py(int(s["df"]), index.meta["n_docs"]),
                        1 if s["tid"] in must_tids else 0,
                    )
                    for t, s in stats.items()
                ],
                "tid long, qtf double, idf double, is_must int",
            )
            tids = [s["tid"] for s in stats.values()]
            scored = (
                index.postings()
                .where(F.col("bucket").isin(index.pbuckets_for(tids)))
                .where(F.col("tid").isin(tids))
                .join(F.broadcast(qrel), "tid")
                .select(
                    "docid",
                    (
                        F.col("qtf") * F.col("idf")
                        * tf_part_col(F.col("tf"), F.col("dl_q"), avgdl)
                    ).alias("contrib"),
                    "is_must",
                )
            )
            parts.append(
                scored.groupBy("docid").agg(
                    F.sum("contrib").alias("score"),
                    F.sum("is_must").alias("_musts"),
                )
            )
    for kind, text in pq.expansions:
        exp = prefix_query(index, text) if kind == "prefix" else fuzzy_query(index, text)
        parts.append(exp.withColumn("_musts", F.lit(0)))
    if not parts:
        if pq.filters or pq.must_not:
            # filter-only query (q=lang:java): all docs pass with constant
            # score, the filters below narrow it (MatchAllDocs * fq)
            agg = index.docs().select("docid", F.lit(1.0).alias("score"))
        else:
            agg = index.spark.createDataFrame([], "docid long, score double")
    else:
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        agg = merged.groupBy("docid").agg(
            F.sum("score").alias("score"), F.sum("_musts").alias("_musts")
        )
        if must_terms:
            if n_musts_present < len(must_terms):
                # a required term is absent from the index -> no results
                agg = agg.where(F.lit(False))
            else:
                agg = agg.where(F.col("_musts") == n_musts_present)
        agg = agg.select("docid", "score")

    if pq.must_not:
        ban_terms = sorted({tok for t in pq.must_not for tok in _analyze_term(t)})
        ban_stats = index.term_stats_for(ban_terms)
        ban_tids = [s["tid"] for s in ban_stats.values()]
        if ban_tids:
            banned = (
                index.postings()
                .where(F.col("bucket").isin(index.pbuckets_for(ban_tids)))
                .where(F.col("tid").isin(ban_tids))
                .select("docid")
                .distinct()
            )
            agg = agg.join(banned, "docid", "left_anti")

    if pq.filters:
        pred = None
        for fname, op, val in pq.filters:
            p = _filter_pred(fname, op, val)
            pred = p if pred is None else (pred & p)
        keep = index.docs().where(pred).select("docid")
        agg = agg.join(keep, "docid", "left_semi")

    result = (
        agg.orderBy(F.desc(F.round("score", 4)), F.asc("docid"))
        .limit(k)
        .select("docid", F.round("score", 4).alias("score"))
    )
    if with_payload:
        payload_cols = [c for c in index.docs().columns if c != "docid"]
        result = (
            result.join(index.docs(), "docid", "left")
            .select("docid", "score", *payload_cols)
            .orderBy(F.desc("score"), F.asc("docid"))
        )
    return result


def _analyze_term(t: str) -> list[str]:
    from solr_spark.analysis.analyzer import tokenize_py

    return tokenize_py(t)
