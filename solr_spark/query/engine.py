"""BM25 top-k query execution over the flat bucketed postings.

Mirrors the reference's two-phase distributed query
(solr/core/src/java/org/apache/solr/handler/component/QueryComponent.java:555-651
EXECUTE_QUERY then GET_FIELDS at :1213, shard-merge at :833):

- phase 1 touches only postings + term stats: score, per-partition top-k
  and a driver merge (Spark's TakeOrderedAndProject gives exactly the
  per-shard-heap + coordinator-merge shape);
- phase 2 joins stored fields (repo/path/lang/sha256) only for the k
  winner docids — the `content`-sized payload never enters the shuffle.

Global IDF comes from the index-wide term_stats table, the Spark
analogue of the distributed stats exchange
(solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java:62,118-155):
every partition scores with identical global df/N, so distributed
results are identical to single-node results by construction.

Query terms are analyzed with the SAME chain as indexing and broadcast
as a tiny (term, qtf, idf) relation; a duplicated query term scores once
per occurrence (BooleanQuery-with-repeated-clause semantics). Ties break
by ascending docid (QueryComponent.java:866-868 merge tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokenize_py
from solr_spark.functions.bm25 import idf_py, tf_part_col
from solr_spark.index.builder import Index


def analyze_query(qtext: str, index: Index | None = None) -> dict[str, int]:
    """query text -> {term: qtf} via the shared analysis chain.

    Pass `index` to honor its index-time analyzer config (stopwords /
    synonyms stored in meta, round 3) — index and query analysis MUST
    agree or stopworded/synonym terms silently never match."""
    toks = index.analyze(qtext) if index is not None else tokenize_py(qtext)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    return counts


def _scored_postings(
    index: Index, qterms: dict[str, int], field: str | None = None
) -> tuple[DataFrame, int]:
    """Postings of the query terms with per-(term,doc) contributions.

    Phase A (tiny, bucket-pruned term_stats scan): resolve term -> (tid,
    df) and compute idf with the GLOBAL df — the Spark shape of the
    distributed-stats exchange
    (solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java:62).
    Phase B: scan only the postings partitions of those tids, with the
    tid IN (...) literal list pushed down to the parquet scan.

    Returns (scored df, n_present_terms).
    """
    spark = index.spark
    n_docs = index.meta["n_docs"]
    if index.meta.get("fields"):
        # multi-field index: per-field dictionary + per-field norms
        fld = field or index.meta["fields"][0]
        avgdl = index.meta["avgdl_by_field"][fld]
        stats = {
            t: s
            for (_, t), s in index.term_stats_fielded(
                [(fld, t) for t in qterms]
            ).items()
        }
    else:
        avgdl = index.meta["avgdl"]
        stats = index.term_stats_for(list(qterms))
    if not stats:
        return spark.createDataFrame([], "docid long, contrib double"), 0
    qrel = spark.createDataFrame(
        [
            (s["tid"], float(qterms[t]), idf_py(int(s["df"]), n_docs))
            for t, s in stats.items()
        ],
        "tid long, qtf double, idf double",
    )
    tids = [s["tid"] for s in stats.values()]
    postings = (
        index.postings()
        .where(F.col("bucket").isin(index.pbuckets_for(tids)))
        .where(F.col("tid").isin(tids))
    )
    scored = postings.join(F.broadcast(qrel), "tid").select(
        "docid",
        (
            F.col("qtf")
            * F.col("idf")
            * tf_part_col(F.col("tf"), F.col("dl_q"), float(avgdl))
        ).alias("contrib"),
    )
    return scored, len(stats)


def bm25_scores(
    index: Index, qtext: str, mode: str = "OR", field: str | None = None
) -> DataFrame:
    """(docid, score) for ALL matching docs — no ordering, no limit.

    The value-source form: `query($q)` (ValueSourceParser.java:350-420,
    QueryValueSource) reads a subquery's score per document, so it needs
    the full score frame to join by docid, not a top-k."""
    qterms = analyze_query(qtext, index)
    scored, n_present = (
        _scored_postings(index, qterms, field) if qterms else (None, 0)
    )
    if n_present == 0 or (mode == "AND" and n_present < len(qterms)):
        return index.spark.createDataFrame([], "docid long, score double")
    agg = scored.groupBy("docid").agg(
        F.sum("contrib").alias("score"),
        F.count(F.lit(1)).alias("_nmatched"),
    )
    if mode == "AND":
        agg = agg.where(F.col("_nmatched") == n_present)
    return agg.select("docid", "score")


def bm25_topk(
    index: Index,
    qtext: str,
    k: int = 10,
    mode: str = "OR",
    with_payload: bool = False,
    field: str | None = None,
) -> DataFrame:
    """Top-k (docid, score) for an analyzed free-text query.

    mode="AND" keeps only docs matching every distinct query term
    (postings-intersection semantics: matched-term count == #terms);
    an AND query with an absent term returns no rows. The main pass is
    ONE job: per-partition heap + driver merge (TakeOrderedAndProject).
    """
    qterms = analyze_query(qtext, index)
    scored, n_present = (
        _scored_postings(index, qterms, field) if qterms else (None, 0)
    )
    if n_present == 0 or (mode == "AND" and n_present < len(qterms)):
        result = index.spark.createDataFrame([], "docid long, score double")
    else:
        agg = scored.groupBy("docid").agg(
            F.sum("contrib").alias("score"),
            F.count(F.lit(1)).alias("_nmatched"),
        )
        if mode == "AND":
            agg = agg.where(F.col("_nmatched") == n_present)
        # tie-break on the score ROUNDED to 9 decimals: raw float64 sums
        # differ in the last ulp between plans (aggregation order), so a
        # mathematical tie would otherwise order differently in the flat
        # vs pruned paths; 1e-9 is far below any real BM25 separation
        result = (
            agg.select("docid", "score")
            .orderBy(F.desc(F.round("score", 9)), F.asc("docid"))
            .limit(k)
        )
    if with_payload:
        payload_cols = [c for c in index.docs().columns if c not in ("docid",)]
        result = (
            result.join(index.docs(), "docid", "left")
            .select("docid", "score", *payload_cols)
            .orderBy(F.desc("score"), F.asc("docid"))
        )
    return result


def realtime_get(
    index: Index,
    docids: list[int],
    tlog: DataFrame | None = None,
    version_col: str = "_version_",
) -> DataFrame:
    """Real-time get: fetch docs by id, seeing UNCOMMITTED updates first.

    The reference answers /get from the in-memory update log before
    falling back to the last commit point
    (solr/core/src/java/org/apache/solr/handler/component/RealTimeGetComponent.java:110-180
    consults UpdateLog.lookup, then the searcher). Spark shape: `tlog` is
    the not-yet-published micro-batch (docid, <doc fields>, _version_);
    the LATEST tlog row per docid (max version) overlays the committed
    docs table, and a tlog row with all payload fields null is a delete
    tombstone. Both sides are pruned to the requested ids before the
    join, so the lookup is k-row work, not a corpus scan.
    """
    from pyspark.sql.window import Window

    committed = index.docs().where(F.col("docid").isin(list(docids)))
    if tlog is None:
        return committed.orderBy("docid")
    fields = [c for c in committed.columns if c != "docid"]
    deleted = "_deleted_" if "_deleted_" in tlog.columns else None
    latest = (
        tlog.where(F.col("docid").isin(list(docids)))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("docid").orderBy(F.desc(version_col))
            ),
        )
        .where(F.col("_rn") == 1)
    )
    overlaid = committed.join(
        latest.select(
            "docid",
            F.lit(True).alias("_in_tlog"),
            (F.col(deleted) if deleted else F.lit(False)).alias("_tomb"),
            *[F.col(c).alias(f"_t_{c}") for c in fields],
        ),
        "docid",
        "full",
    )
    in_tlog = F.coalesce(F.col("_in_tlog"), F.lit(False))
    out = (
        overlaid.where(~F.coalesce(F.col("_tomb"), F.lit(False)))
        .select(
            "docid",
            *[
                F.when(in_tlog, F.col(f"_t_{c}")).otherwise(F.col(c)).alias(c)
                for c in fields
            ],
            in_tlog.alias("_from_tlog"),
        )
    )
    return out.orderBy("docid")
