"""Luke-style index introspection (the admin/luke handler).

Role of the reference's LukeRequestHandler
(solr/core/src/java/org/apache/solr/handler/admin/LukeRequestHandler.java:1):
index-level stats (numDocs/maxDoc/deletedDocs/version/segment info),
per-field summaries, and per-field top terms by document frequency.

Spark-first shape: every answer is a footer read or a pruned aggregate
over the dictionary — never a postings scan. The dictionary
(term_stats) is the persisted frame queries already cache, so top-terms
is one TakeOrderedAndProject over a cached input; index_info reads meta
plus two footer counts. At 100 TB the dictionary is ~1e9 rows across
buckets — the top-k is a map-side partial topK + single-reduce merge,
which Spark's TakeOrderedAndProject already is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.index.builder import Index


def index_info(index: Index) -> DataFrame:
    """One-row frame with the numbers /admin/luke's `index` section
    reports: numDocs (live), maxDoc, deletedDocs, numTerms, hasBlocks/
    hasPositions (the codec-ish flags), avgdl."""
    spark = index.spark
    n_docs = int(index.meta.get("n_docs") or 0)
    deleted = index.deleted_rows_estimate() or 0
    n_terms = index.term_stats().count()
    row = (
        n_docs - int(deleted),
        n_docs,
        int(deleted),
        int(n_terms),
        float(index.meta.get("avgdl") or 0.0),
        bool(index.meta.get("has_blocks")),
        bool(index.meta.get("has_positions")),
        int(index.meta.get("num_buckets") or 0),
    )
    return spark.createDataFrame(
        [row],
        "numDocs long, maxDoc long, deletedDocs long, numTerms long,"
        " avgdl double, hasBlocks boolean, hasPositions boolean,"
        " numBuckets int",
    )


def top_terms(
    index: Index, k: int = 10, field: str | None = None
) -> DataFrame:
    """(term, docfreq, totaltf) for the k highest-df terms of a field —
    the handler's `topTerms` section. One TakeOrderedAndProject over the
    cached dictionary; ties break on term for determinism."""
    ts = index.term_dictionary(field)
    cttf = "cttf" if "cttf" in ts.columns else "df"
    return (
        ts.select(
            "term",
            F.col("df").cast("long").alias("docfreq"),
            F.col(cttf).cast("long").alias("totaltf"),
        )
        .orderBy(F.desc("docfreq"), "term")
        .limit(k)
    )


def field_summary(index: Index) -> DataFrame:
    """Per-field dictionary summary (the handler's `fields` section):
    distinct terms, df sum (postings rows), total term frequency."""
    ts = index.term_stats()
    if "field" not in ts.columns:
        ts = ts.withColumn(
            "field", F.lit((index.meta.get("fields") or ["content"])[0])
        )
    cttf = "cttf" if "cttf" in ts.columns else "df"
    return (
        ts.groupBy("field")
        .agg(
            F.count(F.lit(1)).alias("distinct_terms"),
            F.sum("df").cast("long").alias("postings_rows"),
            F.sum(cttf).cast("long").alias("total_tf"),
        )
        .orderBy("field")
    )
