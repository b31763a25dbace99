"""Highlighting: snippet extraction around matched query terms.

Role of the reference's highlight component
(solr/core/src/java/org/apache/solr/handler/component/HighlightComponent.java,
highlight/DefaultSolrHighlighter.java) re-expressed as column
expressions: for each result doc, locate the first occurrence of any
query term in the (lowercased) text and emit a fixed window around it.
Offset-accurate multi-fragment highlighting needs positions/offsets we
don't index (round-2); this is the single-fragment fast path, fully
JVM-side and SQL-twinnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokenize_py

WINDOW = 30


def highlight(
    docs: DataFrame,
    qtext: str,
    id_col: str = "docid",
    text_col: str = "content",
) -> DataFrame:
    """(docid, snippet, matched_term) for docs containing any query term.

    First-match-wins: terms are tried in analyzed order; the earliest
    position among matching terms wins, ties broken by term order.
    """
    terms = []
    for t in tokenize_py(qtext):
        if t not in terms:
            terms.append(t)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "docid long, matched_term string, snippet string"
        )
    low = F.lower(F.col(text_col))
    pos_cols = [F.locate(t, low).alias(f"_p{i}") for i, t in enumerate(terms)]
    d = docs.select(
        F.col(id_col).cast("long").alias("docid"), F.col(text_col).alias("_t"), *pos_cols
    )
    # best = min positive position; tie -> earlier term
    best_pos, best_term = None, None
    for i, t in enumerate(terms):
        p = F.when(F.col(f"_p{i}") > 0, F.col(f"_p{i}")).otherwise(F.lit(None))
        if best_pos is None:
            best_pos, best_term = p, F.when(p.isNotNull(), F.lit(t))
        else:
            take = p.isNotNull() & (best_pos.isNull() | (p < best_pos))
            best_term = F.when(take, F.lit(t)).otherwise(best_term)
            best_pos = F.when(take, p).otherwise(best_pos)
    start = F.greatest(F.lit(1), best_pos - F.lit(WINDOW))
    snippet = F.substring(F.col("_t"), start.cast("int"), F.lit(2 * WINDOW).cast("int"))
    return (
        d.where(best_pos.isNotNull())
        .select("docid", best_term.alias("matched_term"), snippet.alias("snippet"))
        .orderBy("docid")
    )


def highlight_sql(qtext: str, window: int = WINDOW) -> str:
    """DuckDB twin over the `documents` view."""
    terms = []
    for t in tokenize_py(qtext):
        if t not in terms:
            terms.append(t)
    pos_exprs = ",\n       ".join(
        f"strpos(lower(text), '{t}') AS p{i}" for i, t in enumerate(terms)
    )
    # fold best position / term with term-order tie-break
    best_pos = "NULL::BIGINT"
    best_term = "NULL::VARCHAR"
    for i, t in enumerate(reversed(terms)):
        j = len(terms) - 1 - i
        best_pos = f"CASE WHEN p{j} > 0 AND ({best_pos} IS NULL OR p{j} < ({best_pos})) THEN p{j} ELSE {best_pos} END"
    # recompute term via positions (first term achieving best pos)
    term_case = "CASE " + " ".join(
        f"WHEN p{i} > 0 AND p{i} = bp THEN '{t}'" for i, t in enumerate(terms)
    ) + " END"
    return f"""
WITH pos AS (
  SELECT doc_id::BIGINT AS docid, text,
       {pos_exprs}
  FROM documents
), best AS (
  SELECT *, ({best_pos}) AS bp FROM pos
)
SELECT docid, {term_case} AS matched_term,
       substr(text, greatest(1, bp - {window})::INT, {2 * window}) AS snippet
FROM best WHERE bp IS NOT NULL ORDER BY docid
"""
