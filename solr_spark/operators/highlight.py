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


def highlight_fragments(
    docs: DataFrame,
    qtext: str,
    id_col: str = "docid",
    text_col: str = "content",
    max_frags: int = 3,
    window: int = 4,
) -> DataFrame:
    """Multi-fragment highlighting with token offsets (round-2 upgrade
    over the single-fragment char-window fast path above; role of
    highlight/DefaultSolrHighlighter.java's fragment builder).

    Works in TOKEN space: every occurrence of every query term is a
    match (pos, term); the first `max_frags` matches by position become
    fragments of +-`window` tokens. Token offsets are deterministic
    across engines (char offsets depend on separators the analyzer
    drops), and the whole thing is JVM-side array algebra over the same
    analysis chain as scoring — SQL-twinnable, no UDF. At scale this
    runs on the k winners after payload fetch, never the full corpus.
    """
    from solr_spark.analysis.analyzer import tokens_col

    terms = []
    for t in tokenize_py(qtext):
        if t not in terms:
            terms.append(t)
    schema = (
        "docid long, frag_idx int, pos int, matched_term string, snippet string"
    )
    if not terms:
        return docs.sparkSession.createDataFrame([], schema)
    toks = F.col("_toks")
    def _matches(term: str):
        # single-arg lambdas only: pyspark reads a 2-arg HOF lambda as
        # (element, index); F.filter/F.transform evaluate eagerly so
        # closing over `term` is safe
        pos = F.filter(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.element_at(toks, i) == term,
        )
        return F.transform(
            pos, lambda p: F.struct(p.alias("pos"), F.lit(term).alias("term"))
        )

    arrs = [_matches(t) for t in terms]
    all_m = F.sort_array(F.concat(*arrs)) if len(arrs) > 1 else F.sort_array(arrs[0])
    d = docs.select(
        F.col(id_col).cast("long").alias("docid"),
        tokens_col(text_col).alias("_toks"),
    ).withColumn("_frags", F.slice(all_m, 1, max_frags))
    start = F.greatest(F.lit(1), F.col("m.pos") - F.lit(window))
    length = F.col("m.pos") + F.lit(window) - start + F.lit(1)
    return (
        d.select("docid", "_toks", F.posexplode("_frags").alias("_i", "m"))
        .select(
            "docid",
            (F.col("_i") + 1).cast("int").alias("frag_idx"),
            F.col("m.pos").alias("pos"),
            F.col("m.term").alias("matched_term"),
            F.array_join(
                F.slice(F.col("_toks"), start.cast("int"), length.cast("int")), " "
            ).alias("snippet"),
        )
        .orderBy("docid", "frag_idx")
    )


def highlight_fragments_sql(
    qtext: str, max_frags: int = 3, window: int = 4
) -> str:
    """DuckDB twin of highlight_fragments over the `documents` view."""
    from solr_spark.analysis.analyzer import tokens_sql

    terms = []
    for t in tokenize_py(qtext):
        if t not in terms:
            terms.append(t)
    arrs = " || ".join(
        f"[{{'pos': i, 'term': '{t}'}} FOR i IN range(1, len(toks) + 1) IF toks[i] = '{t}']"
        for t in terms
    )
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents),
m AS (SELECT docid, toks, list_sort({arrs}) AS ms FROM toks),
fr AS (SELECT docid, toks, ms[1:{max_frags}] AS frags FROM m WHERE len(ms) > 0),
ex AS (
  SELECT docid, toks, unnest(generate_series(1, len(frags)))::INT AS frag_idx, frags
  FROM fr
)
SELECT docid, frag_idx,
       frags[frag_idx].pos::INT AS pos,
       frags[frag_idx].term AS matched_term,
       array_to_string(
         toks[greatest(1, frags[frag_idx].pos - {window})
              : frags[frag_idx].pos + {window}], ' ') AS snippet
FROM ex ORDER BY docid, frag_idx
"""


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


def highlight_indexed(
    index,
    qtext: str,
    k: int = 10,
    text_col: str = "content",
) -> DataFrame:
    """Index-backed highlighting: BM25 top-k through the engine, then
    snippets from the STORED text of the k winners only — the two-phase
    shape of Solr highlighting (HighlightComponent runs over the
    searcher's stored fields for the page of hits, never the corpus).
    Requires build_index(store_content=True), the stored="true" text
    field highlighting needs; raises otherwise instead of silently
    rescanning the corpus."""
    from solr_spark.query.wand import bm25_topk_auto

    if not index.meta.get("stored_content"):
        raise ValueError(
            "highlight_indexed needs an index built with "
            "store_content=True (the stored text field)"
        )
    top = bm25_topk_auto(index, qtext, k=k)
    winners = top.join(index.docs().select("docid", text_col), "docid")
    # analyze through the index so highlighted terms match its chain
    terms = " ".join(index.analyze(qtext)) or qtext
    snips = highlight(winners, terms, id_col="docid", text_col=text_col)
    return (
        top.join(snips, "docid", "left")
        .select("docid", "score", "matched_term", "snippet")
        .orderBy(F.desc("score"), F.asc("docid"))
    )
