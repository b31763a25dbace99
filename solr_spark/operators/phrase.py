"""Positional phrase matching over tokenized text.

Role of the reference's phrase queries (parser/SolrQueryParserBase.java:547-554;
needs positions — the OMIT_TF_POSITIONS flag,
solr/core/src/java/org/apache/solr/schema/FieldProperties.java:38).

Positions are derived on the fly from the token arrays (an index-side
positions table is the round-2 layout; the algebra is identical):
phrase positions = positions i of term[0] such that toks[i+j] == term[j]
for every following term. `phrase_freq` = number of such positions —
the statistic Lucene's phrase scorer feeds into BM25. Slop > 0 extends
the window (sloppy phrase, order-insensitive within the slop window is
NOT implemented — exact-order slop only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokenize_py, tokens_sql


def phrase_positions_col(toks: Column, terms: list[str], slop: int = 0) -> Column:
    """Array of start positions (1-based) where the phrase occurs."""
    first = F.filter(
        F.transform(F.sequence(F.lit(1), F.size(toks)), lambda i: i),
        lambda i: F.element_at(toks, i) == terms[0],
    )
    if len(terms) == 1:
        return first

    def rest_ok(i):
        cond = None
        for j, t in enumerate(terms[1:], start=1):
            if slop == 0:
                # try_element_at: the phrase may start near the array end
                c = F.try_element_at(toks, i + F.lit(j)) == t
            else:
                # exact-order slop: term j may appear up to `slop` further
                window = F.slice(toks, i + F.lit(j), F.lit(slop + 1))
                c = F.array_contains(window, t)
            cond = c if cond is None else (cond & c)
        return cond

    return F.filter(first, rest_ok)


def phrase_match(
    docs: DataFrame,
    phrase: str,
    id_col: str = "docid",
    text_col: str = "content",
    slop: int = 0,
) -> DataFrame:
    """(docid, phrase_freq) for docs containing the analyzed phrase."""
    from solr_spark.analysis.analyzer import tokens_col

    terms = tokenize_py(phrase)
    if not terms:
        return docs.sparkSession.createDataFrame([], "docid long, phrase_freq int")
    toks = tokens_col(text_col)
    d = docs.select(F.col(id_col).cast("long").alias("docid"), toks.alias("_toks"))
    freq = F.size(phrase_positions_col(F.col("_toks"), terms, slop))
    return (
        d.select("docid", freq.alias("phrase_freq"))
        .where(F.col("phrase_freq") > 0)
        .orderBy("docid")
    )


def phrase_match_sql(phrase: str, slop: int = 0) -> str:
    """DuckDB twin over the `documents` view."""
    terms = tokenize_py(phrase)
    conds = []
    for j, t in enumerate(terms[1:], start=1):
        if slop == 0:
            conds.append(f"toks[i + {j}] = '{t}'")
        else:
            conds.append(
                f"list_contains(toks[i + {j} : i + {j} + {slop}], '{t}')"
            )
    cond = " AND ".join(conds) if conds else "true"
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents),
hits AS (
  SELECT docid,
         len([i FOR i IN range(1, len(toks) + 1)
              IF toks[i] = '{terms[0]}' AND {cond}]) AS phrase_freq
  FROM toks
)
SELECT docid, phrase_freq::INT AS phrase_freq FROM hits
WHERE phrase_freq > 0 ORDER BY docid
"""
