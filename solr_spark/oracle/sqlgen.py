"""DuckDB oracle-SQL generators, mirroring the engine's operators.

Each function returns ANSI-ish SQL runnable by DuckDB over the harness
views (documents, lineitem, orders, ...). The SQL is generated from the
SAME shared definitions as the Spark side (analyzer regexes, SmallFloat
table, BM25 constants, wordlists), so Spark result == SQL result by
construction, not by coincidence.
"""

from __future__ import annotations

from solr_spark.analysis.analyzer import tokens_sql
from solr_spark.functions.bm25 import idf_sql, tf_part_sql
from solr_spark.functions.smallfloat import quantize_sql
from solr_spark.query.engine import analyze_query

def doc_toks_cte(tok_expr: str | None = None) -> str:
    """The shared toks/doclens CTE; `tok_expr` swaps in a non-default
    analysis chain (e.g. catenate + porter for a stemmed index)."""
    e = tok_expr or tokens_sql("text")
    return f"""
toks AS (
  SELECT doc_id AS docid, {e} AS toks FROM documents
),
doclens AS (
  SELECT docid, len(toks) AS doclen, {quantize_sql('len(toks)')} AS dl_q FROM toks
)"""


DOC_TOKS = doc_toks_cte()


def bm25_sql(
    qtext: str,
    k: int = 10,
    mode: str = "OR",
    order_decimals: int = 4,
    tok_expr: str | None = None,
    qterms: dict[str, int] | None = None,
) -> str:
    """`order_decimals`: the indexed engine orders by round(score, 9) +
    docid (see engine.bm25_topk); its gate twins pass 9 so both sides
    break mathematical ties identically. The inline gate entries keep 4.

    `tok_expr`/`qterms` override the document analysis chain and the
    analyzed query terms for indexes built with a non-default analyzer
    (stemming, catenation) — both sides must come from the SAME chain
    definition or the oracle tests nothing."""
    qterms = qterms if qterms is not None else analyze_query(qtext)
    if not qterms:
        return "SELECT doc_id::BIGINT AS docid, 0.0::DOUBLE AS score FROM documents WHERE false"
    terms_in = ",".join(f"'{t}'" for t in qterms)
    qvals = ",".join(f"('{t}', {float(c)})" for t, c in qterms.items())
    and_filter = f"WHERE nm = {len(qterms)}" if mode == "AND" else ""
    return f"""
WITH {doc_toks_cte(tok_expr)},
meta AS (
  SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl
  FROM doclens
),
post AS (
  SELECT docid, unnest(toks) AS term FROM toks
),
tf AS (
  SELECT docid, term, count(*)::DOUBLE AS tf FROM post
  WHERE term IN ({terms_in}) GROUP BY docid, term
),
stats AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
q(term, qtf) AS (VALUES {qvals}),
scored AS (
  SELECT tf.docid,
         sum(q.qtf * {idf_sql('stats.df', 'meta.n_docs')}
             * {tf_part_sql('tf.tf', 'dl.dl_q', 'meta.avgdl')}) AS s,
         count(*) AS nm
  FROM tf
  JOIN stats USING (term)
  JOIN q USING (term)
  JOIN doclens dl USING (docid)
  CROSS JOIN meta
  GROUP BY tf.docid
)
SELECT docid, round(s, 4) AS score
FROM scored {and_filter}
ORDER BY round(s, {order_decimals}) DESC, docid LIMIT {k}
"""


def query_tf_norm_boost_sql(
    qtext: str,
    tf_term: str,
    w_q: float,
    w_tf: float,
    w_norm: float,
    k: int = 20,
) -> str:
    """Twin of the per-doc value sources composed as
    round(w_q*query(qtext,0) + w_tf*tf(f,term) + w_norm*norm(f), 4):
    full BM25 scores (round 9, like engine.bm25_scores' gate wrapper),
    per-doc tf of one term, and the SmallFloat-quantized doc length."""
    qterms = analyze_query(qtext)
    all_terms = sorted(set(qterms) | {tf_term})
    terms_in = ",".join(f"'{t}'" for t in all_terms)
    qvals = ",".join(f"('{t}', {float(c)})" for t, c in qterms.items())
    return f"""
WITH {DOC_TOKS},
meta AS (
  SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl
  FROM doclens
),
post AS (SELECT docid, unnest(toks) AS term FROM toks),
alltf AS (
  SELECT docid, term, count(*)::DOUBLE AS tf FROM post
  WHERE term IN ({terms_in}) GROUP BY docid, term
),
stats AS (SELECT term, count(*)::DOUBLE AS df FROM alltf GROUP BY term),
q(term, qtf) AS (VALUES {qvals}),
qs AS (
  SELECT alltf.docid,
         round(sum(q.qtf * {idf_sql('stats.df', 'meta.n_docs')}
             * {tf_part_sql('alltf.tf', 'dl.dl_q', 'meta.avgdl')}), 9) AS score
  FROM alltf
  JOIN stats USING (term)
  JOIN q USING (term)
  JOIN doclens dl USING (docid)
  CROSS JOIN meta
  GROUP BY alltf.docid
),
tft AS (SELECT docid, tf FROM alltf WHERE term = '{tf_term}')
SELECT d.docid,
       round({w_q} * coalesce(qs.score, 0.0)
             + {w_tf} * coalesce(tft.tf, 0.0)
             + {w_norm} * d.dl_q, 4) AS boosted
FROM doclens d
LEFT JOIN qs USING (docid)
LEFT JOIN tft USING (docid)
ORDER BY boosted DESC, d.docid LIMIT {k}
"""


def terms_top_df_sql(limit: int = 20) -> str:
    """Term dictionary scan: top terms by doc freq (TermsComponent.java:237)."""
    return f"""
WITH {DOC_TOKS},
post AS (SELECT DISTINCT docid, unnest(toks) AS term FROM toks)
SELECT term, count(*)::BIGINT AS df FROM post
GROUP BY term ORDER BY df DESC, term LIMIT {limit}
"""


def significant_terms_sql(fg_term: str, min_fg: int = 3, limit: int = 15) -> str:
    return f"""
WITH {DOC_TOKS},
post AS (SELECT DISTINCT docid, unnest(toks) AS term FROM toks),
fg_docs AS (SELECT DISTINCT docid FROM post WHERE term = '{fg_term}'),
n AS (SELECT count(*)::DOUBLE AS n_docs, (SELECT count(*) FROM fg_docs)::DOUBLE AS n_fg FROM toks),
bg AS (SELECT term, count(*)::DOUBLE AS bg_df FROM post GROUP BY term),
fg AS (SELECT term, count(*)::DOUBLE AS fg_df FROM post
       WHERE docid IN (SELECT docid FROM fg_docs) GROUP BY term)
SELECT fg.term,
       fg.fg_df::BIGINT AS fg_df,
       bg.bg_df::BIGINT AS bg_df,
       round((fg.fg_df / n.n_fg) / ((bg.bg_df + 1.0) / n.n_docs), 4) AS score
FROM fg JOIN bg USING (term) CROSS JOIN n
WHERE fg.fg_df >= {min_fg}
ORDER BY score DESC, fg.term LIMIT {limit}
"""


def bm25_batch_sql(
    queries: dict[str, str], k: int = 10, mode: str = "OR"
) -> str:
    """Twin of engine.bm25_topk_batch: a qid dimension over the shared
    scored CTE — (qid, docid, score, rank) with the engine's
    round(s,9)/docid tie-break."""
    per_q = {qid: analyze_query(qt) for qid, qt in queries.items()}
    qvals, nreq = [], []
    all_terms = sorted({t for qs in per_q.values() for t in qs})
    for qid, qterms in per_q.items():
        if not qterms:
            continue
        for t, c in qterms.items():
            qvals.append(f"('{qid}', '{t}', {float(c)})")
        nreq.append(f"('{qid}', {len(qterms)})")
    if not qvals:
        return (
            "SELECT '' AS qid, doc_id::BIGINT AS docid, 0.0::DOUBLE AS score,"
            " 0::INT AS rank FROM documents WHERE false"
        )
    terms_in = ",".join(f"'{t}'" for t in all_terms)
    # AND semantics: a query matches a doc only when EVERY analyzed term
    # matches — a term absent from the corpus keeps nm < n_req for every
    # doc, so the join-filter drops the query with no special casing
    and_join = (
        "JOIN nreq USING (qid) WHERE scored.nm = nreq.n"
        if mode == "AND"
        else ""
    )
    return f"""
WITH {DOC_TOKS},
meta AS (
  SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl
  FROM doclens
),
post AS (SELECT docid, unnest(toks) AS term FROM toks),
tf AS (
  SELECT docid, term, count(*)::DOUBLE AS tf FROM post
  WHERE term IN ({terms_in}) GROUP BY docid, term
),
stats AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
q(qid, term, qtf) AS (VALUES {",".join(qvals)}),
nreq(qid, n) AS (VALUES {",".join(nreq)}),
scored AS (
  SELECT q.qid, tf.docid,
         sum(q.qtf * {idf_sql('stats.df', 'meta.n_docs')}
             * {tf_part_sql('tf.tf', 'dl.dl_q', 'meta.avgdl')}) AS s,
         count(*) AS nm
  FROM tf
  JOIN stats USING (term)
  JOIN q USING (term)
  JOIN doclens dl USING (docid)
  CROSS JOIN meta
  GROUP BY q.qid, tf.docid
),
rk AS (
  SELECT qid, docid, s,
         row_number() OVER (PARTITION BY qid
           ORDER BY round(s, 9) DESC, docid) AS rn
  FROM scored {and_join}
)
SELECT qid, docid, round(s, 4) AS score, rn::INT AS rank
FROM rk WHERE rn <= {k} ORDER BY qid, rn
"""
