"""Extended DisMax (edismax): per-term max-over-fields scoring with a
tiebreaker, minimum-should-match, and additive boost functions.

Role of the reference's default real-world query parser
(solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java:125-329:
per-field DisjunctionMaxQuery per user term over the qf field/boost map,
`tie` controls how much the non-max fields contribute, `mm` drops docs
matching too few terms, `bf` adds function-query boosts). Scoring per
Lucene's DisjunctionMaxQuery semantics:

    score(doc) = sum over matched terms t of
                   [ max_f c_f(t, doc) + tie * (sum_f c_f(t, doc) - max_f) ]
                 (+ each bf function value)
    where c_f(t, doc) = boost_f * BM25_f(t, doc) with PER-FIELD stats
    (df, avgdl, doc length all computed within field f).

Spark shape: one plan — per-field token relations union with a field
tag, one (docid, term) aggregation applies max/sum/tie, one (docid)
aggregation applies the sum + mm filter. Stats subplans are broadcast
joins; no driver loop over fields' data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokens_col, tokens_sql
from solr_spark.functions.bm25 import idf_col, idf_sql, tf_part_col, tf_part_sql
from solr_spark.functions.smallfloat import quantize_col, quantize_sql
from solr_spark.query.engine import analyze_query


def edismax_inline(
    docs: DataFrame,
    qtext: str,
    fields: dict[str, float],
    *,
    tie: float = 0.0,
    mm: int = 1,
    bf: Column | None = None,
    pf: dict[str, float] | None = None,
    ps: int = 0,
    k: int = 10,
    id_col: str = "docid",
) -> DataFrame:
    """Top-k edismax over in-row text fields (index-free gate shape).

    pf/ps: phrase-field boosts (ExtendedDismaxQParser.java pf param) —
    docs where the analyzed query appears as a phrase (slop ps) in a pf
    field gain boost * (sum of the phrase terms' idf in that field)
    * tf_part(phrase_freq), the Lucene PhraseQuery scoring shape."""
    spark = docs.sparkSession
    qterms = analyze_query(qtext)
    if not qterms:
        return spark.createDataFrame([], "docid long, score double")
    qrel = F.broadcast(
        spark.createDataFrame(
            [(t, float(c)) for t, c in qterms.items()], "term string, qtf double"
        )
    )

    per_field = []
    for fld, boost in fields.items():
        tok = docs.select(
            F.col(id_col).cast("long").alias("docid"),
            tokens_col(fld).alias("toks"),
        ).select(
            "docid",
            "toks",
            quantize_col(F.size("toks")).cast("int").alias("dl_q"),
            F.size("toks").alias("doclen"),
        )
        meta = tok.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("doclen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
        tf = (
            tok.select("docid", "dl_q", F.explode("toks").alias("term"))
            .join(qrel, "term")
            .groupBy("docid", "term", "dl_q", "qtf")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        )
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
        contrib = (
            tf.join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(meta))
            .select(
                "docid",
                "term",
                (
                    F.lit(float(boost))
                    * F.col("qtf")
                    * idf_col(F.col("df"), F.col("n_docs"))
                    * tf_part_col(F.col("tf"), F.col("dl_q"), F.col("avgdl"))
                ).alias("c"),
            )
        )
        per_field.append(contrib)

    allc = per_field[0]
    for p in per_field[1:]:
        allc = allc.unionByName(p)
    per_term = allc.groupBy("docid", "term").agg(
        (
            F.max("c") + F.lit(float(tie)) * (F.sum("c") - F.max("c"))
        ).alias("tscore")
    )
    agg = per_term.groupBy("docid").agg(
        F.sum("tscore").alias("score"), F.count(F.lit(1)).alias("_nm")
    )
    if mm > 1:
        agg = agg.where(F.col("_nm") >= mm)
    out = agg.select("docid", "score")
    if pf:
        from solr_spark.analysis.analyzer import tokenize_py
        from solr_spark.operators.phrase import phrase_freq_col

        seq = tokenize_py(qtext)
        for fld, boost in pf.items():
            ptok = docs.select(
                F.col(id_col).cast("long").alias("docid"),
                tokens_col(fld).alias("_toks"),
            ).select(
                "docid",
                "_toks",
                quantize_col(F.size("_toks")).cast("int").alias("dl_q"),
                F.size("_toks").alias("doclen"),
            )
            pmeta = ptok.agg(
                F.count(F.lit(1)).cast("double").alias("n_docs"),
                (F.sum("doclen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
            )
            ptf = (
                ptok.select("docid", F.explode("_toks").alias("term"))
                .join(qrel.select("term"), "term")
                .groupBy("docid", "term")
                .agg(F.count(F.lit(1)).alias("tf"))
            )
            pidf = (
                ptf.groupBy("term")
                .agg(F.count(F.lit(1)).cast("double").alias("df"))
                .crossJoin(pmeta.select("n_docs"))
                .agg(F.sum(idf_col(F.col("df"), F.col("n_docs"))).alias("idf_sum"))
            )
            hits = ptok.select(
                "docid",
                "dl_q",
                phrase_freq_col(F.col("_toks"), seq, ps).alias("pfreq"),
            ).where(F.col("pfreq") > 0)
            pc = (
                hits.crossJoin(F.broadcast(pmeta.select("avgdl")))
                .crossJoin(F.broadcast(pidf))
                .select(
                    "docid",
                    (
                        F.lit(float(boost))
                        * F.col("idf_sum")
                        * tf_part_col(F.col("pfreq"), F.col("dl_q"), F.col("avgdl"))
                    ).alias("_pc"),
                )
            )
            out = out.join(pc, "docid", "left").select(
                "docid",
                (F.col("score") + F.coalesce(F.col("_pc"), F.lit(0.0))).alias("score"),
            )
    if bf is not None:
        bfd = docs.select(
            F.col(id_col).cast("long").alias("docid"), bf.cast("double").alias("_bf")
        )
        out = out.join(bfd, "docid").select(
            "docid", (F.col("score") + F.col("_bf")).alias("score")
        )
    return (
        out.orderBy(F.desc(F.round("score", 4)), F.asc("docid"))
        .limit(k)
        .select("docid", F.round("score", 4).alias("score"))
    )


def edismax_sql(
    qtext: str,
    fields: dict[str, float],
    *,
    tie: float = 0.0,
    mm: int = 1,
    sql_bf: str | None = None,
    pf: dict[str, float] | None = None,
    ps: int = 0,
    k: int = 10,
    table: str = "documents",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin generated from the same analyzer/BM25 definitions."""
    qterms = analyze_query(qtext)
    if not qterms:
        return f"SELECT {id_expr}::BIGINT AS docid, 0.0::DOUBLE AS score FROM {table} WHERE false"
    qvals = ",".join(f"('{t}', {float(c)})" for t, c in qterms.items())
    terms_in = ",".join(f"'{t}'" for t in qterms)
    branches = []
    for fld, boost in fields.items():
        branches.append(
            f"""(
  WITH ftoks AS (
    SELECT {id_expr}::BIGINT AS docid, {tokens_sql(fld)} AS toks FROM {table}
  ),
  fdl AS (
    SELECT docid, {quantize_sql('len(toks)')} AS dl_q, len(toks) AS doclen
    FROM ftoks
  ),
  fmeta AS (
    SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl
    FROM fdl
  ),
  ftf AS (
    SELECT docid, term, count(*)::DOUBLE AS tf
    FROM (SELECT docid, unnest(toks) AS term FROM ftoks)
    WHERE term IN ({terms_in}) GROUP BY docid, term
  ),
  fdf AS (SELECT term, count(*)::DOUBLE AS df FROM ftf GROUP BY term)
  SELECT ftf.docid, ftf.term,
         {float(boost)} * q.qtf
           * {idf_sql('fdf.df', 'fmeta.n_docs')}
           * {tf_part_sql('ftf.tf', 'fdl.dl_q', 'fmeta.avgdl')} AS c
  FROM ftf
  JOIN fdf USING (term)
  JOIN (SELECT * FROM (VALUES {qvals}) AS t(term, qtf)) q USING (term)
  JOIN fdl USING (docid)
  CROSS JOIN fmeta
)"""
        )
    union = "\nUNION ALL\n".join(branches)
    bf_join = ""
    extra_add = ""
    if sql_bf is not None:
        bf_join = (
            f"JOIN (SELECT {id_expr}::BIGINT AS docid, ({sql_bf})::DOUBLE AS _bf "
            f"FROM {table}) bfv USING (docid)"
        )
        extra_add += " + bfv._bf"
    pf_joins = []
    if pf:
        from solr_spark.analysis.analyzer import tokenize_py
        from solr_spark.query.positions import chain_match_count_sql

        seq = tokenize_py(qtext)
        for i, (fld, boost) in enumerate(pf.items()):
            pos_exprs = [
                f"[i FOR i IN range(1, len(toks) + 1) IF toks[i] = '{t}']"
                for t in seq
            ]
            freq = chain_match_count_sql(pos_exprs, ps)
            pf_joins.append(
                f"""LEFT JOIN (
  WITH ptoks AS (
    SELECT {id_expr}::BIGINT AS docid, {tokens_sql(fld)} AS toks FROM {table}
  ),
  pdl AS (
    SELECT docid, {quantize_sql('len(toks)')} AS dl_q, len(toks) AS doclen
    FROM ptoks
  ),
  pmeta AS (
    SELECT count(*)::DOUBLE AS n_docs, sum(doclen)::DOUBLE / count(*) AS avgdl
    FROM pdl
  ),
  ptf AS (
    SELECT docid, term FROM (SELECT docid, unnest(toks) AS term FROM ptoks)
    WHERE term IN ({terms_in}) GROUP BY docid, term
  ),
  pidf AS (
    SELECT sum({idf_sql('df', 'n_docs')}) AS idf_sum
    FROM (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY term)
    CROSS JOIN pmeta
  ),
  phits AS (SELECT docid, ({freq}) AS pfreq FROM ptoks)
  SELECT phits.docid,
         {float(boost)} * pidf.idf_sum
           * {tf_part_sql('phits.pfreq', 'pdl.dl_q', 'pmeta.avgdl')} AS _pc
  FROM phits JOIN pdl USING (docid) CROSS JOIN pmeta CROSS JOIN pidf
  WHERE phits.pfreq > 0
) pfv{i} USING (docid)"""
            )
            extra_add += f" + coalesce(pfv{i}._pc, 0.0)"
    pf_join_sql = "\n".join(pf_joins)
    return f"""
WITH allc AS (
{union}
),
per_term AS (
  SELECT docid, term,
         max(c) + {float(tie)} * (sum(c) - max(c)) AS tscore
  FROM allc GROUP BY docid, term
),
agg AS (
  SELECT docid, sum(tscore) AS score, count(*) AS nm
  FROM per_term GROUP BY docid
)
SELECT docid, round(score{extra_add}, 4) AS score
FROM agg {bf_join}
{pf_join_sql}
WHERE nm >= {mm}
ORDER BY round(score{extra_add}, 4) DESC, docid LIMIT {k}
"""
