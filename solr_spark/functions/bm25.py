"""BM25 scoring — shared constants and the score expression in three forms.

Semantics follow the reference's default similarity: BM25 with
k1=1.2, b=0.75, discountOverlaps=true (defaults at
solr/core/src/java/org/apache/solr/search/similarities/BM25SimilarityFactory.java:48-49,
wired as the schema default by SchemaSimilarityFactory.java:39). The
documented Lucene formula (post-LUCENE-8563, no (k1+1) factor):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    norm(d)     = k1 * (1 - b + b * dl_q(d) / avgdl)
    score(t, d) = qtf(t) * idf(t) * tf / (tf + norm(d))
    score(d)    = sum over query terms

where `dl_q` is the SmallFloat-quantized doc length (see
functions/smallfloat.py) and `avgdl = total token count / N` (Lucene's
avgFieldLength = sumTotalTermFreq / docCount). `qtf` is the number of
times the term occurs in the query (a duplicated query term contributes
once per occurrence, matching a BooleanQuery with repeated clauses).

All arithmetic is float64 in every form (engine, NumPy oracle, DuckDB
oracle) so the three agree to ~1 ulp.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def idf_col(df: Column, n_docs: Column | int) -> Column:
    n = F.lit(float(n_docs)) if isinstance(n_docs, int) else n_docs.cast("double")
    d = df.cast("double")
    return F.log(F.lit(1.0) + (n - d + F.lit(0.5)) / (d + F.lit(0.5)))


def idf_sql(df_expr: str, n_expr: str) -> str:
    return f"ln(1.0 + (({n_expr})::DOUBLE - ({df_expr}) + 0.5) / (({df_expr}) + 0.5))"


def tf_part_col(tf: Column, dl_q: Column, avgdl: Column | float) -> Column:
    """tf / (tf + k1*(1-b+b*dl_q/avgdl)) as a Column (float64)."""
    a = F.lit(float(avgdl)) if isinstance(avgdl, float) else avgdl.cast("double")
    t = tf.cast("double")
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl_q.cast("double") / a)
    return t / (t + norm)


def tf_part_py(tf: float, dl_q: float, avgdl: float) -> float:
    norm = K1 * (1.0 - B + B * dl_q / avgdl)
    return tf / (tf + norm)


def tf_part_sql(tf_expr: str, dlq_expr: str, avgdl_expr: str) -> str:
    return (
        f"(({tf_expr})::DOUBLE / (({tf_expr})::DOUBLE + {K1} * "
        f"((1.0 - {B}) + {B} * ({dlq_expr})::DOUBLE / ({avgdl_expr})::DOUBLE)))"
    )


def block_max_bound(max_tf_part: float, idf: float) -> float:
    """Upper bound of any score contribution from a posting block."""
    return idf * max_tf_part
