"""Text-analysis operators for training-data pipelines.

Language-ID mirrors the *role* of the reference's langid contrib
(solr/contrib/langid/) with a deterministic stopword-hit heuristic;
quality scoring / token counting / fingerprinting are the curation ops
a 100TB text pipeline needs. All are pure column expressions sharing the
analyzer, each with an exact DuckDB-SQL twin (generated here, same
wordlists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokens_sql

# tiny deterministic stopword lists; alphabetical keys = tie-break order
LANG_WORDS = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de", "le", "shi", "he", "zai"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _count_in(tokens_col, words: list[str]):
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(wl, t)))


def token_counts(tok_df: DataFrame) -> DataFrame:
    """(docid, toks) -> token count + distinct terms."""
    return tok_df.select(
        "docid",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_terms"),
    ).orderBy("docid")


def quality_score(docs: DataFrame, id_col: str, text_col: str, tok_df: DataFrame) -> DataFrame:
    """Length / stopword-ratio quality features + a linear score."""
    base = docs.select(
        F.col(id_col).cast("long").alias("docid"),
        F.length(text_col).alias("n_chars_text"),
    )
    feats = tok_df.select(
        "docid",
        F.size("toks").alias("n_tokens"),
        _count_in(F.col("toks"), EN_STOPWORDS).alias("n_stop"),
    )
    out = base.join(feats, "docid").select(
        "docid",
        "n_tokens",
        F.round(
            F.col("n_stop").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            4,
        ).alias("stop_ratio"),
        F.round(
            F.col("n_chars_text").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
            4,
        ).alias("chars_per_token"),
    )
    # NB: coefficients keep the result an exact 4-decimal quantity — a
    # 0.5x coefficient would manufacture .00005 half-ties that double
    # rounding resolves differently across engines.
    quality = F.round(
        F.col("stop_ratio")
        + F.lit(0.001) * F.least(F.col("n_tokens"), F.lit(500)).cast("double"),
        4,
    )
    return out.withColumn("quality", quality).orderBy("docid")


def lang_id(tok_df: DataFrame) -> DataFrame:
    """Deterministic stopword-hit language guess; ties -> alphabetical."""
    scores = {
        lang: _count_in(F.col("toks"), words) for lang, words in LANG_WORDS.items()
    }
    df = tok_df.select(
        "docid", *[scores[lang].alias(f"s_{lang}") for lang in sorted(LANG_WORDS)]
    )
    langs = sorted(LANG_WORDS)
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        clause = F.when(cond, F.lit(lang))
        pred = clause if pred is None else pred.when(cond, F.lit(lang))
    df = df.withColumn("pred_lang", pred.otherwise(F.lit(langs[-1])))
    return df.select("docid", "pred_lang").orderBy("docid")


def lang_id_col(text_col):
    """`lang_id` as a single Column over raw text (tokenize + stopword
    hit counts + deterministic argmax, ties alphabetical) — the form
    the TikaLanguageIdentifier-style update processor plugs into a doc
    chain. Same decision rule as `lang_id`, so the two agree."""
    from solr_spark.analysis.analyzer import tokens_col

    toks = tokens_col(text_col)
    langs = sorted(LANG_WORDS)
    scores = {lang: _count_in(toks, LANG_WORDS[lang]) for lang in langs}
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, F.lit(lang))
            if pred is None
            else pred.when(cond, F.lit(lang))
        )
    return pred.otherwise(F.lit(langs[-1]))


def fingerprint(tok_df: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    the signature role of SignatureUpdateProcessorFactory (ref
    solr/core/src/java/org/apache/solr/update/processor/SignatureUpdateProcessorFactory.java)
    but token-order-insensitive."""
    return tok_df.select(
        "docid",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("toks")))).alias("fp"),
    ).orderBy("docid")


# ---------------- DuckDB SQL twins ----------------


def _count_in_sql(toks: str, words: list[str]) -> str:
    wl = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks}, _w -> list_contains({wl}, _w)))"


def token_counts_sql() -> str:
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents)
SELECT docid, len(toks)::INT AS n_tokens,
       len(list_distinct(toks))::INT AS n_terms
FROM toks ORDER BY docid
"""


def quality_score_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS docid, length(text) AS n_chars_text,
         {tokens_sql('text')} AS toks
  FROM documents
), feats AS (
  SELECT docid, len(toks) AS n_tokens,
         {_count_in_sql('toks', EN_STOPWORDS)} AS n_stop,
         n_chars_text
  FROM toks
)
SELECT docid, n_tokens::INT AS n_tokens,
       round(n_stop::DOUBLE / greatest(n_tokens, 1)::DOUBLE, 4) AS stop_ratio,
       round(n_chars_text::DOUBLE / greatest(n_tokens, 1)::DOUBLE, 4) AS chars_per_token,
       round(round(n_stop::DOUBLE / greatest(n_tokens, 1)::DOUBLE, 4)
             + 0.001 * least(n_tokens, 500)::DOUBLE, 4) AS quality
FROM feats ORDER BY docid
"""


def lang_id_sql() -> str:
    langs = sorted(LANG_WORDS)
    score_exprs = ",\n         ".join(
        f"{_count_in_sql('toks', LANG_WORDS[lang])} AS s_{lang}" for lang in langs
    )
    cases = []
    for lang in langs:
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs if other != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents),
scores AS (
  SELECT docid,
         {score_exprs}
  FROM toks
)
SELECT docid, {case_sql} AS pred_lang FROM scores ORDER BY docid
"""


def fingerprint_sql() -> str:
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents)
SELECT docid,
       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
FROM toks ORDER BY docid
"""
