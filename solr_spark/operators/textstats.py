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


# ---------------------------------------------------------------------------
# Training-data pipeline ops: PII scrubbing, benchmark-contamination
# scoring, token-budget sequence packing. No reference counterpart —
# these extend the curation family (dedup/quality/langid) with the
# remaining operations a pretraining corpus build runs at 100 TB. All
# deterministic; regex patterns are RE2-safe so the DuckDB twins run the
# SAME pattern strings.
# ---------------------------------------------------------------------------

#: (label, pattern, replacement) — order matters: SSN before PHONE so a
#: 3-2-4 digit group is labeled SSN, not swallowed as a phone tail
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\+?\d{1,2}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_scrub_col(text_col) -> "F.Column":
    """Redact PII spans in place (emails, SSNs, phone shapes, IPv4) —
    chained regexp_replace, whole-stage codegen."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc count of each PII type (regexp_count) — the audit frame
    a scrub job reports before/after."""
    return docs.select(
        F.col(id_col).cast("long").alias("docid"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{label}")
            for label, pat, _ in PII_PATTERNS
        ],
    )


def pii_scrub_sql(expr: str) -> str:
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def pii_counts_sql(text_expr: str) -> list[str]:
    out = []
    for label, pat, _ in PII_PATTERNS:
        p = pat.replace("'", "''")
        out.append(
            f"len(regexp_extract_all({text_expr}, '{p}')) AS n_{label}"
        )
    return out


def contamination(
    doc_tok: DataFrame,
    bench_tok: DataFrame,
    n: int = 8,
) -> DataFrame:
    """Benchmark-contamination score: fraction of each document's
    n-gram shingles that appear in the benchmark set (the standard
    train/test decontamination check). Shapes for scale: benchmark
    shingles are DISTINCT'd before the join (a hot shingle cannot fan
    out), the join is a semi-join-shaped inner on the shingle hash,
    and per-doc totals aggregate once. Frames carry (docid, toks).
    Score 0.0 for docs with fewer than n tokens (no shingles)."""
    from solr_spark.analysis.analyzer import shingle_col

    def sh(df):
        return df.select(
            "docid",
            F.explode(
                shingle_col(F.col("toks"), n, "\x1f", output_unigrams=False)
            ).alias("sh"),
        ).select("docid", F.md5("sh").alias("h"))

    doc_sh = sh(doc_tok)
    bench = sh(bench_tok).select("h").distinct()
    totals = doc_sh.groupBy("docid").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        doc_sh.join(bench, "h", "left_semi")
        .groupBy("docid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        doc_tok.select("docid")
        .join(totals, "docid", "left")
        .join(hits, "docid", "left")
        .select(
            "docid",
            F.coalesce("n_sh", F.lit(0)).alias("n_sh"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.when(
                    F.coalesce("n_sh", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(
                    F.coalesce("n_hit", F.lit(0))
                    / F.col("n_sh").cast("double")
                ),
                4,
            ).alias("contamination"),
        )
    )


def pack_sequences(
    df: DataFrame, id_col: str, ntok_col: str, budget: int
) -> DataFrame:
    """Token-budget shard assignment for training-data packing: docs in
    `id_col` order are laid end-to-end; each doc's pack_id =
    floor(token_offset / budget) where token_offset is the exact prefix
    sum of earlier docs' `ntok_col`. Documents are never split — the
    straddler belongs to the pack its first token lands in.

    The prefix sum is the same scale-safe two-phase shape as
    assign_docids (index/builder.py:121): range-partition the NARROW
    (id, ntok) projection, collect one sum per partition, then an
    Arrow-batched local cumsum + offset per partition — no global
    single-partition window anywhere."""
    from pyspark import TaskContext
    from pyspark.sql.types import LongType, StructField, StructType

    narrow = (
        df.select(F.col(id_col).alias("__pk_id"), F.col(ntok_col).alias("__pk_n"))
        .repartitionByRange("__pk_id")
        .sortWithinPartitions("__pk_id")
    ).persist()
    sums = (
        narrow.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("__pk_n").alias("s"))
        .collect()
    )
    part_sum = {r["pid"]: int(r["s"]) for r in sums}
    offsets, acc = {}, 0
    for pid in range(max(part_sum, default=-1) + 1):
        offsets[pid] = acc
        acc += part_sum.get(pid, 0)

    schema = StructType(
        list(narrow.schema.fields)
        + [
            StructField("token_offset", LongType(), False),
            StructField("pack_id", LongType(), False),
        ]
    )

    def add_packs(batches):
        import pandas as pd

        base = offsets.get(TaskContext.get().partitionId(), 0)
        run = base
        for b in batches:
            before = b["__pk_n"].astype("int64").cumsum() - b["__pk_n"]
            off = run + before
            out = b.copy()
            out["token_offset"] = off
            out["pack_id"] = off // budget
            run += int(b["__pk_n"].sum())
            yield out

    packed = narrow.mapInPandas(add_packs, schema=schema)
    out = df.join(
        packed.select(
            F.col("__pk_id"), "token_offset", "pack_id"
        ),
        df[id_col] == F.col("__pk_id"),
    ).drop("__pk_id")
    return out


# ---------------------------------------------------------------------------
# Round-5 additions: deterministic corpus mixing + within-doc repetition
# signals (the Gopher-style repetition filters). Both are pure
# DataFrame/Column plans with exact DuckDB twins built from the same
# constants — no RNG, no UDFs, no driver loops.
# ---------------------------------------------------------------------------

#: hash-bucket space for mix_sample rates — rates are quantized to
#: 1/MIX_BUCKETS so the keep predicate compares INTEGERS (a float
#: `u < rate` compare would hinge on representation at the boundary)
MIX_BUCKETS = 10000


def _mix_bucket_col(id_col: str):
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(MIX_BUCKETS),
    )


def mix_sample(
    docs: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """Deterministic stratified corpus mixing: keep each document with
    its group's sampling rate, decided by a portable hash of the id —
    the training-mix operator ("2x books, 0.3x web") a 100 TB corpus
    build runs last. Per-row predicate, no shuffle, no RNG: the SAME
    document set is kept at any parallelism, on any engine, on re-runs
    (md5-bucket sampling, like the random() stream's sampler). Rates
    quantize to 1/MIX_BUCKETS and compare as integers, so engines can't
    disagree at the keep boundary. Rates > 1.0 (upsampling) belong to a
    repeat-explode step, not here — values are clamped to [0, 1]."""
    thr = F.lit(int(round(max(0.0, min(1.0, default)) * MIX_BUCKETS)))
    for g in sorted(rates):
        r = max(0.0, min(1.0, float(rates[g])))
        thr = F.when(
            F.col(group_col) == g, F.lit(int(round(r * MIX_BUCKETS)))
        ).otherwise(thr)
    return docs.where(_mix_bucket_col(id_col) < thr)


def mix_sample_sql(
    table: str,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default: float = 0.0,
) -> str:
    """WHERE clause of `mix_sample` for a DuckDB twin (same buckets)."""
    whens = " ".join(
        f"WHEN '{g}' THEN {int(round(max(0.0, min(1.0, float(rates[g]))) * MIX_BUCKETS))}"
        for g in sorted(rates)
    )
    dflt = int(round(max(0.0, min(1.0, default)) * MIX_BUCKETS))
    return (
        f"(('0x' || substr(md5({id_col}::VARCHAR), 1, 8))::BIGINT % {MIX_BUCKETS})"
        f" < (CASE {group_col} {whens} ELSE {dflt} END)"
    )


def repetition_signals(tok_df: DataFrame, n: int = 2) -> DataFrame:
    """Within-document repetition features (the Gopher quality-filter
    family, parametric in n-gram size — Gopher thresholds n=2..10):
    per doc, the fraction of n-gram instances taken by the single most
    frequent n-gram (`top_bigram_frac`) and the fraction of n-gram
    instances whose n-gram occurs more than once (`dup_bigram_frac`).
    Boilerplate/spam pages score high; docs with fewer than n tokens
    have no n-grams and score 0.0. Column names keep the n=2 spelling
    for the gate contract at any n.

    Shape for scale: n-grams explode from the token array (transform
    over index range + slice-join — JVM codegen, no Python), counts
    aggregate per (docid, ngram) with map-side partial agg, then ONE
    per-doc agg. Both shuffles are keyed by docid(+ngram) — no skew
    beyond document length, which the corpus already bounds."""
    n = int(n)
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    bgs = F.when(
        F.size("toks") >= n,
        F.expr(
            f"transform(sequence(1, size(toks) - {n - 1}),"
            f" i -> array_join(slice(toks, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        tok_df.select("docid", F.explode(bgs).alias("bg"))
        .groupBy("docid", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("docid").agg(
        F.sum("c").alias("n_bg"),
        F.max("c").alias("max_bg"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
            "dup_inst"
        ),
    )
    return (
        tok_df.select("docid")
        .join(per_doc, "docid", "left")
        .select(
            "docid",
            F.coalesce("n_bg", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.when(F.coalesce("n_bg", F.lit(0)) == 0, F.lit(0.0)).otherwise(
                    F.col("max_bg") / F.col("n_bg").cast("double")
                ),
                4,
            ).alias("top_bigram_frac"),
            F.round(
                F.when(F.coalesce("n_bg", F.lit(0)) == 0, F.lit(0.0)).otherwise(
                    F.col("dup_inst") / F.col("n_bg").cast("double")
                ),
                4,
            ).alias("dup_bigram_frac"),
        )
    )


def repetition_signals_sql(n: int = 2) -> str:
    """DuckDB twin of `repetition_signals` over the documents view."""
    n = int(n)
    joined = " || ' ' || ".join(
        f"toks[i+{j}]" if j else "toks[i]" for j in range(n)
    )
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents),
bg AS (
  SELECT docid,
         unnest(list_transform(range(1, len(toks) - {n - 2}),
                               i -> {joined})) AS bg
  FROM toks WHERE len(toks) >= {n}
), cnt AS (
  SELECT docid, bg, count(*) AS c FROM bg GROUP BY docid, bg
), per_doc AS (
  SELECT docid, sum(c) AS n_bg, max(c) AS max_bg,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_inst
  FROM cnt GROUP BY docid
)
SELECT t.docid,
       coalesce(p.n_bg, 0)::BIGINT AS n_bigrams,
       round(CASE WHEN coalesce(p.n_bg, 0) = 0 THEN 0.0
             ELSE p.max_bg / p.n_bg::DOUBLE END, 4) AS top_bigram_frac,
       round(CASE WHEN coalesce(p.n_bg, 0) = 0 THEN 0.0
             ELSE p.dup_inst / p.n_bg::DOUBLE END, 4) AS dup_bigram_frac
FROM toks t LEFT JOIN per_doc p ON p.docid = t.docid
ORDER BY t.docid
"""


# --- n-gram LM scoring (stupid backoff) -----------------------------------
#
# The perplexity-style quality signal the big pipeline papers filter
# on (CCNet/Gopher use a KenLM 5-gram; the signal here is the same
# shape with a bigram model and stupid backoff): score each document
# by its average bigram log-probability under a count model trained
# on a reference slice. Low average log-prob = far from the reference
# distribution (gibberish, boilerplate, wrong language).


def lm_counts(tok_df: DataFrame):
    """(docid, toks) -> (uni, bi) count frames for the bigram LM.

    uni: (t, cu) token counts; bi: (w1, w2, cb) adjacent-pair counts.
    Two token-scale groupBys (map-side partial agg), no Python.
    """
    uni = (
        tok_df.select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    pairs = tok_df.select(
        F.expr("slice(toks, 1, greatest(size(toks) - 1, 0))").alias("a"),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))").alias("b"),
    )
    bi = (
        pairs.select(F.explode(F.arrays_zip("a", "b")).alias("p"))
        .select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    return uni, bi


def lm_doc_logprob(
    score_tok: DataFrame,
    model_tok: DataFrame = None,
    alpha: float = 0.4,
    counts=None,
) -> DataFrame:
    """Average stupid-backoff bigram log-prob per document:
    (docid, n_bigrams, avg_logprob), one row per doc with >= 1 bigram.

    P(w2 | w1) = cb(w1,w2) / cu(w1)          when the model saw the pair
               = alpha * cu(w2) / total      otherwise (backoff), with
                 OOV w2 backing off to a count of 1.

    Shapes for scale: the model frames are one row per distinct
    token/pair (far smaller than the corpus); the score-side bigrams
    join them on their natural keys — three hash joins Catalyst/AQE
    sizes freely (broadcast when the model fits, shuffle when it
    doesn't) — then ONE per-doc agg. No Python anywhere.

    The plan joins the unigram table twice (as cu1 and cu2), and
    Catalyst re-derives it per join — three model scans. For a big
    model slice, materialize once and pass `counts`:
        counts = tuple(c.persist() for c in lm_counts(model_tok))
    """
    if counts is not None:
        uni, bi = counts
    else:
        uni, bi = lm_counts(model_tok)
    total = uni.agg(F.sum("cu").cast("double").alias("n_total"))
    docbi = (
        score_tok.select(
            "docid",
            F.expr("slice(toks, 1, greatest(size(toks) - 1, 0))").alias("a"),
            F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))").alias("b"),
        )
        .select("docid", F.explode(F.arrays_zip("a", "b")).alias("p"))
        .select("docid", F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
    )
    scored = (
        docbi.join(bi, ["w1", "w2"], "left")
        .join(
            uni.select(F.col("t").alias("w1"), F.col("cu").alias("cu1")),
            "w1",
            "left",
        )
        .join(
            uni.select(F.col("t").alias("w2"), F.col("cu").alias("cu2")),
            "w2",
            "left",
        )
        .crossJoin(total)
        .select(
            "docid",
            F.when(
                F.col("cb").isNotNull(),
                F.log(F.col("cb") / F.col("cu1").cast("double")),
            )
            .otherwise(
                F.log(
                    F.lit(float(alpha))
                    * F.coalesce(F.col("cu2"), F.lit(1)).cast("double")
                    / F.col("n_total")
                )
            )
            .alias("lp"),
        )
    )
    return scored.groupBy("docid").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )
