"""Phrase identification: score candidate multi-word phrases in a query
string against corpus shingle statistics.

Re-expresses the reference's PhrasesIdentificationComponent
(solr/core/src/java/org/apache/solr/handler/component/
PhrasesIdentificationComponent.java): candidate phrases are every token
subsequence of the query up to maxQueryPositionLength; each is scored
per field with the Bayesian document-categorization model of
computeFieldScore (PhrasesIdentificationComponent.java:953-1086) from
three corpus statistics — shingle total-term-frequency (ttf), shingle
doc-frequency (df), and the conjunction doc-count (docs containing ALL
of the phrase's unigrams, SolrIndexSearcher numDocs of a BooleanQuery
in the reference, :718-726).

Spark-first split: the reference gathers stats from the index
per-shard then scores on the coordinator; here the stats are TWO
corpus passes (one shingle explode filtered to the broadcast candidate
set for ttf/df; one distinct (docid, term) semi-join + per-(phrase,
doc) conjunction count), and the scoring runs driver-side over the
tiny candidate lattice — O(maxQuery^2) phrases — exactly where the
reference computes it. No per-row Python anywhere; the candidate set
is a literal IN filter pushed into the scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


@dataclass
class _Phrase:
    start: int  # 1-based first token position
    length: int
    text: str
    terms: tuple
    is_indexed: bool
    score: float = -1.0
    # filled during scoring
    sub_phrases: list = field(default_factory=list)
    supers: list = field(default_factory=list)


def _candidates(qterms: list[str], max_indexed: int, max_query: int):
    """Every token window of the query, 1..max_query long (the
    extractPhrases lattice for a shingle analyzer)."""
    out = []
    n = len(qterms)
    for m in range(1, min(max_query, n) + 1):
        for s in range(0, n - m + 1):
            terms = tuple(qterms[s : s + m])
            out.append(
                _Phrase(
                    start=s + 1,
                    length=m,
                    text=" ".join(terms),
                    terms=terms,
                    is_indexed=m <= max_indexed,
                )
            )
    return out


def phrase_candidate_stats(
    tok_df: DataFrame,
    query_terms: list[str],
    max_indexed: int = 3,
    max_query: int = 7,
) -> DataFrame:
    """Corpus statistics for every candidate window of `query_terms`:
    (t, length, ttf, df, conj_dc), one row per DISTINCT candidate text.

    ttf/df are 0 for windows longer than max_indexed (not indexed as
    shingles — the reference only consults the shingled field up to
    maxIndexedPositionLength); conj_dc is computed for every window.
    """
    from solr_spark.analysis.analyzer import shingle_col

    cands = _candidates(list(query_terms), max_indexed, max_query)
    indexed_texts = sorted({c.text for c in cands if c.is_indexed})
    all_texts = sorted({c.text for c in cands})
    uniq_terms = sorted({t for c in cands for t in c.terms})
    spark = tok_df.sparkSession

    # pass 1: shingle ttf/df, one explode over the union of sizes,
    # pruned to the candidate texts right after Generate
    sizes = range(1, max_indexed + 1)
    sh_union = F.flatten(
        F.array(*[shingle_col(F.col("toks"), m, " ", False) for m in sizes])
    )
    ttf_df = (
        tok_df.select("docid", F.explode(sh_union).alias("t"))
        .where(F.col("t").isin(indexed_texts))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("ttf"),
            F.countDistinct("docid").alias("df"),
        )
    )

    # pass 2: conjunction doc counts — docs containing ALL unigrams of
    # each candidate. (text, term) lattice is tiny -> broadcast join
    # against the distinct (docid, term) stream, count full matches.
    pt = spark.createDataFrame(
        [(c, w) for c in all_texts for w in sorted(set(c.split(" ")))],
        "t string, w string",
    )
    n_terms = {c: len(set(c.split(" "))) for c in all_texts}
    nt_df = spark.createDataFrame(list(n_terms.items()), "t string, n int")
    doc_terms = (
        tok_df.select("docid", F.explode(F.array_distinct("toks")).alias("w"))
        .where(F.col("w").isin(uniq_terms))
    )
    conj = (
        doc_terms.join(F.broadcast(pt), "w")
        .groupBy("t", "docid")
        .agg(F.countDistinct("w").alias("k"))
        .join(F.broadcast(nt_df), "t")
        .where(F.col("k") == F.col("n"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("conj_dc"))
    )

    base = spark.createDataFrame(
        [(c, len(c.split(" "))) for c in all_texts], "t string, length int"
    )
    return (
        base.join(ttf_df, "t", "left")
        .join(conj, "t", "left")
        .select(
            "t",
            "length",
            F.coalesce("ttf", F.lit(0)).alias("ttf"),
            F.coalesce("df", F.lit(0)).alias("df"),
            F.coalesce("conj_dc", F.lit(0)).alias("conj_dc"),
        )
    )


def score_phrases(
    stats: dict,
    qterms: list[str],
    max_indexed: int = 3,
    max_query: int = 7,
) -> list[_Phrase]:
    """Driver-side scoring of the candidate lattice given
    stats[text] = (ttf, df, conj_dc). Follows computeFieldScore
    line-for-line in semantics (see module docstring)."""
    cands = _candidates(list(qterms), max_indexed, max_query)
    by_span = {(c.start, c.length): c for c in cands}

    def ttf(c):
        return stats.get(c.text, (0, 0, 0))[0]

    def dfreq(c):
        return stats.get(c.text, (0, 0, 0))[1]

    def conj(c):
        return stats.get(c.text, (0, 0, 0))[2]

    for p in cands:
        # largest indexed sub-phrases: all windows of size
        # min(len, max_indexed) inside p
        m = min(p.length, max_indexed)
        p.sub_phrases = [
            by_span[(s, m)] for s in range(p.start, p.start + p.length - m + 1)
        ]
        # indexed super-phrases: strictly larger indexed windows fully
        # containing p
        p.supers = [
            c
            for c in cands
            if c.is_indexed
            and c.length > p.length
            and c.start <= p.start
            and p.start + p.length <= c.start + c.length
        ]

    for p in cands:
        conj_p = conj(p)
        if conj_p <= 0:
            p.score = -1.0
            continue
        if p.length <= 1:
            p.score = 0.0
            continue
        field_score = 0.0
        max_sub_conj = conj_p
        for words in p.sub_phrases:
            ttf_w = ttf(words)
            conj_w = conj(words)
            max_sub_conj = max(conj_w, max_sub_conj)
            max_wrap = max(
                (
                    0.0 if conj(s) <= 0 else dfreq(s) / conj(s)
                    for s in words.supers
                ),
                default=0.0,
            )
            uni_ttfs = [
                ttf(by_span[(pos, 1)])
                for pos in range(words.start, words.start + words.length)
            ]
            words_phrase_prob = ttf_w / float(min(uni_ttfs))
            words_not_phrase_prob = ttf_w / float(max(uni_ttfs))
            phrase_prob = conj_p / float(conj_w)
            phrase_score = words_phrase_prob * (phrase_prob - max_wrap)
            not_phrase_score = words_not_phrase_prob * (
                1.0 - (phrase_prob - max_wrap)
            )
            field_score += phrase_score - not_phrase_score
        field_score *= 1.0 / (1 + max_query - max_indexed)
        field_score *= conj_p / float(max_sub_conj)
        p.score = field_score
    return cands


def identify_phrases(
    tok_df: DataFrame,
    query_text: str,
    max_indexed: int = 3,
    max_query: int = 7,
    min_score: float = 0.0,
) -> DataFrame:
    """Scored phrases of `query_text` against the (docid, toks) corpus:
    (text, position_start, position_end, score), descending score,
    multi-word phrases scoring > min_score only (the component's
    summary view)."""
    from solr_spark.analysis.analyzer import tokenize_py

    qterms = tokenize_py(query_text)
    spark = tok_df.sparkSession
    if not qterms:
        return spark.createDataFrame(
            [],
            "text string, position_start int, position_end int, score double",
        )
    srows = phrase_candidate_stats(
        tok_df, qterms, max_indexed, max_query
    ).collect()
    stats = {r["t"]: (r["ttf"], r["df"], r["conj_dc"]) for r in srows}
    scored = score_phrases(stats, qterms, max_indexed, max_query)
    keep = [
        Row(
            text=p.text,
            position_start=p.start,
            position_end=p.start + p.length,
            score=round(p.score, 6),
        )
        for p in scored
        if p.length > 1 and p.score > min_score
    ]
    keep.sort(key=lambda r: (-r.score, r.position_start, r.position_end))
    return spark.createDataFrame(
        keep,
        "text string, position_start int, position_end int, score double",
    )
