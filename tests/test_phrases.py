"""Phrase identification (PhrasesIdentificationComponent semantics):
the Spark stats + driver lattice scoring vs an independent pure-Python
recompute of the reference's computeFieldScore model."""

import itertools

from pyspark.sql import functions as F  # noqa: F401

from solr_spark.operators import phrases as PH

CORPUS = [
    (1, ["the", "quick", "brown", "fox", "jumped"]),
    (2, ["brown", "fox", "brown", "fox", "lazy", "dog"]),
    (3, ["brown", "dog", "fox", "brown"]),
    (4, ["the", "lazy", "dog"]),
    (5, ["fox", "trot", "brown", "sugar"]),
]


def _tok(spark):
    return spark.createDataFrame(CORPUS, "docid long, toks array<string>")


def _py_stats(qterms, max_indexed, max_query):
    """Independent recompute: ttf/df/conj from plain Python loops."""
    texts = set()
    n = len(qterms)
    for m in range(1, min(max_query, n) + 1):
        for s in range(n - m + 1):
            texts.add(" ".join(qterms[s : s + m]))
    stats = {}
    for t in texts:
        words = t.split(" ")
        ttf = df = conj = 0
        for _, toks in CORPUS:
            if len(words) <= max_indexed:
                hits = sum(
                    1
                    for i in range(len(toks) - len(words) + 1)
                    if toks[i : i + len(words)] == words
                )
                ttf += hits
                df += 1 if hits else 0
            if set(words) <= set(toks):
                conj += 1
        stats[t] = (ttf, df, conj)
    return stats


def test_stats_match_python(spark):
    q = ["brown", "fox", "lazy"]
    got = {
        r["t"]: (r["ttf"], r["df"], r["conj_dc"])
        for r in PH.phrase_candidate_stats(_tok(spark), q, 2, 3).collect()
    }
    assert got == _py_stats(q, 2, 3)


def test_scores_match_independent_model(spark):
    q = ["lazy", "brown", "fox"]
    out = PH.identify_phrases(
        _tok(spark), " ".join(q), max_indexed=2, max_query=3, min_score=-10.0
    ).collect()
    stats = _py_stats(q, 2, 3)
    scored = PH.score_phrases(stats, q, 2, 3)
    expect = {
        (p.start, p.start + p.length): round(p.score, 6)
        for p in scored
        if p.length > 1 and p.score > -10.0
    }
    got = {(r["position_start"], r["position_end"]): r["score"] for r in out}
    assert got == expect
    # "brown fox" (positions 2..4) must be the top phrase: it occurs 4x
    # as a shingle while "lazy brown" never does
    top = max(out, key=lambda r: r["score"])
    assert top["text"] == "brown fox"
    assert top["score"] > 0


def test_conjunction_zero_disqualifies(spark):
    # "jumped sugar" never co-occur in one doc -> conj 0 -> score -1,
    # excluded at the default min_score
    out = PH.identify_phrases(_tok(spark), "jumped sugar", 2, 3).collect()
    assert out == []


def test_unigrams_never_returned(spark):
    out = PH.identify_phrases(
        _tok(spark), "brown fox", 2, 3, min_score=-100.0
    ).collect()
    assert all(r["position_end"] - r["position_start"] >= 2 for r in out)


def test_indexed_self_is_sole_subphrase():
    q = ["a", "b", "c", "d"]
    cands = PH._candidates(q, 3, 4)
    scored = PH.score_phrases(
        {c.text: (1, 1, 1) for c in cands}, q, 3, 4
    )
    by = {(c.start, c.length): c for c in scored}
    p = next(c for c in scored if c.start == 1 and c.length == 2)
    assert [s.text for s in p.sub_phrases] == ["a b"]
    # the 4-token phrase decomposes into the two 3-token windows
    p4 = next(c for c in scored if c.length == 4)
    assert [s.text for s in p4.sub_phrases] == ["a b c", "b c d"]
    # supers of "b c" include both 3-grams containing it
    bc = by[(2, 2)]
    sup = {s.text for s in bc.supers}
    assert sup == {"a b c", "b c d"}


def test_permutation_of_docs_is_stable(spark):
    """Stats are set-aggregates: permuting the corpus rows must not
    change any score."""
    q = "lazy brown fox"
    a = PH.identify_phrases(_tok(spark), q, 2, 3, min_score=-10.0).collect()
    rows = list(itertools.chain(reversed(CORPUS)))
    tok_b = spark.createDataFrame(rows, "docid long, toks array<string>")
    b = PH.identify_phrases(tok_b, q, 2, 3, min_score=-10.0).collect()
    assert a == b


def test_repeated_word_query(spark):
    """Repeated tokens produce duplicate candidate texts at different
    spans — stats dedupe by text, scoring stays span-keyed."""
    corpus2 = CORPUS + [(6, ["brown", "brown", "fox"])]
    tok = spark.createDataFrame(corpus2, "docid long, toks array<string>")
    out = PH.identify_phrases(
        tok, "brown brown fox", 2, 3, min_score=-100.0
    ).collect()
    spans = {(r["position_start"], r["position_end"]) for r in out}
    # all three multi-word spans scored
    assert spans == {(1, 3), (2, 4), (1, 4)}
