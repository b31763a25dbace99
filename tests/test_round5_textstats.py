"""Round-5 textstats additions: deterministic corpus mixing +
within-doc repetition signals (Gopher-style quality filters)."""

from pyspark.sql import functions as F

from solr_spark.operators import textstats as TS

RATES = {"0": 1.0, "1": 0.0, "2": 0.5}


def _docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_mix_sample_rates_and_bounds(spark):
    kept = TS.mix_sample(_docs(spark), "doc_id", "grp", RATES, default=0.25)
    by_grp = {
        r["grp"]: r["n"]
        for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert by_grp.get("0") == 500, "rate 1.0 must keep every row"
    assert "1" not in by_grp, "rate 0.0 must keep no rows"
    # md5 buckets are uniform; 500 draws at p=0.5 / p=0.25 stay well
    # inside these bounds
    assert 180 < by_grp.get("2", 0) < 320
    assert 60 < by_grp.get("3", 0) < 190


def test_mix_sample_partitioning_independent(spark):
    a = TS.mix_sample(_docs(spark), "doc_id", "grp", RATES, default=0.25)
    b = TS.mix_sample(
        _docs(spark).repartition(13), "doc_id", "grp", RATES, default=0.25
    )
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b


def test_repetition_signals_hand_case(spark):
    tok = spark.createDataFrame(
        [
            (0, ["a", "b", "a", "b", "c"]),  # bigrams: ab ba ab bc
            (1, ["x"]),  # too short: no bigrams
            (2, ["p", "q"]),  # one bigram, unique
        ],
        "docid long, toks array<string>",
    )
    out = {r["docid"]: r for r in TS.repetition_signals(tok).collect()}
    assert out[0]["n_bigrams"] == 4
    assert out[0]["top_bigram_frac"] == 0.5  # 'a b' twice of 4
    assert out[0]["dup_bigram_frac"] == 0.5  # the two 'a b' instances
    assert out[1]["n_bigrams"] == 0
    assert out[1]["top_bigram_frac"] == 0.0
    assert out[2]["n_bigrams"] == 1
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 1.0


def test_repetition_signals_parametric_n(spark):
    tok = spark.createDataFrame(
        [
            (0, ["a", "b", "c", "a", "b", "c"]),  # trigrams: abc bca cab abc
            (1, ["x", "y"]),  # too short for n=3
        ],
        "docid long, toks array<string>",
    )
    out = {r["docid"]: r for r in TS.repetition_signals(tok, n=3).collect()}
    assert out[0]["n_bigrams"] == 4
    assert out[0]["top_bigram_frac"] == 0.5  # 'a b c' twice of 4
    assert out[0]["dup_bigram_frac"] == 0.5
    assert out[1]["n_bigrams"] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        TS.repetition_signals(tok, n=1)


# --- duplicate-span (exact-substring) dedup --------------------------------


def _tok_rows(spark, rows):
    return spark.createDataFrame(rows, "docid long, toks array<string>")


def _span_corpus(spark):
    shared = ["a", "b", "c", "d"]  # a 4-token span planted in docs 1 and 3
    return _tok_rows(
        spark,
        [
            (1, shared + ["x", "y", "z"]),
            (2, ["p", "q", "r", "s", "t"]),
            (3, ["m", "n"] + shared),
            (4, ["u", "v"]),  # shorter than n: no spans
            (5, ["k"] * 9),  # self-repetition: k,k,k,k occurs 6 times
        ],
    )


def test_dup_span_stats_cross_and_self(spark):
    from solr_spark.operators import dedup as DD

    out = {
        r["docid"]: r.asDict()
        for r in DD.dup_span_stats(_span_corpus(spark), n=4).collect()
    }
    assert 4 not in out, "docs shorter than n contribute no rows"
    assert out[1]["n_spans"] == 4 and out[1]["n_dup"] == 1
    assert out[3]["n_spans"] == 3 and out[3]["n_dup"] == 1
    assert out[2]["n_dup"] == 0
    # all 6 spans of doc 5 are the same hash -> all duplicated
    assert out[5]["n_spans"] == 6 and out[5]["n_dup"] == 6
    assert out[5]["dup_frac"] == 1.0


def test_dup_span_occurrences_keep_first(spark):
    from solr_spark.operators import dedup as DD

    occ = DD.dup_span_occurrences(_span_corpus(spark), n=4).collect()
    got = sorted((r["docid"], r["pos"]) for r in occ)
    # shared span: canonical is (1, 1), so (3, 3) is removed;
    # doc 5's canonical is (5, 1), so positions 2..6 are removed
    assert got == [(3, 3)] + [(5, p) for p in range(2, 7)]


# --- bigram LM (stupid backoff) --------------------------------------------


def test_lm_doc_logprob_branches(spark):
    import math

    model = _tok_rows(spark, [(1, ["the", "cat", "sat"]), (2, ["the", "dog"])])
    # uni: the=2, cat=1, sat=1, dog=1 (total 5)
    # bi:  (the,cat)=1 (cat,sat)=1 (the,dog)=1
    score = _tok_rows(
        spark,
        [
            (10, ["the", "cat"]),          # seen bigram: ln(1/2)
            (11, ["cat", "dog"]),          # unseen pair: ln(.4*1/5)
            (12, ["the", "zebra"]),        # OOV w2 -> ln(.4*1/5)
            (13, ["x"]),                   # no bigrams: no row
        ],
    )
    out = {
        r["docid"]: r.asDict()
        for r in TS.lm_doc_logprob(score, model, alpha=0.4).collect()
    }
    assert 13 not in out
    assert out[10]["avg_logprob"] == round(math.log(0.5), 4)
    assert out[11]["avg_logprob"] == round(math.log(0.4 * 1 / 5.0), 4)
    assert out[12]["avg_logprob"] == round(math.log(0.4 * 1 / 5.0), 4)
    assert out[10]["n_bigrams"] == 1


def test_lm_self_scoring_never_backs_off(spark):
    """Self-scored corpus: every doc bigram is in the model, so every
    log-prob is ln(cb/cu(w1)) >= ln(1/total) — finite and > backoff
    floor ln(alpha/total)."""
    import math

    corp = _tok_rows(
        spark, [(i, ["w%d" % (i % 3), "w%d" % ((i + 1) % 3), "z"]) for i in range(9)]
    )
    out = TS.lm_doc_logprob(corp, corp).collect()
    assert len(out) == 9
    floor = math.log(0.4 / 18.0)
    assert all(r["avg_logprob"] > floor for r in out)


def test_remove_dup_spans_keep_first(spark):
    from solr_spark.operators import dedup as DD

    out = {
        r["docid"]: r.asDict()
        for r in DD.remove_dup_spans(_span_corpus(spark), n=4).collect()
    }
    assert len(out) == 5, "every input doc keeps a row"
    # doc 1 holds the canonical 'a b c d' -> untouched
    assert out[1]["toks"] == ["a", "b", "c", "d", "x", "y", "z"]
    assert out[1]["n_removed"] == 0
    # doc 3's copy is non-canonical -> its 4 covered tokens drop
    assert out[3]["toks"] == ["m", "n"]
    assert out[3]["n_removed"] == 4
    # doc 5 (k x9): canonical span at pos 1 covers tokens 1-4; spans at
    # pos 2..6 cover 2..9 -> tokens 5..9 are only covered by
    # non-canonical spans, but 2..4 are shared with the canonical one —
    # removal drops every token covered by a NON-canonical occurrence
    assert out[5]["toks"] == ["k"]
    assert out[5]["n_removed"] == 8
    # untouched docs: no duplicated spans / too short
    assert out[2]["n_removed"] == 0 and out[4]["n_removed"] == 0


def test_remove_then_rescan_finds_no_cross_doc_dups(spark):
    """Metamorphic: after removal, re-scanning finds no span that
    occurs in two different documents (self-repeats inside one
    canonical doc may survive when overlap re-creates them; cross-doc
    duplication must be gone)."""
    from solr_spark.operators import dedup as DD

    cleaned = DD.remove_dup_spans(_span_corpus(spark), n=4).select(
        "docid", "toks"
    )
    spans = DD.span_hashes(cleaned, n=4)
    cross = (
        spans.groupBy("h")
        .agg(F.countDistinct("docid").alias("nd"))
        .where(F.col("nd") >= 2)
        .count()
    )
    assert cross == 0
