"""Surround query parser: grammar + span semantics.

Mirrors core/src/test/org/apache/solr/search/TestSurroundQueryParser.java
(infix/prefix W and N operators, boolean composition, truncation) with
hand-computed span expectations on a pinned-docid corpus; the value-exact
DuckDB twin runs in tests/test_entry.py (surround_near / surround_trunc).
"""

import pytest

from solr_spark.index.builder import build_index
from solr_spark.query.surround import (
    BoolNode,
    NearNode,
    TermNode,
    parse_surround,
    surround_docids,
)

DOCS = {
    0: "alpha beta gamma",
    1: "alpha x beta",
    2: "beta alpha",
    3: "alpha x x beta gamma",
    4: "gamma beta alpha",
    5: "alphabet soup beta",
    6: "alpha beta alpha beta",
}


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    rows = [
        (f"r{i}", f"p/{i}", f"c{i}", "en", text, i)
        for i, text in DOCS.items()
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
        "content string, docid long"
    )
    out = str(tmp_path_factory.mktemp("srnd") / "index")
    return build_index(
        spark, corpus, out, num_buckets=4, build_blocks=False,
        build_positions=True,
    )


def _hits(index, q):
    return {r["docid"]: r["n_spans"] for r in surround_docids(index, q).collect()}


# ------------------------------------------------------------- parser

def test_parse_infix_defaults_and_distance():
    n = parse_surround("a w b")
    assert isinstance(n, NearNode) and n.ordered and n.dist == 1
    n = parse_surround("a 3N b")
    assert isinstance(n, NearNode) and not n.ordered and n.dist == 3


def test_parse_same_distance_chain_merges_nary():
    n = parse_surround("a w b w c")
    assert isinstance(n, NearNode) and len(n.children) == 3
    # differing distances nest left instead
    n = parse_surround("a w b 2w c")
    assert isinstance(n, NearNode) and n.dist == 2
    assert isinstance(n.children[0], NearNode) and n.children[0].dist == 1


def test_parse_prefix_form_and_precedence():
    n = parse_surround("3n(a, b, c)")
    assert isinstance(n, NearNode) and not n.ordered and n.dist == 3
    assert [c.spec for c in n.children] == ["a", "b", "c"]
    # OR binds loosest; N binds tighter than boolean ops
    n = parse_surround("a 2n b OR c")
    assert isinstance(n, BoolNode) and n.kind == "OR"
    assert isinstance(n.children[0], NearNode)
    assert isinstance(n.children[1], TermNode)


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_surround("a w")
    with pytest.raises(ValueError):
        parse_surround("(a w b")
    with pytest.raises(ValueError):
        parse_surround("a b)")


# ----------------------------------------------------------- semantics

def test_ordered_adjacent(index):
    # W = ordered, adjacent (slop 0): docs 0 and 6; doc 6 has two spans
    assert _hits(index, "alpha w beta") == {0: 1, 6: 2}


def test_ordered_distance(index):
    # 2W allows one intervening token (slop 1)
    assert _hits(index, "alpha 2w beta") == {0: 1, 1: 1, 6: 2}
    # 3W adds doc 3 (two gaps) and a third doc-6 span (alpha@1..beta@4,
    # gap 2 <= slop 2)
    assert _hits(index, "alpha 3w beta") == {0: 1, 1: 1, 3: 1, 6: 3}


def test_unordered_distance(index):
    # N = unordered adjacent: both orders count
    assert _hits(index, "alpha n beta") == {0: 1, 2: 1, 4: 1, 6: 3}
    # same-distance chain = ONE n-ary near, SUM of gaps <= 1: doc 3's
    # alpha..beta gap alone is 2, so only doc 0 survives
    assert _hits(index, "alpha 2w beta 2w gamma") == {0: 1}


def test_prefix_unordered_three_clause(index):
    # NearSpansUnordered: max(e)-min(s)-sum(len) <= slop 2; doc 3
    # (alpha@1 beta@4 gamma@5 -> 6-1-3 = 2) squeaks in
    assert _hits(index, "3n(alpha, beta, gamma)") == {0: 1, 3: 1, 4: 1}


def test_truncation_expands_dictionary(index):
    # alph* matches alpha AND alphabet
    got = _hits(index, "alph* n beta")
    assert got == {0: 1, 2: 1, 4: 1, 6: 3}
    got3 = _hits(index, "alph* 3n beta")
    assert 5 in got3  # alphabet soup beta


def test_boolean_composition(index):
    assert set(_hits(index, "alpha AND gamma")) == {0, 3, 4}
    assert set(_hits(index, "gamma NOT beta")) == set()
    assert set(_hits(index, "alphabet OR gamma")) == {0, 3, 4, 5}
    # OR inside a distance op (SpanOrQuery)
    assert set(_hits(index, "(alpha OR alphabet) w beta")) == {0, 6}


def test_or_legal_inside_near_and_not_is_not(index):
    with pytest.raises(ValueError):
        surround_docids(index, "(alpha AND beta) w gamma").collect()
