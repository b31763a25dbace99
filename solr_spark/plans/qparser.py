"""Lucene-syntax query parser: recursive descent -> boolean AST.

Re-expresses the grammar of the reference's JavaCC parser
(solr/core/src/java/org/apache/solr/parser/SolrQueryParserBase.java, ~1.3k
LoC; QueryParser.jj) as a small recursive-descent parser:

    query   := andExpr ((OR | <adjacent>) andExpr)*    # adjacency = q.op
    andExpr := unary (AND unary)*
    unary   := (NOT | '!' | '+' | '-')? atom ('^' boost)?
    atom    := '(' query ')' | primitive
    primitive := field ':' value | '"phrase"'('~'slop)? | word('*'|'~'N|'^'b)?
    value   := word | '"phrase"' | '[a TO b]' | '{a TO b}' | word'*'

Execution semantics (search/QParserPlugin.java registry analogues):
- bare words       -> BM25-scored terms (SHOULD under q.op=OR)
- +word / NOT word -> MUST / MUST_NOT (BooleanClause.Occur)
- field:value      -> non-scoring metadata filter (fq semantics,
                      search/SolrIndexSearcher.java:956 filter+query
                      separation — filters never affect the score)
- field:[a TO b]   -> range filter, endpoints TYPED at execution
                      (schema/FieldType.java:877); '*' = open end;
                      '{..}' exclusive like Lucene
- word* / word~N   -> term expansion (constant-score multiterm rewrite)
- term^2.5         -> boost multiplies the clause's score contribution
- "a b"~3          -> positional phrase with slop (needs positions index)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

SHOULD, MUST, MUST_NOT = "SHOULD", "MUST", "MUST_NOT"

CONTENT_FIELDS = {"content", "text", None}


# --------------------------------------------------------------- AST nodes


@dataclass
class Term:
    text: str               # raw (pre-analysis) word
    boost: float = 1.0


@dataclass
class PhraseNode:
    words: list[str]        # raw words between the quotes
    slop: int = 0
    boost: float = 1.0


@dataclass
class PrefixNode:
    text: str
    boost: float = 1.0


@dataclass
class FuzzyNode:
    text: str
    max_edits: int = 2
    boost: float = 1.0


@dataclass
class RangeVal:
    lo: str | None          # None = open end ('*')
    hi: str | None
    lo_inc: bool = True
    hi_inc: bool = True


@dataclass
class FieldClause:
    field: str
    op: str                 # eq | range | prefix
    value: object           # str for eq/prefix, RangeVal for range


@dataclass
class BoolNode:
    clauses: list[tuple[str, object]] = field(default_factory=list)
    # (occur, node) with occur in {SHOULD, MUST, MUST_NOT}


# -------------------------------------------------------------- tokenizer

_LEX = re.compile(
    r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<clause>
        (?:[A-Za-z_][\w.]*:)?              # optional field prefix
        (?: "[^"]*"(?:~\d+)?               # quoted phrase (+slop)
          | [\[{][^\]}]*[\]}]              # range (mixed brackets legal)
          | [^\s()"+\-!][^\s()"]*          # bare word (suffixes attached)
        )
        (?:\^\d+(?:\.\d+)?)?               # optional boost
    )
""",
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, str]]:
    toks = []
    for m in _LEX.finditer(q):
        kind = m.lastgroup
        toks.append((kind, m.group(0)))
    return toks


_RANGE = re.compile(r"^([\[{])(.*)\s+TO\s+(.*)([\]}])$")
_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)$")
_FIELD = re.compile(r"^([A-Za-z_][\w.]*):(.+)$", re.DOTALL)


def _primitive(text: str):
    """One clause token -> AST leaf node."""
    boost = 1.0
    bm = _BOOST.search(text)
    if bm:
        boost = float(bm.group(1))
        text = text[: bm.start()]
    fname = None
    fm = _FIELD.match(text)
    if fm and not text.startswith('"'):
        cand, rest = fm.group(1), fm.group(2)
        if cand not in CONTENT_FIELDS:
            fname = cand
            text = rest
        else:
            text = rest  # content:foo scores like bare foo
    if fname is not None:
        rm = _RANGE.match(text)
        if rm:
            lo = rm.group(2).strip()
            hi = rm.group(3).strip()
            return FieldClause(
                fname,
                "range",
                RangeVal(
                    None if lo == "*" else lo,
                    None if hi == "*" else hi,
                    rm.group(1) == "[",
                    rm.group(4) == "]",
                ),
            )
        if text.endswith("*") and len(text) > 1:
            return FieldClause(fname, "prefix", text[:-1])
        return FieldClause(fname, "eq", text.strip('"'))
    if text.startswith('"'):
        m = re.match(r'^"([^"]*)"(?:~(\d+))?$', text)
        words = m.group(1).split()
        slop = int(m.group(2)) if m.group(2) else 0
        return PhraseNode(words, slop, boost)
    fz = re.match(r"^(.+?)~(\d*)$", text)
    if fz and len(fz.group(1)) > 0:
        edits = int(fz.group(2)) if fz.group(2) else 2
        return FuzzyNode(fz.group(1), edits, boost)
    if text.endswith("*") and len(text) > 1:
        return PrefixNode(text[:-1], boost)
    return Term(text, boost)


# ----------------------------------------------------------------- parser


class _P:
    def __init__(self, toks: list[tuple[str, str]], default_op: str):
        self.toks = toks
        self.i = 0
        self.default_occur = MUST if default_op.upper() == "AND" else SHOULD

    def peek(self):
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_query(self) -> BoolNode:
        """orExpr: andExpr ((OR|adjacent) andExpr)* — adjacency = q.op."""
        children: list[tuple[str, object]] = []
        first = True
        while self.peek() is not None and self.peek() != "rparen":
            if self.peek() == "or":
                self.take()
                occur_default = SHOULD
            elif not first:
                occur_default = self.default_occur
            else:
                occur_default = SHOULD
            occur, node = self.parse_and_expr()
            children.append((occur or occur_default, node))
            first = False
        return BoolNode(children)

    def parse_and_expr(self):
        occur, node = self.parse_unary()
        if self.peek() != "and":
            return occur, node
        # explicit AND chain: every operand becomes MUST (or keeps its
        # own MUST_NOT), matching Lucene's left-to-right occur rewrite
        clauses = [(occur or MUST, node)]
        while self.peek() == "and":
            self.take()
            o2, n2 = self.parse_unary()
            clauses.append((o2 or MUST, n2))
        return None, BoolNode(clauses)

    def parse_unary(self):
        occur = None
        if self.peek() in ("not", "minus"):
            self.take()
            occur = MUST_NOT
        elif self.peek() == "plus":
            self.take()
            occur = MUST
        return occur, self.parse_atom()

    def parse_atom(self):
        kind, text = self.take()
        if kind == "lparen":
            inner = self.parse_query()
            if self.peek() == "rparen":
                self.take()
            return inner
        if kind == "clause":
            # leading +/- glued to the clause (lexer splits standalone ones)
            return _primitive(text)
        # stray operator token — treat as a literal word
        return Term(text)


def parse_ast(q: str, default_op: str = "OR") -> BoolNode:
    """Parse a lucene-syntax query string into a boolean AST."""
    p = _P(_lex(q), default_op)
    node = p.parse_query()
    # unwrap single-child nested bools produced by paren grouping
    while len(node.clauses) == 1 and isinstance(node.clauses[0][1], BoolNode) \
            and node.clauses[0][0] == SHOULD:
        node = node.clauses[0][1]
    return node


# ---------------------------------------------- flat view (compatibility)


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)   # scored OR terms
    must: list[str] = field(default_factory=list)     # +term
    must_not: list[str] = field(default_factory=list)  # -term
    filters: list[tuple[str, str, object]] = field(default_factory=list)
    # filters: (field, op, value) with op in {eq, range, prefix}
    expansions: list[tuple[str, str]] = field(default_factory=list)
    # expansions: (kind in {prefix, fuzzy}, text)
    phrases: list[tuple[list[str], int]] = field(default_factory=list)


def parse_query(q: str, default_op: str = "OR") -> ParsedQuery:
    """Flatten the AST into the round-1 ParsedQuery shape (lossy for
    nested booleans — search() executes the AST directly)."""
    out = ParsedQuery()
    _flatten(parse_ast(q, default_op), SHOULD, out)
    return out


def _flatten(node, occur: str, out: ParsedQuery) -> None:
    if isinstance(node, BoolNode):
        for o, child in node.clauses:
            # best-effort flat view: NOT dominates, then MUST (the AST
            # keeps the exact semantics; search() executes the AST)
            if MUST_NOT in (occur, o):
                eff = MUST_NOT
            elif MUST in (occur, o):
                eff = MUST
            else:
                eff = SHOULD
            _flatten(child, eff, out)
    elif isinstance(node, Term):
        {SHOULD: out.should, MUST: out.must, MUST_NOT: out.must_not}[occur].append(
            node.text
        )
    elif isinstance(node, PhraseNode):
        out.phrases.append((node.words, node.slop))
        if occur != MUST_NOT:
            out.must.extend(node.words)
        else:
            out.must_not.extend(node.words)
    elif isinstance(node, PrefixNode):
        out.expansions.append(("prefix", node.text))
    elif isinstance(node, FuzzyNode):
        out.expansions.append(("fuzzy", node.text))
    elif isinstance(node, FieldClause):
        if node.op == "range":
            rv: RangeVal = node.value
            out.filters.append((node.field, "range", (rv.lo, rv.hi)))
        else:
            out.filters.append((node.field, node.op, node.value))
