"""Mini query parser: the useful subset of Solr's lucene-syntax queries.

Grammar subset of solr/core/src/java/org/apache/solr/parser/
SolrQueryParserBase.java (JavaCC, 1.3k LoC) re-expressed as a small
recursive-descent parser producing a structured tree the executors can
interpret:

    query   := clause (WS clause)*              (default OR; q.op)
    clause  := [+|-] atom
    atom    := field ':' value | value | '(' query ')'
    value   := word | '"phrase words"' | '[a TO b]' | word'*' | word'~'

Execution semantics (search/QParserPlugin.java registry analogues):
- bare words          -> BM25-scored terms (OR / q.op=AND)
- +word / -word       -> required / prohibited (MUST / MUST_NOT)
- field:value         -> non-scoring metadata filter (fq semantics,
                         search/SolrIndexSearcher.java:956 filter+query
                         separation — filters never affect the score)
- field:[a TO b]      -> range filter (schema/FieldType.java:877)
- word* / word~       -> term expansion (constant-score)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)   # scored OR terms
    must: list[str] = field(default_factory=list)     # +term
    must_not: list[str] = field(default_factory=list)  # -term
    filters: list[tuple[str, str, object]] = field(default_factory=list)
    # filters: (field, op, value) with op in {eq, range, prefix}
    expansions: list[tuple[str, str]] = field(default_factory=list)
    # expansions: (kind in {prefix, fuzzy}, text)


_TOKEN = re.compile(
    r"""
    (?P<quoted>"[^"]*")
  | (?P<range>\w+:\[[^\]]+\])
  | (?P<fielded>\w+:[^\s()]+)
  | (?P<bare>[^\s()]+)
""",
    re.VERBOSE,
)

CONTENT_FIELDS = {"content", "text", None}


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    for m in _TOKEN.finditer(q):
        tok = m.group(0)
        required = prohibited = False
        if tok.startswith("+"):
            required, tok = True, tok[1:]
        elif tok.startswith("-"):
            prohibited, tok = True, tok[1:]
        if m.group("range"):
            fname, rng = tok.split(":", 1)
            lo, hi = rng[1:-1].split(" TO ")
            out.filters.append((fname, "range", (lo.strip(), hi.strip())))
            continue
        if m.group("fielded") and not tok.startswith('"'):
            fname, val = tok.split(":", 1)
            if fname not in CONTENT_FIELDS:
                if val.endswith("*"):
                    out.filters.append((fname, "prefix", val[:-1]))
                else:
                    out.filters.append((fname, "eq", val))
                continue
            tok = val  # content:foo scores like a bare term
        if tok.startswith('"') and tok.endswith('"'):
            # phrase -> conjunction of its terms (positional matching is
            # a stretch goal; Solr's phrase needs positions we omit)
            for w in tok[1:-1].split():
                out.must.append(w)
            continue
        if tok.endswith("*") and len(tok) > 1:
            out.expansions.append(("prefix", tok[:-1]))
            continue
        if tok.endswith("~") and len(tok) > 1:
            out.expansions.append(("fuzzy", tok[:-1]))
            continue
        if prohibited:
            out.must_not.append(tok)
        elif required:
            out.must.append(tok)
        else:
            out.should.append(tok)
    return out
