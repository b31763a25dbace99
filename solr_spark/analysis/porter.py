"""Porter stemmer — one rule table, three executable forms.

Reimplements (from the published algorithm, Porter 1980, "An algorithm
for suffix stripping" — public knowledge; the reference wires it as
`solr.PorterStemFilterFactory` in its `text_en` field types,
solr/server/solr/configsets/_default/conf/managed-schema.xml:344-380)
as a SEQUENTIAL CHAIN of regex replaces so the SAME rules run as:

- a Spark Column scalar (`porter_stem_col`) — JVM regexp_replace chain,
  one reference per step, so the Catalyst expression stays LINEAR in
  the rule count (no CASE fan-out blowup) and whole-stage codegen
  applies; usable per-token via `F.transform`;
- pure Python (`porter_stem_py`) — compiled `re` chain, for the query
  side (stemming a handful of query terms driver-side) and the oracle;
- a DuckDB SQL expression (`porter_stem_sql`) — the driver's
  correctness oracle (the sandbox DuckDB has no `fts`/`stem()`
  extension, so the oracle carries the same chain).

Every pattern is RE2-compatible (no lookbehind, no backreference, no
lookahead) so ONE pattern string serves all three engines; only the
replacement syntax differs (`$1` Java vs `\\1` RE2/Python).

Encoding choices (all fuzz-tested for three-way parity and checked
against the paper's example vectors in tests/test_porter.py):

- *vowel-y marking*: Porter's "y is a vowel iff preceded by a
  consonant" is resolved by one global pre-pass `([^aeiou])y -> $1Y`;
  a left-to-right global scan gets chains like "syzygy" right because
  each match consumes the consonant+y pair. V = [aeiouY] thereafter.
- *measure conditions* become stem-shape patterns: m(stem) >= 1 iff the
  stem contains a vowel immediately followed by a consonant; m >= 2
  iff two such in order; m == 1 exactly iff `C*V+C+V*`.
- *longest-match exclusivity* (a longer suffix whose condition FAILS
  must still block shorter suffixes in the same step — e.g.
  "element" must not lose "ent") uses a sentinel: after the
  conditional rule, any still-matching longer suffix is tagged with
  `~`, which no later pattern matches; the step ends by deleting `~`.
- words of length <= 2 are returned unchanged (the published
  algorithm's behavior for short words).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

V = "aeiouY"
C = f"[^{V}]"
VO = f"[{V}]"
A = "[a-zY]"

# stem-shape fragments (match the WHOLE stem group)
_HASV = f"{A}*{VO}{A}*"              # *v* : stem contains a vowel
_M1 = f"{A}*{VO}{C}{A}*"             # m >= 1
_M2 = f"{A}*{VO}{C}{A}*{VO}{C}{A}*"  # m >= 2

# doubled consonants eligible for 1b undoubling (not l, s, z; y cannot
# appear doubled-as-consonant after vowel-y marking)
_DBL = "bcdfghjkmnpqrtvwx"


def _rules() -> list[tuple[str, str]]:
    r: list[tuple[str, str]] = []
    add = r.append

    # -- pre: mark vowel-y
    add((r"([^aeiou])y", r"\1Y"))

    # -- step 1a
    add((r"sses$", "ss"))
    add((r"ies$", "i"))
    add((r"([^s])s$", r"\1"))  # plain s; ss blocked by the class

    # -- step 1b
    add((rf"^({_M1})eed$", r"\1ee"))
    # fused "removal + post-rule" forms (the *v* condition on the
    # ed/ing stem is baked into each pattern)
    add((r"at(?:ed|ing)$", "ate"))          # stem ...at always has 'a'
    add((rf"^({_HASV})bl(?:ed|ing)$", r"\1ble"))
    add((r"iz(?:ed|ing)$", "ize"))          # stem ...iz always has 'i'
    for ch in _DBL:                          # undouble: hopp(ed|ing) -> hop
        add((rf"^({_HASV}{ch}){ch}(?:ed|ing)$", r"\1"))
    # cvc stem with m==1 -> restore e (hop+ing -> hope); stem shape is
    # exactly C+VC' with C' not w/x (consonant-y impossible after marking)
    add((rf"^({C}+{VO}[^{V}wx])(?:ed|ing)$", r"\1e"))
    # plain removals; ed must not strip words still ending "eed"
    # (those already had their step-1b chance above)
    add((rf"^({A}*{VO}{A}*[^e]|[aiouY])ed$", r"\1"))
    add((rf"^({_HASV})ing$", r"\1"))

    # -- step 1c: (*v*) y -> i
    add((rf"^({_HASV})[yY]$", r"\1i"))

    # -- step 2 (m>0); sentinel `~` preserves longest-match exclusivity
    add((rf"^({_M1})ational$", r"\1ate"))
    add((r"ational$", r"ational~"))          # failed cond: block "tional"
    add((rf"^({_M1})tional$", r"\1tion"))
    add((rf"^({_M1})enci$", r"\1ence"))
    add((rf"^({_M1})anci$", r"\1ance"))
    add((rf"^({_M1})izer$", r"\1ize"))
    add((rf"^({_M1})abli$", r"\1able"))
    add((rf"^({_M1})alli$", r"\1al"))
    add((rf"^({_M1})entli$", r"\1ent"))
    add((rf"^({_M1})eli$", r"\1e"))
    add((rf"^({_M1})ousli$", r"\1ous"))
    add((rf"^({_M1})ization$", r"\1ize"))
    add((r"ization$", r"ization~"))          # failed cond: block "ation"
    add((rf"^({_M1})ation$", r"\1ate"))
    add((rf"^({_M1})ator$", r"\1ate"))
    add((rf"^({_M1})alism$", r"\1al"))
    add((rf"^({_M1})iveness$", r"\1ive"))
    add((rf"^({_M1})fulness$", r"\1ful"))
    add((rf"^({_M1})ousness$", r"\1ous"))
    add((rf"^({_M1})aliti$", r"\1al"))
    add((rf"^({_M1})iviti$", r"\1ive"))
    add((rf"^({_M1})biliti$", r"\1ble"))
    add((r"~", ""))

    # -- step 3 (m>0)
    add((rf"^({_M1})icate$", r"\1ic"))
    add((rf"^({_M1})ative$", r"\1"))
    add((rf"^({_M1})alize$", r"\1al"))
    add((rf"^({_M1})iciti$", r"\1ic"))
    add((rf"^({_M1})ical$", r"\1ic"))
    add((rf"^({_M1})ful$", r"\1"))
    add((rf"^({_M1})ness$", r"\1"))

    # -- step 4 (m>1); ement > ment > ent need sentinels
    add((rf"^({_M2})al$", r"\1"))
    add((rf"^({_M2})ance$", r"\1"))
    add((rf"^({_M2})ence$", r"\1"))
    add((rf"^({_M2})er$", r"\1"))
    add((rf"^({_M2})ic$", r"\1"))
    add((rf"^({_M2})able$", r"\1"))
    add((rf"^({_M2})ible$", r"\1"))
    add((rf"^({_M2})ant$", r"\1"))
    add((rf"^({_M2})ement$", r"\1"))
    add((r"ement$", r"ement~"))
    add((rf"^({_M2})ment$", r"\1"))
    add((r"ment$", r"ment~"))
    add((rf"^({_M2})ent$", r"\1"))
    add((r"ent$", r"ent~"))
    # (m>1 and stem ends s/t) ion -> ""; the s/t may itself close the
    # second VC pair, hence the alternation
    add((rf"^({_M2}[st]|{A}*{VO}{C}{A}*{VO}[st])ion$", r"\1"))
    add((rf"^({_M2})ou$", r"\1"))
    add((rf"^({_M2})ism$", r"\1"))
    add((rf"^({_M2})ate$", r"\1"))
    add((rf"^({_M2})iti$", r"\1"))
    add((rf"^({_M2})ous$", r"\1"))
    add((rf"^({_M2})ive$", r"\1"))
    add((rf"^({_M2})ize$", r"\1"))
    add((r"~", ""))

    # -- step 5a: drop final e if m>1, or if m==1 and stem not *o.
    # Sequential is safe: if the m>1 rule fires and leaves another
    # trailing e, the new stem's measure is unchanged (dropping a
    # trailing vowel closes no VC pair), so the m==1 rule cannot fire.
    add((rf"^({_M2})e$", r"\1"))
    # m==1 and NOT cvc-ending (cvc with final w/x/y counts as not *o)
    _not_o_m1 = "|".join(
        (
            rf"{C}*{VO}+{C}+{VO}+",   # trailing vowel run
            rf"{C}*{VO}+{C}{C}+",     # >= 2 trailing consonants
            rf"{C}*{VO}{VO}+{C}",     # vowel run >= 2 before final C
            rf"{VO}{C}",              # no leading consonant
            rf"{C}+{VO}[wxy]",        # cvc but final is w/x/y
        )
    )
    add((rf"^((?:{_not_o_m1}))e$", r"\1"))

    # -- step 5b: (m>1) ll -> l; the kept l may itself close the
    # second VC pair (contro+ll), hence the alternation
    add((rf"^({_M2}l|{A}*{VO}{C}{A}*{VO}l)l$", r"\1"))

    # -- unmark
    add((r"Y", "y"))
    return r


RULES = _rules()
_PY_RULES = [(re.compile(p), rp) for p, rp in RULES]


def porter_stem_py(word: str) -> str:
    """Stem one lowercase token (pure Python reference form)."""
    if len(word) <= 2:
        return word
    s = word
    for pat, rep in _PY_RULES:
        s = pat.sub(rep, s)
    return s


def porter_scalar_col(c: Column) -> Column:
    """The chain on a single-token string Column (length guard applied)."""
    s = c
    for pat, rep in RULES:
        s = F.regexp_replace(s, pat, rep.replace("\\1", "$1"))
    return F.when(F.length(c) <= 2, c).otherwise(s)


def porter_stem_col(toks: Column) -> Column:
    """Stem every element of a token-array Column (JVM-side)."""
    return F.transform(toks, lambda t: porter_scalar_col(t))


def _sq(s: str) -> str:
    return s.replace("'", "''")


def porter_scalar_sql(expr: str) -> str:
    """The chain on a scalar VARCHAR SQL expression (DuckDB/RE2)."""
    s = expr
    for pat, rep in RULES:
        s = f"regexp_replace({s}, '{_sq(pat)}', '{_sq(rep)}', 'g')"
    return f"CASE WHEN length({expr}) <= 2 THEN {expr} ELSE {s} END"


def porter_stem_sql(list_expr: str) -> str:
    """Stem every element of a VARCHAR[] SQL expression."""
    return f"list_transform({list_expr}, _pt -> {porter_scalar_sql('_pt')})"
