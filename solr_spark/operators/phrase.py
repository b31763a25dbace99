"""Positional phrase matching over tokenized text (inline operator).

Role of the reference's phrase queries (parser/SolrQueryParserBase.java:547-554;
needs positions — the OMIT_TF_POSITIONS flag,
solr/core/src/java/org/apache/solr/schema/FieldProperties.java:38).

This is the INLINE form (positions derived on the fly from the token
arrays) used by the driver gate over the `documents` table; the indexed
form reads the index-side positions table instead
(solr_spark/query/positions.py) — the matching algebra
(`chain_match_count`) is shared, so both forms agree by construction.

Semantics: a phrase occurrence is a strictly increasing position chain
p < q_1 < ... with q_j in term j's positions and every gap <= slop+1
(exact adjacency at slop=0). Ordered: each term must match AFTER the
previous term's matched position. `phrase_freq` = number of matching
start positions — the statistic Lucene's phrase scorer feeds into BM25.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokenize_py, tokens_sql
from solr_spark.query.positions import chain_match_count, chain_match_count_sql


def term_positions_col(toks: Column, term: str) -> Column:
    """1-based positions of `term` in the token array."""
    return F.filter(
        F.sequence(F.lit(1), F.size(toks)),
        lambda i: F.element_at(toks, i) == term,
    )


def phrase_freq_col(
    toks: Column, terms: list[str], slop: int = 0, ordered: bool = True,
    window: bool = False,
) -> Column:
    """Number of phrase occurrences in the token array.

    One Arrow UDF over the token array: deriving per-term position
    arrays with expression-level filters re-evaluates the (inlined)
    tokenization per array ELEMENT — Catalyst offers no way to pin the
    intermediate (see chain_match_count's note in query/positions.py);
    referencing the token column exactly once keeps it evaluated once
    per row no matter what CollapseProject inlines.

    ordered=False = Lucene-exact edit-budget sloppy semantics
    (query/positions.py sloppy_match_count); window=True opts into the
    cheaper window approximation instead.
    """
    return _phrase_freq_from_toks_udf(list(terms), slop, ordered, window)(toks)


def _phrase_freq_from_toks_udf(
    terms: list[str], slop: int, ordered: bool = True, window: bool = False
):
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from solr_spark.query.positions import _dup_groups, _sloppy_count_anchors

    s1 = slop + 1
    n = len(terms)
    lo_off, hi_off = -slop, n - 1 + slop
    dup_groups = _dup_groups(terms)

    def freq(toks):
        out = np.zeros(len(toks), dtype="int32")
        for i, tk in enumerate(toks):
            tk = np.asarray(tk, dtype=object)
            arrs = [np.nonzero(tk == t)[0] + 1 for t in terms]
            if ordered:
                b = arrs[-1]
                for pj in arrs[-2::-1]:
                    if b.size == 0:
                        break
                    lo = np.searchsorted(b, pj, side="right")
                    hi = np.searchsorted(b, pj + s1, side="right")
                    b = pj[hi > lo]
                out[i] = b.size
            elif window:
                anchors = arrs[0]
                ok = np.ones(anchors.size, dtype=bool)
                for pj in arrs[1:]:
                    lo = np.searchsorted(pj, anchors + lo_off, side="left")
                    hi = np.searchsorted(pj, anchors + hi_off, side="right")
                    ok &= hi > lo
                out[i] = int(ok.sum())
            else:
                out[i] = _sloppy_count_anchors(
                    [a.astype(np.int64) for a in arrs], slop, dup_groups
                )
        return pd.Series(out)

    # real type objects: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf cannot introspect
    freq.__annotations__ = {"toks": pd.Series, "return": pd.Series}
    return pandas_udf(freq, "int")


def _phrase_freq_batches(terms: list[str], slop: int, window: bool):
    """mapInArrow body: (docid, text) record batches -> (docid,
    phrase_freq), tokenization AND matching computed with vectorized C
    kernels over the raw Arrow buffers.

    Replaces the JVM regex tokenize + Arrow->pandas conversion (which
    boxes every token into a Python str) + per-row Python matcher with
    one whole-batch pass (guide §4.2): `tokenize_arrow_batch` emits the
    batch's flat token stream (bytes + offsets + row ids), per-term hits
    come from a vectorized length+bytes comparison, and the same
    backward-DP / window algebra as `chain_match_count` runs ONCE over
    the whole batch in global coordinates g = token_index + row * pad
    with pad > n - 1 + 2*slop + 1: within one row g-deltas equal token
    position deltas, across rows they always exceed the largest usable
    gap, so no chain step or window can cross a row boundary.
    Bit-identical to the per-row matchers (fuzzed in tests; the DuckDB
    twins pin the gate semantics)."""
    import numpy as np
    import pyarrow as pa

    from solr_spark.analysis.analyzer import tokenize_arrow_batch

    n = len(terms)
    s1 = slop + 1
    lo_off, hi_off = -slop, n - 1 + slop
    pad = n + 2 * slop + 2

    def batches(it):
        for batch in it:
            nrows = batch.num_rows
            docid = batch.column(0)
            if nrows == 0:
                continue
            values, val_off, tok_rows, _, _ = tokenize_arrow_batch(
                batch.column(1)
            )
            ntok = tok_rows.size
            tok_len = np.diff(val_off)
            g = np.arange(ntok, dtype=np.int64) + tok_rows * pad
            hits: dict[str, np.ndarray] = {}
            for t in terms:
                if t in hits:
                    continue
                tb = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                cand = np.flatnonzero(tok_len == tb.size)
                if cand.size and tb.size:
                    mat = values[
                        val_off[cand][:, None]
                        + np.arange(tb.size, dtype=np.int64)
                    ]
                    cand = cand[(mat == tb).all(axis=1)]
                hits[t] = g[cand]
            arrs = [hits[t] for t in terms]
            if not window:
                b = arrs[-1]
                for pj in arrs[-2::-1]:
                    if b.size == 0:
                        break
                    lo = np.searchsorted(b, pj, side="right")
                    hi = np.searchsorted(b, pj + s1, side="right")
                    b = pj[hi > lo]
                surv = b
            else:
                anchors = arrs[0]
                ok = np.ones(anchors.size, dtype=bool)
                for pj in arrs[1:]:
                    lo = np.searchsorted(pj, anchors + lo_off, side="left")
                    hi = np.searchsorted(pj, anchors + hi_off, side="right")
                    ok &= hi > lo
                surv = anchors[ok]
            list_off = np.zeros(nrows + 1, dtype=np.int64)
            np.cumsum(
                np.bincount(tok_rows, minlength=nrows), out=list_off[1:]
            )
            gstarts = list_off + np.arange(nrows + 1, dtype=np.int64) * pad
            rows = np.searchsorted(gstarts, surv, side="right") - 1
            counts = np.bincount(rows, minlength=nrows).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [docid, pa.array(counts, type=pa.int32())],
                ["docid", "phrase_freq"],
            )

    return batches


def phrase_match(
    docs: DataFrame,
    phrase: str,
    id_col: str = "docid",
    text_col: str = "content",
    slop: int = 0,
    ordered: bool = True,
    window: bool = False,
) -> DataFrame:
    """(docid, phrase_freq) for docs containing the analyzed phrase.

    ordered=False switches to Lucene's exact edit-budget unordered
    semantics (query/positions.py sloppy_match_count); window=True opts
    into the cheaper window approximation instead."""
    from solr_spark.analysis.analyzer import tokens_col

    terms = tokenize_py(phrase)
    if not terms:
        return docs.sparkSession.createDataFrame([], "docid long, phrase_freq int")
    # JVM-side candidate prefilter: the analysis chain only INSERTS
    # token boundaries (fused-split) and lowercases — it never merges or
    # rewrites characters — so every emitted token is a contiguous
    # substring of lower(text). A doc lacking any term as a substring
    # cannot match the phrase; the contains() conjunction runs inside
    # the scan stage and keeps the expensive tokenize + Arrow transfer
    # + position scan to candidate docs only (bench: q_phrase_inline
    # 6.97 s -> see BENCH/BASELINE.md round-5 table).
    lowered = F.lower(F.col(text_col))
    cand = docs
    for t in set(terms):
        cand = cand.where(lowered.contains(t))
    # Round-6 measured REVERT of a JVM-side position-extraction variant
    # (posexplode + isin + collect_list feeding the shared matchers):
    # that shape pays a full-corpus Generate plus a shuffle, while this
    # one has ZERO exchanges before the final sort — the scan-stage
    # contains() prefilter plus ONE Python-boundary pass over the
    # candidate docs. Interleaved same-window A/B on the 200k bench
    # corpus ("json parser", n=182,428 identical both ways): this shape
    # best 5.0 s vs 8.1 s for the exploded variant (guide §1.2: the
    # job's distributed shape beats shrinking the Python transfer).
    if ordered or window:
        # chain / window modes: raw text crosses the boundary and ONE
        # whole-batch Arrow pass tokenizes (tokenize_arrow_batch) and
        # matches — no JVM regex tokenize, no per-token boxing (measured
        # on the bench corpus: the JVM regexp tokenize alone was ~4.9 s
        # of the 5.4 s line); the exact unordered-sloppy DP
        # (repeated-term distinctness) keeps the per-row matcher below
        d = cand.select(
            F.col(id_col).cast("long").alias("docid"), F.col(text_col)
        )
        out = d.mapInArrow(
            _phrase_freq_batches(terms, slop, window=not ordered),
            schema="docid long, phrase_freq int",
        )
    else:
        toks = tokens_col(text_col)
        d = cand.select(
            F.col(id_col).cast("long").alias("docid"), toks.alias("_toks")
        )
        freq = phrase_freq_col(F.col("_toks"), terms, slop, ordered, window)
        out = d.select("docid", freq.cast("int").alias("phrase_freq"))
    return out.where(F.col("phrase_freq") > 0).orderBy("docid")


def phrase_match_sql(
    phrase: str, slop: int = 0, ordered: bool = True, window: bool = False
) -> str:
    """DuckDB twin over the `documents` view (same matching algebra as
    phrase_match for each mode). The exact sloppy twin covers
    distinct-term phrases only (repeated terms need the distinctness
    assignment list lambdas cannot express)."""
    from solr_spark.query.positions import (
        sloppy_match_count_sql,
        window_match_count_sql,
    )

    terms = tokenize_py(phrase)
    pos_exprs = [
        f"[i FOR i IN range(1, len(toks) + 1) IF toks[i] = '{t}']" for t in terms
    ]
    if ordered:
        freq = chain_match_count_sql(pos_exprs, slop)
    elif window:
        freq = window_match_count_sql(pos_exprs, slop)
    else:
        if len(set(terms)) != len(terms):
            raise ValueError(
                "exact sloppy SQL twin requires distinct phrase terms"
            )
        freq = sloppy_match_count_sql(pos_exprs, slop)
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks FROM documents),
hits AS (SELECT docid, ({freq}) AS phrase_freq FROM toks)
SELECT docid, phrase_freq::INT AS phrase_freq FROM hits
WHERE phrase_freq > 0 ORDER BY docid
"""
