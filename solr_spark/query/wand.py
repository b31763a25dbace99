"""Block-max pruned BM25 top-k (batch MaxScore/BMW over block postings).

The reference exposes max-score collection and early termination
(solr/core/src/java/org/apache/solr/search/MaxScoreCollector.java,
MaxScoreQParserPlugin.java:33, EarlyTerminatingCollector.java); the
underlying skip mechanics are Lucene's block-max impacts (public:
Ding & Suel block-max WAND, WSDM'11). Sequential WAND doesn't map onto a
batch engine, so this is a BATCH-PARALLEL exact variant:

1. tiny job: per-query-term df (-> idf) and global block-max
   -> per-term upper bound ub_t = qtf*idf_t*max_tf_part; total_ub = Σ ub_t
2. threshold seed T0: exactly score ONLY the rarest term with df >= k
   (few blocks); its kth best single-term score is a sound lower bound
   of the final kth score (adding terms only raises doc scores)
3. ESSENTIAL-TERM pruning (MaxScore): order terms by ub; the maximal
   weak suffix with Σ ub < T0 is "non-essential" — a doc matching only
   those terms cannot reach T0, so candidate generation skips their
   posting lists ENTIRELY (this is what kills the head-term cost: head
   terms have tiny idf -> tiny ub -> non-essential).
4. block pruning within essential terms: block b of term t survives iff
       bound_t(b) + (total_ub - ub_t) >= T0
   -- a doc absent from every surviving essential block has score < T0.
5. decode surviving blocks (vectorized varint) -> partial scores s_hat(d)
   and covered-ub Σ_{t covering d} ub_t per doc; refinement threshold
   T1 = kth largest s_hat (a lower bound of the true kth score);
   candidates = docs with s_hat(d) + (total_ub - covered_ub(d)) >= T1
6. exact rescore of candidates against flat postings (ALL query terms,
   semi-joined on the candidate ids) -> true top-k.

All threshold comparisons carry a 1e-9 epsilon: partial sums are float64
and Spark's aggregation order differs from the driver's, so a doc could
otherwise fail a cutoff equal to its own score by one ulp. Widening the
cut only grows the candidate superset — exactness is unaffected.

Every step is a DataFrame op or a vectorized mapInPandas; exactness
(pruned == unpruned) is asserted in tests/test_wand.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.functions.bm25 import B, K1, idf_py
from solr_spark.index.blocks import varint_decode
from solr_spark.index.builder import Index
from solr_spark.query.engine import analyze_query, bm25_topk

#: widen every threshold cut by this much — covers float64 sum-order ulp
#: differences between driver-side and executor-side arithmetic
EPS = 1e-9


def _decode_score_fn(weights: dict[int, float], avgdl: float):
    """mapInPandas: block rows -> (docid, contrib, tid) rows.

    weights: tid -> qtf*idf (the per-occurrence score multiplier).
    """

    def fn(batches):
        for pdf in batches:
            out_docid, out_contrib, out_tid = [], [], []
            for r in pdf.itertuples(index=False):
                n = int(r.n_docs)
                deltas = varint_decode(r.docids_bin, n)
                deltas[0] = r.first_docid
                docids = np.cumsum(deltas)
                tfs = varint_decode(r.tfs_bin, n).astype(np.float64)
                dlqs = varint_decode(r.dlqs_bin, n).astype(np.float64)
                w = weights[int(r.tid)]
                contrib = w * tfs / (tfs + K1 * (1.0 - B + B * dlqs / avgdl))
                out_docid.append(docids)
                out_contrib.append(contrib)
                out_tid.append(np.repeat(np.int64(r.tid), n))
            if out_docid:
                yield pd.DataFrame(
                    {
                        "docid": np.concatenate(out_docid),
                        "contrib": np.concatenate(out_contrib),
                        "tid": np.concatenate(out_tid),
                    }
                )

    return fn


def bm25_topk_wand(
    index: Index, qtext: str, k: int = 10, mode: str = "OR",
    debug: dict | None = None,
) -> DataFrame:
    """Exact top-k via block-max pruning over the encoded postings.

    Pass a dict as `debug` to receive pruning statistics (essential
    terms, blocks decoded vs total, candidate count) — used by tests and
    benchmarks to verify that pruning actually skips work.
    """
    spark = index.spark
    qterms = analyze_query(qtext)
    empty = spark.createDataFrame([], "docid long, score double")
    if not qterms:
        return empty
    n_docs = index.meta["n_docs"]
    avgdl = float(index.meta["avgdl"])
    # resolve term -> tid/df via the dictionary, then work tid-keyed
    stats = index.term_stats_for(list(qterms))
    present = [t for t in qterms if t in stats]
    if not present or (mode == "AND" and len(present) < len(qterms)):
        return empty
    tid_of = {t: stats[t]["tid"] for t in present}
    tids = [tid_of[t] for t in present]
    blocks = (
        index.blocks()
        .where(F.col("bucket").isin(index.pbuckets_for(tids)))
        .where(F.col("tid").isin(tids))
    )

    # (1) per-term global block-max — one tiny job over block metadata
    info = {
        r["tid"]: r
        for r in blocks.groupBy("tid")
        .agg(
            F.max("max_tf_part").alias("mtp"),
            F.sum("n_docs").alias("df"),
            F.count(F.lit(1)).alias("n_blocks"),
        )
        .collect()
    }
    present = [t for t in present if tid_of[t] in info]
    if not present or (mode == "AND" and len(present) < len(qterms)):
        return empty
    weights = {
        tid_of[t]: qterms[t] * idf_py(int(info[tid_of[t]]["df"]), n_docs)
        for t in present
    }
    ub = {g: weights[g] * float(info[g]["mtp"]) for g in weights}
    total_ub = sum(ub.values())
    ptids = [tid_of[t] for t in present]

    # (2) threshold seed from the rarest sufficiently-large term.
    # OR mode only: the seed's kth contribution lower-bounds the final kth
    # score of the FULL result set, but an AND result set is a subset
    # whose kth score may be lower — so AND skips pruning (and thereby
    # keeps nmatched complete for its intersection filter).
    seed_candidates = [g for g in ptids if info[g]["df"] >= k]
    t0 = 0.0
    if seed_candidates and len(ptids) > 1 and mode == "OR":
        seed = min(seed_candidates, key=lambda g: info[g]["df"])
        seed_blocks = blocks.where(F.col("tid") == seed)
        seed_scores = seed_blocks.mapInPandas(
            _decode_score_fn({seed: weights[seed]}, avgdl),
            schema="docid long, contrib double, tid long",
        )
        kth = (
            seed_scores.orderBy(F.desc("contrib")).limit(k).collect()
        )
        if len(kth) == k:
            t0 = kth[-1]["contrib"]

    # (3) essential-term + (4) block pruning
    if len(ptids) > 1 and t0 > 0.0:
        by_ub = sorted(ptids, key=lambda g: ub[g])
        acc, non_essential = 0.0, []
        for g in by_ub[:-1]:  # always keep at least one essential term
            if acc + ub[g] < t0 - EPS:
                acc += ub[g]
                non_essential.append(g)
            else:
                break
        essential = [g for g in ptids if g not in non_essential]
        if debug is not None:
            debug["present"] = list(present)
            debug["essential"] = [t for t in present if tid_of[t] in essential]
            debug["t0"] = t0
            debug["blocks_total"] = blocks.count()
        blocks = blocks.where(F.col("tid").isin(essential))
        rest = {g: total_ub - ub[g] for g in essential}
        rest_map = F.create_map(
            *[x for g in essential for x in (F.lit(g), F.lit(rest[g]))]
        )
        w_map = F.create_map(
            *[x for g in essential for x in (F.lit(g), F.lit(weights[g]))]
        )
        blocks = blocks.where(
            w_map[F.col("tid")] * F.col("max_tf_part") + rest_map[F.col("tid")]
            >= F.lit(t0 - EPS)
        )

    if debug is not None:
        debug["blocks_decoded"] = blocks.count()

    # (4) decode + partial scores
    decoded = blocks.mapInPandas(
        _decode_score_fn(weights, avgdl),
        schema="docid long, contrib double, tid long",
    )
    ub_map = F.create_map(*[x for g in ptids for x in (F.lit(g), F.lit(ub[g]))])
    partial = decoded.groupBy("docid").agg(
        F.sum("contrib").alias("s_hat"),
        F.sum(ub_map[F.col("tid")]).alias("covered_ub"),
        F.count(F.lit(1)).alias("nmatched"),
    )
    if mode == "AND":
        partial = partial.where(F.col("nmatched") == len(present))
    partial = partial.persist()
    try:
        top_hat = partial.orderBy(F.desc("s_hat")).limit(k).collect()
        if not top_hat:
            return empty
        t1 = top_hat[-1]["s_hat"] if len(top_hat) == k else 0.0

        # (5) candidate set: docs that could still reach the top-k
        cand = partial.where(
            F.col("s_hat") + (F.lit(total_ub) - F.col("covered_ub"))
            >= F.lit(t1 - EPS)
        ).select("docid")
        if debug is not None:
            debug["n_candidates"] = cand.count()

        # (6) exact rescore of candidates against flat postings
        postings = (
            index.postings()
            .where(F.col("bucket").isin(index.pbuckets_for(ptids)))
            .where(F.col("tid").isin(ptids))
            .join(F.broadcast(cand), "docid", "left_semi")
        )
        wmap = F.create_map(
            *[x for g in ptids for x in (F.lit(g), F.lit(weights[g]))]
        )
        scored = postings.select(
            "docid",
            (
                wmap[F.col("tid")]
                * F.col("tf").cast("double")
                / (
                    F.col("tf").cast("double")
                    + F.lit(K1)
                    * (
                        F.lit(1.0 - B)
                        + F.lit(B) * F.col("dl_q").cast("double") / F.lit(avgdl)
                    )
                )
            ).alias("contrib"),
        )
        agg = scored.groupBy("docid").agg(
            F.sum("contrib").alias("score"), F.count(F.lit(1)).alias("nm")
        )
        if mode == "AND":
            agg = agg.where(F.col("nm") == len(present))
        rows = (
            agg.select("docid", "score")
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
            .collect()
        )
    finally:
        partial.unpersist()
    return spark.createDataFrame(rows, "docid long, score double") if rows else empty


def bm25_topk_auto(index: Index, qtext: str, k: int = 10, mode: str = "OR") -> DataFrame:
    """Route: pruned path when blocks exist, flat path otherwise."""
    if index.meta.get("has_blocks"):
        return bm25_topk_wand(index, qtext, k, mode)
    return bm25_topk(index, qtext, k, mode)
