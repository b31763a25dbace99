"""Text tagging: dictionary phrase lookup over documents.

Role of the reference's TaggerRequestHandler (the SolrTextTagger,
solr/core/src/java/org/apache/solr/handler/tagger/Tagger.java:1 —
an FST term-prefix cursor walks each document's token stream and emits
every dictionary phrase occurrence; TagClusterReducer.java:32,59 then
keeps either ALL tags or the LONGEST_DOMINANT_RIGHT reduction).

Spark-first shape: the FST walk becomes a token-anchor equi-join —
  1. docs explode to (docid, pos, term) — ONLY the three columns, the
     token array itself is NOT carried through the explode (that would
     copy an N-token array N times through the shuffle);
  2. the dictionary (entity-dimension sized) tokenizes through the same
     analysis chain and broadcasts; anchors join on
     term == first dictionary token;
  3. anchors re-join the doc token arrays BY DOCID (one array copy per
     anchor, not per token) and verify the remaining dictionary tokens
     with element_at — all JVM-side, no Python in the match path.

At 100 TB the explode is map-local (no shuffle: the dictionary join is
a broadcast), so the tagger is a single scan + one broadcast-hash join
+ one docid-equi-join against the (much smaller) anchor set.

Overlap policy `LONGEST_DOMINANT_RIGHT` mirrors
TagClusterReducer.java:59: repeatedly keep the longest tag (ties →
rightmost) and drop overlapping tags. Divergence: length is measured in
TOKENS here (the engine's positions are token-indexed); the reference
measures characters. Equal-token-length ties therefore resolve the same
way only when token length orders like char length — documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import tokens_col


def tag_text(
    docs: DataFrame,
    dictionary: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag_col: str = "tag",
    name_col: str = "name",
    overlaps: str = "ALL",
) -> DataFrame:
    """Tag every dictionary phrase occurrence in every document.

    Returns (docid, tag, start_pos, end_pos) with 0-based token
    positions, end exclusive. `overlaps`: "ALL" keeps every occurrence;
    "LONGEST_DOMINANT_RIGHT" applies the reference's dominance
    reduction per document.
    """
    d = dictionary.select(
        F.col(tag_col).alias("tag"),
        tokens_col(name_col).alias("_dtoks"),
    ).select(
        "tag",
        "_dtoks",
        F.element_at("_dtoks", 1).alias("_first"),
        F.size("_dtoks").alias("_dlen"),
    ).where(F.col("_dlen") > 0)

    toks = docs.select(
        F.col(id_col).cast("long").alias("docid"),
        tokens_col(text_col).alias("_toks"),
    )
    anchors = (
        toks.select(
            "docid", F.posexplode("_toks").alias("_pos", "_term")
        )
        .join(F.broadcast(d), F.col("_term") == F.col("_first"))
        .select("docid", "_pos", "tag", "_dtoks", "_dlen")
    )
    verified = (
        anchors.join(toks, "docid")
        .where(
            (F.col("_pos") + F.col("_dlen") <= F.size("_toks"))
            & F.when(F.col("_dlen") == 1, F.lit(True)).otherwise(
                F.forall(
                    F.sequence(F.lit(2), F.greatest(F.col("_dlen"), F.lit(2))),
                    lambda i: F.element_at(F.col("_toks"), F.col("_pos") + i)
                    == F.element_at(F.col("_dtoks"), i),
                )
            )
        )
        .select(
            "docid",
            "tag",
            F.col("_pos").alias("start_pos"),
            (F.col("_pos") + F.col("_dlen")).alias("end_pos"),
        )
    )
    if overlaps == "ALL":
        return verified
    if overlaps != "LONGEST_DOMINANT_RIGHT":
        raise ValueError(f"unknown overlaps policy {overlaps!r}")
    return _longest_dominant_right(verified)


def _longest_dominant_right(tags: DataFrame) -> DataFrame:
    """TagClusterReducer.LONGEST_DOMINANT_RIGHT per docid: repeatedly
    mark the longest tag (ties -> the rightmost, the reference's `>=`
    scan order) and drop unmarked tags overlapping it. Per-doc tag sets
    are small, so the reduction runs as one applyInPandas group op."""
    import pandas as pd

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.sort_values(["start_pos", "end_pos"]).to_dict("records")
        alive = list(range(len(rows)))
        marked: list[int] = []
        while True:
            longest = None
            for i in alive:
                if i in marked:
                    continue
                if longest is None or (
                    rows[i]["end_pos"] - rows[i]["start_pos"]
                    >= rows[longest]["end_pos"] - rows[longest]["start_pos"]
                ):
                    longest = i
            if longest is None:
                break
            marked.append(longest)
            keep = []
            for i in alive:
                if i in marked:
                    keep.append(i)
                    continue
                o = not (
                    rows[i]["end_pos"] <= rows[longest]["start_pos"]
                    or rows[i]["start_pos"] >= rows[longest]["end_pos"]
                )
                if not o:
                    keep.append(i)
            alive = keep
        return pd.DataFrame([rows[i] for i in sorted(marked)])

    return tags.groupBy("docid").applyInPandas(_reduce, tags.schema)


def tag_text_sql(
    docs_table: str = "documents",
    dict_cte: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of tag_text(overlaps="ALL"): same tokenize + anchor
    join + slice-equality verification. `dict_cte` must define
    dict(tag, name)."""
    from solr_spark.analysis.analyzer import tokens_sql

    return f"""
        WITH {dict_cte},
        dtok AS (
          SELECT tag, {tokens_sql('name')} AS dtoks FROM dict),
        dd AS (
          SELECT tag, dtoks, dtoks[1] AS first_tok,
                 len(dtoks) AS dlen FROM dtok WHERE len(dtoks) > 0),
        toks AS (
          SELECT {id_col} AS docid, {tokens_sql(text_col)} AS toks
          FROM {docs_table}),
        anchors AS (
          SELECT t.docid, p.pos - 1 AS start_pos, dd.tag, dd.dtoks, dd.dlen,
                 t.toks
          FROM toks t,
               LATERAL (SELECT unnest(generate_series(1, len(t.toks)))
                        AS pos) p
          JOIN dd ON t.toks[p.pos] = dd.first_tok)
        SELECT docid, tag, start_pos, start_pos + dlen AS end_pos
        FROM anchors
        WHERE start_pos + dlen <= len(toks)
          AND toks[start_pos + 1 : start_pos + dlen] = dtoks
    """
