"""Streaming-expression relational algebra as thin DataFrame operators.

The reference's 309-function streaming dataflow
(solrj/src/java/org/apache/solr/client/solrj/io/Lang.java:45-373) is a
pull-based Volcano iterator tree over sorted tuple streams; on Spark each
stream class is a one-line DataFrame transformation and `parallel()`
(ParallelStream.java:41-97 + the {!hash} worker filter,
solr/core/src/java/org/apache/solr/search/HashQParserPlugin.java:46-73)
IS Spark's executor model. These wrappers exist to make the operator
inventory explicit and testable; each cites its stream class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def search(df: DataFrame, where: Column | None, sort: list[Column], fl: list[str]) -> DataFrame:
    """search(...) — filtered sorted scan (SearchStream.java:53,
    CloudSolrStream.java:71 shard merge == Spark sorted read)."""
    out = df.where(where) if where is not None else df
    return out.select(*fl).orderBy(*sort)


def top(df: DataFrame, sort: list[Column], n: int) -> DataFrame:
    """top(n, sort) — bounded-heap reorder (RankStream.java:48) ==
    TakeOrderedAndProject."""
    return df.orderBy(*sort).limit(n)


def unique(df: DataFrame, over: list[str]) -> DataFrame:
    """unique(over) — first-per-key dedup (UniqueStream.java:46)."""
    return df.dropDuplicates(over)


def rollup(df: DataFrame, over: list[str], metrics: list[Column]) -> DataFrame:
    """rollup()/hashRollup() — bucketed aggregation (RollupStream.java:44-90,
    HashRollupStream.java:44). Catalyst picks hash agg; the stream's
    sorted-input requirement is unnecessary."""
    return df.groupBy(*over).agg(*metrics)


def reduce_groups(df: DataFrame, by: list[str], fn, schema) -> DataFrame:
    """reduce(by, group operation) — arbitrary per-group computation over
    the group's full tuple set (ReducerStream.java:58 feeds each sorted
    group to a pluggable operation). Spark shape: groupBy().applyInPandas
    — the group arrives as one pandas frame, `fn(key, pdf) -> pdf`
    returns any relation. Arrow-batched; shuffles once on the group key."""
    return df.groupBy(*by).applyInPandas(fn, schema=schema)


def inner_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """innerJoin — merge join over sorted streams (InnerJoinStream.java:35);
    Catalyst's sort-merge join is the same physical plan, chosen only
    when broadcast isn't better."""
    return left.join(right, on, "inner")


def hash_join(left: DataFrame, right_small: DataFrame, on: list[str]) -> DataFrame:
    """hashJoin — build/probe (HashJoinStream.java:45-102) == broadcast join."""
    return left.join(F.broadcast(right_small), on, "inner")


def intersect_on(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """intersect(on) — keep left rows whose key appears in right
    (IntersectStream.java:43)."""
    return left.join(right.select(*on).distinct(), on, "left_semi")


def complement_on(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """complement(on) — left rows whose key is absent from right
    (ComplementStream.java:43)."""
    return left.join(right.select(*on).distinct(), on, "left_anti")


def score_join(
    from_df: DataFrame,
    to_df: DataFrame,
    from_key: str,
    to_key: str,
    score_col: str = "score",
    mode: str = "none",
) -> DataFrame:
    """{!join from=f to=t score=mode} — the ScoreJoin query
    (search/join/ScoreJoinQParserPlugin.java:73, Lucene's
    JoinUtil.createJoinQuery ScoreMode): the from-side query's scores
    are aggregated PER JOIN KEY by `mode` (none|avg|max|min|total),
    then every to-side doc whose key matches inherits that aggregate
    as its score.

    Spark shape: one groupBy on the from side (map-side partial agg —
    the key set is query-result-sized, far smaller than the from
    table), then an equi-join that AQE turns into a broadcast join
    whenever the aggregated key set is small, which is the common case
    for a scored query. mode='none' is a pure semi-join with the
    constant score Lucene's ScoreMode.None assigns."""
    if mode == "none":
        keys = from_df.select(F.col(from_key).alias(to_key)).distinct()
        return to_df.join(keys, to_key, "left_semi").withColumn(
            "score", F.lit(1.0)
        )
    aggs = {
        "avg": F.avg,
        "max": F.max,
        "min": F.min,
        "total": F.sum,
    }
    if mode not in aggs:
        raise ValueError(f"score_join: unknown score mode {mode!r}")
    scored_keys = (
        from_df.groupBy(F.col(from_key).alias(to_key))
        .agg(aggs[mode](score_col).cast("double").alias("score"))
    )
    return to_df.join(scored_keys, to_key, "inner")


def merge_streams(dfs: list[DataFrame], sort: list[Column]) -> DataFrame:
    """merge(on) — k-way merge of sorted streams (MergeStream.java:41)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.orderBy(*sort)


def cartesian_product(df: DataFrame, field: str) -> DataFrame:
    """cartesianProduct(field) — unnest a multivalued field
    (CartesianProductStream.java:47) == explode."""
    return df.withColumn(field, F.explode(field))


def fetch(df: DataFrame, lookup: DataFrame, on: list[str], fl: list[str]) -> DataFrame:
    """fetch(fl, on) — batched lookup join of extra fields (FetchStream.java:56)."""
    return df.join(lookup.select(*on, *fl), on, "left")


def timeseries(
    df: DataFrame, ts_col: str, gap: str, metrics: list[Column]
) -> DataFrame:
    """timeseries() — date-bucketed metrics (TimeSeriesStream.java:56-126).

    gap: a date_trunc unit ('day', 'hour', ...). Bucket is emitted as a
    'yyyy-MM-dd HH:mm:ss' string for engine-portable comparison.
    """
    bucket = F.date_format(F.date_trunc(gap, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss")
    return (
        df.groupBy(bucket.alias("bucket_ts")).agg(*metrics).orderBy("bucket_ts")
    )


def cursor_page(
    df: DataFrame, sort_cols: list[tuple[str, bool]], after: tuple | None, n: int
) -> DataFrame:
    """Stateless deep paging via sort-value totem (CursorMark.java:48):
    keyset pagination — WHERE (sortcols) > (last seen) ORDER BY ... LIMIT n.

    sort_cols: [(col, asc)] — the final col must be a unique tiebreaker.
    """
    order = [F.asc(c) if asc else F.desc(c) for c, asc in sort_cols]
    out = df
    if after is not None:
        # lexicographic keyset predicate
        pred = None
        for i, (c, asc) in enumerate(sort_cols):
            eq = None
            for j in range(i):
                cj, _ = sort_cols[j]
                e = F.col(cj) == F.lit(after[j])
                eq = e if eq is None else (eq & e)
            this = (F.col(c) > F.lit(after[i])) if asc else (F.col(c) < F.lit(after[i]))
            clause = this if eq is None else (eq & this)
            pred = clause if pred is None else (pred | clause)
        out = out.where(pred)
    return out.orderBy(*order).limit(n)


def export_sorted(df: DataFrame, sort: list[Column], fl: list[str]) -> DataFrame:
    """/export — full sorted result-set stream
    (solr/core/src/java/org/apache/solr/handler/export/ExportWriter.java:94,
    segment-merge at :621-640) == a full shuffle sort, which Spark
    executes as its native distributed sort."""
    return df.select(*fl).orderBy(*sort)
