"""Faceting & stats operators — the JSON Facet API family on DataFrames.

Reference surface being re-expressed (not ported):
- terms facet with sort/limit/mincount:
  solr/core/src/java/org/apache/solr/search/facet/FacetField.java,
  processors FacetFieldProcessorByArrayDV/ByHashDV (hash agg — Catalyst's
  hash aggregate is the same physical strategy, chosen automatically)
- range facet: solr/core/src/java/org/apache/solr/search/facet/FacetRangeProcessor.java:40-97
- query facet: solr/core/src/java/org/apache/solr/search/facet/FacetQuery.java
- stats component: solr/core/src/java/org/apache/solr/handler/component/StatsField.java:80-193
- pivot facets: solr/core/src/java/org/apache/solr/handler/component/PivotFacetProcessor.java

Two-phase facet refinement (FacetFieldProcessor.java:930-957) is
unnecessary on Spark: partial+final hash aggregation computes exact
counts in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.functions.det import davg, dstddev, dsum


def terms_facet(
    df: DataFrame,
    field: str,
    limit: int = 10,
    mincount: int = 1,
    sort_by_count: bool = True,
    prefix: str | None = None,
) -> DataFrame:
    """Value -> count buckets, top-`limit` (count desc, value asc).

    `prefix` restricts buckets to values with that prefix (the JSON
    Facet API's terms `prefix` param) — pushed BELOW the aggregation so
    the filter reaches the scan."""
    if prefix is not None:
        df = df.where(F.col(field).startswith(prefix))
    out = df.groupBy(F.col(field).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if mincount > 1:
        out = out.where(F.col("cnt") >= mincount)
    order = (
        [F.desc("cnt"), F.asc("value")] if sort_by_count else [F.asc("value")]
    )
    return out.orderBy(*order).limit(limit)


def terms_facet_stats(
    df: DataFrame,
    field: str,
    stats: list[Column],
    sort_stat: str | None = None,
    desc: bool = True,
    limit: int = 10,
    mincount: int = 1,
) -> DataFrame:
    """Terms facet with per-bucket stat aggregates and stat-ordered
    buckets — the JSON Facet API's `"sort": "<statName> desc"` coupling
    (FacetFieldProcessor sorts buckets by a sub-facet aggregate). One
    grouped pass computes cnt + every stat; the order-by rides the same
    aggregate columns (ties break on the bucket value asc)."""
    out = df.groupBy(F.col(field).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt"), *stats
    )
    if mincount > 1:
        out = out.where(F.col("cnt") >= mincount)
    key = sort_stat or "cnt"
    order = [F.desc(key) if desc else F.asc(key), F.asc("value")]
    return out.orderBy(*order).limit(limit)


def range_facet(
    df: DataFrame, col: str, start: float, end: float, gap: float
) -> DataFrame:
    """Numeric buckets [start+i*gap, start+(i+1)*gap); values outside are
    dropped (hardend semantics without the `other` buckets)."""
    c = F.col(col)
    bucket = F.floor((c - F.lit(start)) / F.lit(gap)).cast("long")
    return (
        df.where((c >= start) & (c < end))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            (F.lit(start) + F.col("bucket") * F.lit(gap)).alias("bucket_start"),
            "cnt",
        )
        .orderBy("bucket_start")
    )


def range_facet_other(
    df: DataFrame, col: str, start: float, end: float, gap: float
) -> DataFrame:
    """facet.range.other=all: the before/after/between summary buckets
    beside the range buckets (RangeFacetProcessor FacetRangeOther).
    Returns (name, cnt) for before (< start), between ([start, end)),
    after (>= end) — ONE aggregate pass, no extra scans."""
    c = F.col(col)
    wide = df.agg(
        F.sum(F.when(c < start, 1).otherwise(0)).cast("long").alias("before"),
        F.sum(F.when((c >= start) & (c < end), 1).otherwise(0))
        .cast("long")
        .alias("between"),
        F.sum(F.when(c >= end, 1).otherwise(0)).cast("long").alias("after"),
    )
    return wide.select(
        F.explode(
            F.create_map(
                F.lit("before"), F.col("before"),
                F.lit("between"), F.col("between"),
                F.lit("after"), F.col("after"),
            )
        ).alias("name", "cnt")
    ).orderBy("name")


def date_range_facet(
    df: DataFrame,
    col: str,
    start: str,
    end: str,
    gap: str,
    now=None,
) -> DataFrame:
    """Range facet over a timestamp field with DATE-MATH bounds and gap
    (facet.range with start=NOW/MONTH style params; Solr evaluates the
    math once per request against the pinned NOW — RangeFacetProcessor +
    util/DateMathParser.java). start/end are date-math strings, gap a
    math suffix like '+7DAYS' or '+1MONTH'.

    Scale shape: bounds evaluate DRIVER-SIDE to literals. Fixed-duration
    gaps bucket by pure epoch arithmetic (one projection, parquet range
    filter pushed down); calendar gaps (+1MONTH) enumerate the bounded
    boundary list and bucket via a CASE cascade whose size is the facet
    definition's own bucket count. Buckets Solr-style: [b, b+gap) with
    the last gap extending past `end` (hardend=false default), empty
    buckets emitted with cnt=0. Output (bucket_start, cnt)."""
    from datetime import timezone

    from solr_spark.functions.datemath import (
        apply_math, datemath_naive, gap_delta,
    )

    s = datemath_naive(start, now)
    e = datemath_naive(end, now)
    if e <= s:
        raise ValueError(f"empty date range {start!r}..{end!r}")
    bounds = [s]
    while bounds[-1] < e:
        nxt = apply_math(bounds[-1], gap)
        if nxt <= bounds[-1]:
            raise ValueError(f"gap {gap!r} does not advance")
        bounds.append(nxt)
    c = F.col(col)
    delta = gap_delta(gap)
    lo, hi = F.lit(s), F.lit(bounds[-1])
    if delta is not None:
        gap_ms = int(delta.total_seconds() * 1000)
        start_ms = int(s.replace(tzinfo=timezone.utc).timestamp() * 1000)
        # session TZ is UTC, so the NTZ->TZ cast is the identity map and
        # unix_millis gets the TIMESTAMP input it requires
        bucket = F.floor(
            (F.unix_millis(c.cast("timestamp")) - F.lit(start_ms))
            / F.lit(gap_ms)
        )
    else:
        bucket = None
        for i in range(len(bounds) - 1):
            cond = (c >= F.lit(bounds[i])) & (c < F.lit(bounds[i + 1]))
            bucket = F.when(cond, i) if bucket is None else bucket.when(cond, i)
    counts = (
        df.where((c >= lo) & (c < hi))
        .groupBy(bucket.cast("int").alias("_b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    buckets = spark.createDataFrame(
        [(i, bounds[i]) for i in range(len(bounds) - 1)],
        "_b int, bucket_start timestamp",
    )
    return (
        buckets.join(counts, "_b", "left")
        .select(
            "bucket_start",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
        .orderBy("bucket_start")
    )


def date_range_facet_sql(
    col: str, start: str, end: str, gap: str, now=None, table: str = "events"
) -> str:
    """DuckDB twin: the SAME driver-evaluated boundary literals, counts
    via a correlated subquery per (bounded) bucket."""
    from solr_spark.functions.datemath import apply_math, datemath_naive

    s = datemath_naive(start, now)
    e = datemath_naive(end, now)
    bounds = [s]
    while bounds[-1] < e:
        bounds.append(apply_math(bounds[-1], gap))
    rows = ",\n".join(
        f"(TIMESTAMP '{bounds[i]}', TIMESTAMP '{bounds[i + 1]}')"
        for i in range(len(bounds) - 1)
    )
    return f"""
SELECT b.bucket_start,
       (SELECT count(*) FROM {table} e
         WHERE e.{col} >= b.bucket_start AND e.{col} < b.hi) AS cnt
FROM (VALUES {rows}) AS b(bucket_start, hi)
ORDER BY b.bucket_start
"""


def query_facet(df: DataFrame, preds: dict[str, Column]) -> DataFrame:
    """Named predicate buckets -> one row per name with its count."""
    aggs = [
        F.sum(F.when(p, 1).otherwise(0)).cast("long").alias(name)
        for name, p in preds.items()
    ]
    wide = df.agg(*aggs)
    names = list(preds)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(n).alias("name"), F.col(n).alias("cnt"))
                    for n in names
                ]
            )
        ).alias("x")
    )
    return stacked.select("x.name", "x.cnt").orderBy("name")


def pivot_facet(
    df: DataFrame,
    fields: list[str],
    limit: int = 100,
    stats: list[Column] | None = None,
) -> DataFrame:
    """Multi-level value combination counts (pivot facet, flattened).

    `stats` attaches per-bucket stats columns to every pivot leaf — the
    facet.pivot + stats.field coupling (PivotFacetProcessor computes the
    StatsComponent per pivot constraint); here the extra aggregates ride
    the SAME grouped pass, no second scan."""
    return (
        df.groupBy(*fields)
        .agg(F.count(F.lit(1)).alias("cnt"), *(stats or []))
        .orderBy(F.desc("cnt"), *[F.asc(f) for f in fields])
        .limit(limit)
    )


def subfacet(
    df: DataFrame, outer: str, inner: str, per_bucket: int = 2
) -> DataFrame:
    """Nested terms facet: top `per_bucket` inner values per outer bucket
    (the FacetRequest/FacetProcessor recursion of the JSON Facet API,
    search/facet/FacetRequest.java) — one grouped pass + a window instead
    of Solr's per-bucket sub-requests."""
    from pyspark.sql import Window

    counts = df.groupBy(outer, inner).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(outer).orderBy(F.desc("cnt"), F.asc(inner))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= per_bucket)
        .select(outer, inner, "cnt", F.col("rnk").cast("long").alias("rnk"))
        .orderBy(outer, "rnk")
    )


def percentiles_facet(
    df: DataFrame, group: str, col: str, ps: list[float]
) -> DataFrame:
    """Exact interpolated percentiles per bucket (the stats component's
    `percentiles` — StatsField.java:80-193 uses t-digest approximations;
    we compute exact, which a distributed sort makes affordable)."""
    aggs = [
        F.round(F.percentile(col, F.lit(p)), 4).alias(f"p{int(p * 100)}")
        for p in ps
    ]
    return df.groupBy(group).agg(*aggs).orderBy(group)


def unique_facet(df: DataFrame, group: str, col: str) -> DataFrame:
    """Exact distinct-count per bucket (UniqueAgg / countDist metric,
    search/facet/UniqueAgg.java)."""
    return (
        df.groupBy(group)
        .agg(F.countDistinct(col).alias("uniq"))
        .orderBy(group)
    )


def hll_facet(df: DataFrame, group: str, col: str, rsd: float = 0.05) -> DataFrame:
    """Approximate distinct per bucket (HLLAgg, search/facet/HLLAgg.java)
    — HLL sketches differ across engines, so this op has no SQL oracle;
    tests bound its error against the exact count instead."""
    return (
        df.groupBy(group)
        .agg(F.approx_count_distinct(col, rsd).alias("approx_uniq"))
        .orderBy(group)
    )


def stats_facet(df: DataFrame, col: str) -> DataFrame:
    """min/max/sum/count/mean/stddev of a numeric field (StatsValues).

    Sum/mean/stddev go through exact decimal components so results are
    order-independent (hash-comparable against a single-node oracle).
    """
    c = F.col(col)
    return df.agg(
        F.round(F.min(c).cast("double"), 4).alias("min_v"),
        F.round(F.max(c).cast("double"), 4).alias("max_v"),
        dsum(c, "sum_v"),
        F.count(c).alias("count_v"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias("missing_v"),
        davg(c, "mean_v"),
        dstddev(c, "stddev_v"),
    )


def relatedness_facet(
    df: DataFrame,
    field: str,
    fg_pred: Column,
    limit: int = 10,
    min_pop: float = 0.0,
) -> DataFrame:
    """Semantic-knowledge-graph relatedness() agg per bucket
    (solr/core/src/java/org/apache/solr/search/facet/RelatednessAgg.java:696):

        bg_prob = bg_count / bg_size
        z = (fg_count - fg_size*bg_prob) / sqrt(fg_size*bg_prob*(1-bg_prob))
        relatedness = 0.2 * sum over (off, sc) in
          {(-80,50),(-30,30),(0,30),(30,30),(80,50)} of
            (z+off) / (sc + |z+off|)

    fg/bg popularities are fg_count/bg_size and bg_count/bg_size (the
    reference intentionally uses the BACKGROUND size for both —
    RelatednessAgg.java:489-492), rounded to 5 digits like the reference.
    Background = the whole frame; foreground = rows matching fg_pred.
    One hash aggregation (fg flag folded into the same groupBy) — no
    second pass over the corpus for the foreground.
    """
    sizes = df.agg(
        F.count(F.lit(1)).alias("bg"),
        F.sum(F.when(fg_pred, 1).otherwise(0)).alias("fg"),
    ).collect()[0]
    bg_size, fg_size = float(sizes["bg"]), float(sizes["fg"])
    per = df.groupBy(F.col(field).alias("value")).agg(
        F.count(F.lit(1)).cast("long").alias("bg_count"),
        F.sum(F.when(fg_pred, 1).otherwise(0)).cast("long").alias("fg_count"),
    )
    bg_prob = F.col("bg_count") / F.lit(bg_size)
    num = F.col("fg_count") - F.lit(fg_size) * bg_prob
    denom_raw = F.sqrt(F.lit(fg_size) * bg_prob * (F.lit(1.0) - bg_prob))
    denom = F.when(denom_raw == 0.0, F.lit(1e-10)).otherwise(denom_raw)
    z = num / denom
    rel = F.lit(0.0)
    for off, sc in ((-80.0, 50.0), (-30.0, 30.0), (0.0, 30.0), (30.0, 30.0), (80.0, 50.0)):
        rel = rel + F.lit(0.2) * (z + F.lit(off)) / (F.lit(sc) + F.abs(z + F.lit(off)))
    out = per.select(
        "value",
        "fg_count",
        "bg_count",
        F.round(F.col("fg_count") / F.lit(bg_size), 5).alias("fg_pop"),
        F.round(F.col("bg_count") / F.lit(bg_size), 5).alias("bg_pop"),
        F.round(rel, 5).alias("relatedness"),
    )
    if min_pop > 0.0:
        out = out.where(
            (F.col("fg_pop") >= min_pop) & (F.col("bg_pop") >= min_pop)
        )
    return out.orderBy(F.desc("relatedness"), F.asc("value")).limit(limit)


def facet_meta(df: DataFrame, field: str) -> DataFrame:
    """JSON Facet API bucket metadata beside the buckets themselves:
    numBuckets (distinct values), allBuckets.count (every doc, bucketed
    or not), missing.count (null field) — search/facet/FacetField.java
    numBuckets/allBuckets/missing options."""
    c = F.col(field)
    return df.agg(
        F.count_distinct(c).alias("num_buckets"),
        F.count(F.lit(1)).alias("all_buckets_cnt"),
        F.sum(c.isNull().cast("long")).alias("missing_cnt"),
    )


# JSON Facet domain changes (FacetRequest.Domain,
# search/facet/FacetRequest.java:138-258: `filter`, `toParent`
# (blockParent), `toChildren` (blockChildren), `join` field transforms;
# excludeTags re-widens by dropping a tagged filter). Each transform
# maps the current facet DOMAIN (a DataFrame) to a new one, then any
# facet in this module runs over the result — the same composition
# model as the reference's domain pipeline, with `filter` being a plain
# .where() and excludeTags being "compose the chain without that
# predicate" (explicit in code rather than via tag bookkeeping).


def domain_to_parent(
    children: DataFrame, parents: DataFrame, root_col: str,
    parent_key: str | None = None,
) -> DataFrame:
    """blockParent: the matched children's domain becomes their parent
    blocks (semi-join up — one shuffle on the root key)."""
    from solr_spark.operators.blockjoin import parent_query

    return parent_query(parents, children, root_col, F.lit(True),
                        parent_key=parent_key)


def domain_to_children(
    parents: DataFrame, children: DataFrame, root_col: str,
    parent_key: str | None = None,
) -> DataFrame:
    """blockChildren: the matched parents' domain becomes all their
    children."""
    from solr_spark.operators.blockjoin import child_query

    return child_query(parents, children, root_col, F.lit(True),
                       parent_key=parent_key)


def join_domain(
    base: DataFrame, target: DataFrame, from_col: str, to_col: str
) -> DataFrame:
    """join domain ({!join from= to=} as a domain transform,
    FacetRequest.Domain.JoinField): rows of `target` whose `to_col`
    appears among the domain's `from_col` values. Distinct on the join
    key first so a hot key in the domain doesn't fan the semi-join out;
    Catalyst broadcasts the key set when small."""
    keys = base.select(F.col(from_col).alias("__jd_key")).distinct()
    return target.join(
        keys, target[to_col] == F.col("__jd_key"), "left_semi"
    )
