"""Collapse / Expand / Grouping — group-head dedup and top-per-group.

Reference surface:
- collapse: solr/core/src/java/org/apache/solr/search/CollapsingQParserPlugin.java:127
  (3.5k LoC of per-segment head selection) -> a window row_number() == 1
- expand: solr/core/src/java/org/apache/solr/handler/component/ExpandComponent.java
  (re-attach group members) -> join back on the group key with a per-group
  limit
- grouping: solr/core/src/java/org/apache/solr/search/Grouping.java:80
  (two Lucene passes: top groups, then top docs per group) -> one window
  pass; Spark's hash-partitioned window replaces the two-pass trick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse(df: DataFrame, group: str, order: list[Column]) -> DataFrame:
    """Keep one head row per group by the given sort (score desc etc.)."""
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def expand(
    collapsed: DataFrame, full: DataFrame, group: str, order: list[Column], per_group: int = 5
) -> DataFrame:
    """Re-attach up to `per_group` non-head members for collapsed groups."""
    heads = collapsed.select(F.col(group).alias("_g"))
    w = Window.partitionBy(group).orderBy(*order)
    members = (
        full.join(F.broadcast(heads), full[group] == F.col("_g"), "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 1)
        .where(F.col("_rn") <= per_group + 1)
        .drop("_rn")
    )
    return members


def grouping(
    df: DataFrame,
    group: str,
    order: list[Column],
    group_limit: int = 2,
) -> DataFrame:
    """Top-N rows per group (grouped search results)."""
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("grp_rank", F.row_number().over(w))
        .where(F.col("grp_rank") <= group_limit)
    )


def grouped_facet(
    df: DataFrame,
    group: str,
    facet_field: str,
    limit: int = 10,
    mincount: int = 1,
) -> DataFrame:
    """group.facet=true counts (solr/core/src/java/org/apache/solr/
    search/Grouping.java:80 grouped path; the grouped-facet collector
    counts each GROUP once per facet value, not each document): cnt =
    number of distinct groups containing at least one doc with the
    value. One distinct + one aggregation — both shuffles carry
    (group, value) pairs only, never full rows."""
    return (
        df.select(F.col(group).alias("_g"), F.col(facet_field).alias("value"))
        .where(F.col("value").isNotNull())
        .distinct()
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= mincount)
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(limit)
    )


def grouping_by_func(
    df: DataFrame,
    func_expr: str,
    order: list[Column],
    group_limit: int = 2,
) -> DataFrame:
    """group.func: grouped results keyed by a function-query VALUE
    (search/Grouping.java grouped-by-valuesource command). The
    expression compiles through the function-query registry
    (functions/valuesources.parse_func) into a Column, then the
    standard per-group top-N window applies — the group key never
    leaves the JVM."""
    from solr_spark.functions.valuesources import parse_func

    keyed = df.withColumn("group_value", parse_func(func_expr, df=df))
    return grouping(keyed, "group_value", order, group_limit)


def grouping_by_queries(
    df: DataFrame,
    queries: dict,
    order: list[Column],
    group_limit: int = 2,
) -> DataFrame:
    """group.query: one group of top-N rows per named predicate
    (search/Grouping.java query command; a doc can appear in several
    groups, exactly like the reference). `queries` maps group label ->
    boolean Column. Single plan: union of filtered windows — Catalyst
    shares the scan via reused exchange when predicates overlap."""
    parts = []
    for label, pred in queries.items():
        parts.append(
            df.where(pred).withColumn("group_value", F.lit(label))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return grouping(out, "group_value", order, group_limit)
