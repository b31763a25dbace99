"""Block join (parent/child nested documents) + uniqueBlock aggregation.

Re-expresses the reference's nested-document queries:
- {!parent which=...}: solr/core/src/java/org/apache/solr/search/join/
  BlockJoinParentQParserPlugin.java:30 — return PARENTS having >= 1
  child matching the inner query
- {!child of=...}: BlockJoinChildQParserPlugin.java — return CHILDREN of
  parents matching the parent query
- uniqueBlock(_root_): search/facet/UniqueBlockAgg.java:1-88 — count
  DISTINCT parent blocks per facet bucket (cheaper than unique() because
  children of one parent collapse to one count)

The reference encodes nesting positionally inside a segment (_root_
convention); the Spark-native shape is an explicit `root` key column on
the child table — same query algebra, join-based execution. Parent
filters broadcast when small; the child->parent semi-join shuffles on
the root key only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parent_query(
    parents: DataFrame,
    children: DataFrame,
    root_col: str,
    child_pred: Column,
    parent_key: str | None = None,
) -> DataFrame:
    """Parents with at least one child matching child_pred ({!parent})."""
    pk = parent_key or root_col
    hits = children.where(child_pred).select(F.col(root_col).alias(pk)).distinct()
    return parents.join(hits, pk, "left_semi")


def child_query(
    parents: DataFrame,
    children: DataFrame,
    root_col: str,
    parent_pred: Column,
    parent_key: str | None = None,
) -> DataFrame:
    """Children whose parent matches parent_pred ({!child})."""
    pk = parent_key or root_col
    roots = parents.where(parent_pred).select(F.col(pk).alias(root_col))
    return children.join(roots, root_col, "left_semi")


def unique_block(
    children: DataFrame, bucket_col: str, root_col: str
) -> DataFrame:
    """Per-bucket count of DISTINCT parent blocks (uniqueBlock agg)."""
    return (
        children.groupBy(bucket_col)
        .agg(F.countDistinct(root_col).alias("unique_blocks"))
        .orderBy(bucket_col)
    )


def childfield(
    parents: DataFrame,
    children: DataFrame,
    root_col: str,
    field: str,
    child_pred: Column | None = None,
    order_by: str | None = None,
    descending: bool = True,
    parent_key: str | None = None,
    alias: str = "childfield",
) -> DataFrame:
    """childfield(field) — the reference's ChildFieldValueSourceParser
    (solr/core/src/java/org/apache/solr/search/join/
    ChildFieldValueSourceParser.java, registered as "childfield" in
    ValueSourceParser.java:1088): for each PARENT, the value of `field`
    taken from one of its children, usable as a sort key on a {!parent}
    query.

    The reference picks the child by segment-local docid order inside
    the block; block layout is an index-storage artifact, so the Spark
    form makes the pick explicit: the child that maximizes (descending,
    the reference's sortedByDesc default) or minimizes `order_by`
    (default: `field` itself) among children matching `child_pred`.
    One max_by aggregation on the root key — a single shuffle,
    broadcast-joined back to the parents when small (Catalyst picks).
    Parents with no matching child carry null (the reference returns
    the field type's missing value)."""
    pk = parent_key or root_col
    kids = children if child_pred is None else children.where(child_pred)
    ob = order_by or field
    # composite pick key (order_by, field): ties on order_by resolve to
    # the extreme field value, so the RETURNED value is deterministic
    # even when the winning child is ambiguous
    key = F.struct(F.col(ob), F.col(field))
    pick = (
        F.max_by(F.col(field), key) if descending else F.min_by(F.col(field), key)
    )
    per_parent = kids.groupBy(F.col(root_col).alias(pk)).agg(pick.alias(alias))
    return parents.join(per_parent, pk, "left")
