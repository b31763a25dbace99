"""solr_spark — a PySpark-native inverted-index + BM25 analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the Solr reference (markrmiller/solr) on Spark DataFrames:

- analysis chain  -> JVM-side regexp column expressions
                     (ref: solr/server/solr/configsets/_default/conf/managed-schema.xml:295-311,
                      word-delimiter semantics of managed-schema.xml:390-423)
- inverted index  -> (term, docid, tf) postings DataFrames + block-encoded
                     posting lists with block-max metadata
                     (ref: solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:233)
- BM25 top-k      -> column-expression scorer, k1=1.2 b=0.75
                     (ref: solr/core/src/java/org/apache/solr/search/similarities/BM25SimilarityFactory.java:41-56)
- facets/stats    -> groupBy/agg (ref: solr/core/src/java/org/apache/solr/search/facet/)
- streaming exprs -> DataFrame operators (ref: solrj io/stream, Lang.java:45-373)

Nothing is ported from the reference; all code here is original and
Spark-first.
"""

__version__ = "0.1.0"
