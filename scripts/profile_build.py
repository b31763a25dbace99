"""Phase-level profiling of build_index: times each Spark action by
wrapping the builder's internals manually (same plan shapes)."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solr_spark.index.builder import (  # noqa: E402
    FILES_PER_BUCKET,
    SKIPLIST_CAP,
    _analyze_docs,
    _postings_from_docs,
    _term_dict_from_docs,
    _write_bucketed,
    assign_docids,
    bucket_of_col,
    tid_bucket_col,
)
from solr_spark.index.blocks import BLOCKS_SCHEMA, BLOCK_SIZE, make_block_encoder  # noqa: E402
from solr_spark.session import get_spark  # noqa: E402
from solr_spark.sources.corpus import synthesize_corpus  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "fused"  # fused | head
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
B, SALT_T, NSALT = 16, 20000, 8

spark = get_spark(f"profile_{MODE}")
out = f"/dev/shm/solr_spark_bench/profile_{MODE}"
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out, exist_ok=True)

corpus = synthesize_corpus(spark, N, seed=42).persist()
corpus.count()

marks = []
t0 = time.time()


def mark(name):
    marks.append((name, round(time.time() - t0, 2)))
    print(f"[{MODE}] {name}: {marks[-1][1]}s (cum)")


corpus2 = assign_docids(corpus)
docs_tok = _analyze_docs(corpus2).persist()
docs_tok.drop("_tokens").write.mode("overwrite").parquet(f"{out}/docs")
mark("docs_write")
chunk_post = _postings_from_docs(docs_tok).withColumn("bucket", tid_bucket_col("tid", B))

if MODE == "fused":
    fsalt = F.pmod(F.xxhash64(F.col("tid"), F.lit(7)), F.lit(FILES_PER_BUCKET))
    laid = (
        chunk_post.repartition(B * FILES_PER_BUCKET, F.col("bucket"), fsalt)
        .sortWithinPartitions("tid", "docid")
        .persist()
    )
    laid.write.mode("overwrite").partitionBy("bucket").parquet(f"{out}/postings")
    mark("postings_write")
    postings = laid
else:
    _write_bucketed(chunk_post, f"{out}/postings", B, ("tid", "docid"))
    mark("postings_write")
    postings = spark.read.parquet(f"{out}/postings")

_term_dict_from_docs(docs_tok).write.mode("overwrite").parquet(f"{out}/dict")
mark("dict_write")
agg = docs_tok.agg(F.count(F.lit(1)).alias("n"), F.sum("doclen").alias("tl")).collect()[0]
docs_tok.unpersist()
mark("doc_agg")
n_docs, avgdl = int(agg["n"]), float(agg["tl"]) / int(agg["n"])

postings_agg = postings.groupBy("tid").agg(
    F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("cttf")
)
head_tids = (
    postings_agg.where(F.col("df") > F.lit(SALT_T)).select("tid")
    .withColumn("_is_head", F.lit(True))
)
salted = (
    (postings if MODE == "fused" else spark.read.parquet(f"{out}/postings"))
    .join(F.broadcast(head_tids), "tid", "left")
    .withColumn(
        "salt",
        F.when(F.col("_is_head").isNotNull(), F.pmod(F.col("docid"), F.lit(NSALT)).cast("int")).otherwise(F.lit(0)),
    )
    .drop("_is_head")
)
if MODE == "fused":
    sorted_post = salted.sortWithinPartitions("tid", "salt", "docid")
else:
    sorted_post = salted.repartition(96, "tid", "salt").sortWithinPartitions("tid", "salt", "docid")
blocks = sorted_post.mapInArrow(make_block_encoder(avgdl, BLOCK_SIZE), schema=BLOCKS_SCHEMA)
_write_bucketed(blocks, f"{out}/blocks", B, ("tid", "salt", "block_id"))
mark("blocks_write")

from pyspark.sql import Window  # noqa: E402

bmeta = spark.read.parquet(f"{out}/blocks").select(
    "tid", "min_tf_part", F.col("n_docs").alias("nd"), "max_tf_part"
)
mtp = bmeta.groupBy("tid").agg(F.max("max_tf_part").alias("mtp"))
w = Window.partitionBy("tid").orderBy(F.desc("min_tf_part"), F.desc("nd"))
skips = (
    bmeta.withColumn("_rn", F.row_number().over(w))
    .where(F.col("_rn") <= SKIPLIST_CAP)
    .groupBy("tid")
    .agg(F.sort_array(F.collect_list(F.struct(F.col("min_tf_part").alias("m"), F.col("nd"))), asc=False).alias("skips"))
)
block_meta = mtp.join(skips, "tid")

term_dict = spark.read.parquet(f"{out}/dict").distinct()
term_stats = (
    postings_agg.join(term_dict, "tid")
    .withColumn("is_head", F.col("df") > F.lit(SALT_T))
    .withColumn("bucket", bucket_of_col("term", B))
    .join(block_meta, "tid", "left")
)
(
    term_stats.repartition(max(1, B // 2), "bucket")
    .sortWithinPartitions("term")
    .write.mode("overwrite")
    .partitionBy("bucket")
    .parquet(f"{out}/term_stats")
)
mark("term_stats_write")
print(f"[{MODE}] TOTAL {round(time.time() - t0, 2)}s  marks={marks}")
spark.stop()
