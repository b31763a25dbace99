"""Synthesize a 10x-scale copy of the sf0.1 harness tables for LOCAL
performance A/Bs only (the driver generates its own sf1.0; TESTDATA.md
forbids touching /root/testdata). Output: /root/sf1_local/{documents,
embeddings}.parquet with ~50k docs / 20k vectors shaped like sf0.1.

Replicas perturb the text head so the copies are not byte-identical
documents (a copy tag token is prepended), which keeps tokenize/shingle
volume representative; values are irrelevant — this data is never used
for correctness, only for timing the dedup/facet/ann operators at the
driver's sf1.0 scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from solr_spark.session import get_spark  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_local"
COPIES = int(os.environ.get("SF1_COPIES", "10"))

spark = get_spark("make_sf1_local", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

docs = spark.read.parquet(f"{src}/documents.parquet")
n = docs.count()
reps = spark.range(COPIES).select(F.col("id").alias("_rep"))
big = (
    docs.crossJoin(reps)
    .select(
        (F.col("doc_id") + F.col("_rep") * F.lit(n)).alias("doc_id"),
        F.when(F.col("_rep") == 0, F.col("text"))
        .otherwise(F.concat(F.lit("rep"), F.col("_rep").cast("string"), F.lit(" v"), F.col("text")))
        .alias("text"),
        "lang",
        "source",
        F.col("n_chars"),
    )
)
big.repartition(8).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

emb = spark.read.parquet(f"{src}/embeddings.parquet")
ne = emb.count()
bige = (
    emb.crossJoin(reps)
    .select(
        (F.col("vec_id") + F.col("_rep") * F.lit(ne)).alias("vec_id"),
        "embedding",
        "label",
    )
)
bige.repartition(4).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
print({"docs": big.count(), "embeddings": bige.count(), "out": OUT})
spark.stop()
