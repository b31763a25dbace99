"""Round-6 isolation bench: per-operator timings + plan capture.

Supplementary to the FROZEN bench.py (guide §1.4: time computations with
the noop sink; §1.5: label jobs). Does NOT replace bench.py numbers —
it exists so OPTIMIZATION_r06.md can cite per-phase build costs and
noop-isolated operator times, and so plans/r06/*.txt captures are
reproducible.

Usage:
  python bench_extra.py ops      [sf_dir]   # dedup/phrase/facet/ann ops
  python bench_extra.py build    [n_docs]   # build phase timings
  python bench_extra.py queries  [n_docs]   # bm25 suite over a built index
  python bench_extra.py plans    <out_dir> [sf_dir]  # explain() captures

Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR as in bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from solr_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, out, reps=2):
    vals = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        vals.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    out[name] = vals
    print(f"[bench_extra] {name}: {vals}", file=sys.stderr)


def run_ops(spark, sf_dir: str) -> dict:
    from solr_spark.operators.dedup import dup_span_stats, lsh_candidate_pairs
    from solr_spark.operators.facets import terms_facet
    from solr_spark.operators.similarity import cosine_topk
    from solr_spark.query.inline import doc_tokens

    out: dict = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    toks = doc_tokens(docs, id_col="doc_id", text_col="text")
    timed(spark, "dedup_spans_noop", lambda: noop(dup_span_stats(toks, n=8)), out)
    timed(
        spark, "dedup_lsh_noop",
        lambda: noop(lsh_candidate_pairs(toks, ordered=False)), out,
    )
    timed(spark, "facet_lang_noop", lambda: noop(terms_facet(docs, "lang", limit=10)), out)
    qv = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    timed(spark, "ann_cosine_noop", lambda: noop(cosine_topk(emb, qv, k=10)), out)
    return out


def run_build(spark, n_docs: int) -> dict:
    """Phase-split build timings on the bench corpus (same knobs as
    bench.py index_build/positions_build/combined_build)."""
    from solr_spark.index.builder import build_index
    from solr_spark.sources.corpus import synthesize_corpus

    out: dict = {}
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    root = f"{base}/solr_spark_bench_extra"
    corpus = synthesize_corpus(spark, n_docs, seed=42).persist()
    corpus.count()

    def build(name, **kw):
        d = f"{root}/{name}"

        def one():
            shutil.rmtree(d, ignore_errors=True)
            build_index(
                spark, corpus, d,
                num_buckets=16, salt_threshold=20000, num_salts=8, **kw,
            )

        timed(spark, name, one, out)

    build("index_build")
    build("positions_build", build_blocks=False, build_positions=True)
    build("combined_build", build_blocks=True, build_positions=True)
    corpus.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return out


def run_queries(spark, n_docs: int) -> dict:
    from solr_spark.index.builder import build_index
    from solr_spark.query.engine import bm25_topk
    from solr_spark.query.wand import bm25_topk_wand
    from solr_spark.sources.corpus import synthesize_corpus

    from bench import QUERY_SET, WAND_SET

    out: dict = {}
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = f"{base}/solr_spark_bench_extra/qidx"
    corpus = synthesize_corpus(spark, n_docs, seed=42).persist()
    corpus.count()
    shutil.rmtree(d, ignore_errors=True)
    index = build_index(
        spark, corpus, d, num_buckets=16, salt_threshold=20000, num_salts=8,
    )
    for name, qtext, k, qmode in QUERY_SET:
        timed(
            spark, name,
            lambda q=qtext, kk=k, m=qmode: bm25_topk(index, q, k=kk, mode=m).collect(),
            out, reps=3,
        )
        if name in WAND_SET:
            timed(
                spark, f"{name}_wand",
                lambda q=qtext, kk=k, m=qmode: bm25_topk_wand(
                    index, q, k=kk, mode=m
                ).collect(),
                out, reps=3,
            )
    corpus.unpersist()
    shutil.rmtree(f"{base}/solr_spark_bench_extra", ignore_errors=True)
    return out


def capture_plans(spark, out_dir: str, sf_dir: str) -> None:
    """Write .explain('formatted') captures for the touched queries."""
    from solr_spark.index.builder import build_index
    from solr_spark.operators.dedup import dup_span_stats, lsh_candidate_pairs
    from solr_spark.operators.phrase import phrase_match
    from solr_spark.query.engine import bm25_topk
    from solr_spark.query.inline import doc_tokens
    from solr_spark.query.positions import phrase_docids
    from solr_spark.query.wand import bm25_topk_wand
    from solr_spark.sources.corpus import synthesize_corpus

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = doc_tokens(docs, id_col="doc_id", text_col="text")

    def cap(name, df):
        p = os.path.join(out_dir, name + ".txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print(f"[bench_extra] wrote {p}", file=sys.stderr)

    cap("dedup_spans", dup_span_stats(toks, n=8))
    cap("dedup_lsh", lsh_candidate_pairs(toks, ordered=False))

    # bench-corpus paths need a built index (small: 20k docs)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = f"{base}/solr_spark_bench_extra/planidx"
    corpus = synthesize_corpus(spark, 20000, seed=42).persist()
    corpus.count()
    shutil.rmtree(d, ignore_errors=True)
    index = build_index(
        spark, corpus, d, num_buckets=16, salt_threshold=20000,
        num_salts=8, build_positions=True,
    )
    cap("q_or_mixed", bm25_topk(index, "jsonParser bufferSize return", k=10))
    cap("q_or_mixed_wand", bm25_topk_wand(index, "jsonParser bufferSize return", k=10))
    cap("q_phrase_indexed", phrase_docids(index, ["json", "parser"], slop=0))
    corpus_ids = index.docs().select("docid", "repo", "path", "commit")
    cap(
        "q_phrase_inline",
        phrase_match(
            corpus.join(corpus_ids, ["repo", "path", "commit"]),
            "json parser", id_col="docid", text_col="content",
        ),
    )
    corpus.unpersist()
    shutil.rmtree(f"{base}/solr_spark_bench_extra", ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ops"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"bench_extra_{mode}", cores=cores)
    if mode == "ops":
        res = run_ops(spark, sys.argv[2] if len(sys.argv) > 2 else sf_dir)
    elif mode == "build":
        res = run_build(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 200000)
    elif mode == "queries":
        res = run_queries(spark, int(sys.argv[2]) if len(sys.argv) > 2 else 200000)
    elif mode == "plans":
        capture_plans(
            spark, sys.argv[2],
            sys.argv[3] if len(sys.argv) > 3 else sf_dir,
        )
        res = {"plans": "written"}
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(json.dumps({"mode": mode, **res}))
