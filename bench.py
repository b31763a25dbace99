"""Round benchmark: index-build throughput + query latencies.

Runs on local[$SPARK_GRAFT_CPUS] over $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus a synthesized north-rule corpus, and prints
ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "docs_per_sec": ..., ...}

Env knobs:
  SPARK_GRAFT_CPUS        parallelism (default 32)
  SPARK_GRAFT_SF_DIR      harness table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_BENCH_DOCS  synthesized corpus size (default 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from solr_spark.index.builder import build_index  # noqa: E402
from solr_spark.operators.dedup import lsh_candidate_pairs  # noqa: E402
from solr_spark.operators.facets import terms_facet  # noqa: E402
from solr_spark.operators.similarity import cosine_topk  # noqa: E402
from solr_spark.query.engine import bm25_topk  # noqa: E402
from solr_spark.query.wand import bm25_topk_wand  # noqa: E402
from solr_spark.query.inline import doc_tokens  # noqa: E402
from solr_spark.session import get_spark  # noqa: E402
from solr_spark.sources.corpus import synthesize_corpus  # noqa: E402

QUERY_SET = [
    ("q_or_mixed", "jsonParser bufferSize return", 10, "OR"),
    ("q_and_head", "return import", 10, "AND"),
    ("q_head", "return", 10, "OR"),
    ("q_tail", "parseShard7", 10, "OR"),
    ("q_or4", "parse build read write", 100, "OR"),
    # true head+tail mix (tail_card makes digit suffixes rare): the
    # block-max path must beat flat here by skipping the head decode
    ("q_mixed_tail", "return import parseShard7", 10, "OR"),
]
#: queries also run through the pruned path for the wand-vs-flat compare
WAND_SET = ("q_or_mixed", "q_and_head", "q_mixed_tail")


def _contention_markers() -> dict:
    """Record how noisy the box is WHEN the bench ran, so cross-round
    comparisons can spot a contended run instead of re-litigating VM
    variance (round-3 lesson: identical code measured 44 s vs 85 s in
    different windows). `cal_ms` is a fixed single-thread md5 loop —
    a portable per-core-speed calibration constant."""
    import hashlib

    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    blob = b"x" * (1 << 20)
    t0 = time.time()
    h = hashlib.md5()
    for _ in range(64):
        h.update(blob)
    return {
        "load_1m": round(load1, 2),
        "load_5m": round(load5, 2),
        "cal_ms": round((time.time() - t0) * 1000.0, 1),
    }


def run(cores: int | None = None, out: dict | None = None) -> dict:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
    #: clean-run protocol: the build measurements (the noisiest, and the
    #: headline numbers) run REPEATS times; the best is reported and the
    #: raw list is kept in the JSON so a contended repeat is visible
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "")
    spark = get_spark(
        f"bench_{cores}",
        cores=cores,
        # concurrent query jobs share the cluster fairly in query mode
        extra_conf={"spark.scheduler.mode": "FAIR"} if mode == "query" else None,
    )
    res: dict = out if out is not None else {}
    res["contention"] = _contention_markers()
    raw_builds: dict[str, list[float]] = {}
    queries: dict[str, float] = {}
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    idx_dir = f"{base}/solr_spark_bench/index_{cores}"

    # --- index build throughput (north-rule corpus) ---
    corpus = synthesize_corpus(spark, n_docs, seed=42).persist()
    corpus.count()  # materialize generation outside the timed window

    scaling_mode = mode == "build"

    if mode == "query":
        # query-THROUGHPUT scaling mode (north rule: "query p50" at two
        # cluster sizes): build once untimed, then drive the engine with
        # a concurrent client pool — per-query latency is Amdahl-bound
        # (few partitions per query), but query throughput should scale
        # with cores because independent jobs pack the extra task slots.
        from concurrent.futures import ThreadPoolExecutor

        shutil.rmtree(idx_dir, ignore_errors=True)
        index = build_index(
            spark, corpus, idx_dir,
            num_buckets=16, salt_threshold=20000, num_salts=8,
        )
        # DISTINCT query texts (head + rotating mid terms from the
        # corpus vocabulary): duplicated texts would be collapsed by the
        # engine's canonicalization and measure label-joins, not scoring
        heads = ["return", "import", "self", "value", "data"]
        mids = [
            "bufferSize", "jsonParser", "httpClient", "parseInput",
            "writeOutput", "maxRetries", "userName", "utf8Parser2",
            "readFile", "toString", "hashCode", "getValue", "setValue",
            "indexOf", "appendChild", "def", "class", "public", "static",
            "void", "int", "string", "for", "while", "if", "else", "try",
            "catch", "throw", "new", "null", "true", "false", "func",
            "let", "const", "var", "struct", "impl", "match",
        ]
        jobs = []
        for rep in range(int(os.environ.get("SPARK_GRAFT_QBATCH", "64"))):
            # (rep%5, (rep//5)%40) is injective for rep < 200; beyond
            # that a third term keeps every text distinct
            qtext = f"{heads[rep % 5]} {mids[(rep // 5) % len(mids)]}"
            if rep >= 200:
                qtext += f" {mids[rep % len(mids)]}"
            jobs.append((f"q{rep}", qtext, 10, "OR"))
        for name, qtext, k, qmode in QUERY_SET:  # warm (plan + IO caches)
            bm25_topk(index, qtext, k=k, mode=qmode).collect()
        lat: list[float] = []

        def one(job):
            _, qtext, k, qmode = job
            t0 = time.time()
            bm25_topk(index, qtext, k=k, mode=qmode).collect()
            return time.time() - t0

        t_wall = time.time()
        with ThreadPoolExecutor(max_workers=8) as pool:
            lat = list(pool.map(one, jobs))
        t_wall = time.time() - t_wall
        lat.sort()

        # SERVED pool (round-5): the same distinct-query client pool
        # through the QueryBatcher micro-batching front-end — waves of
        # concurrent requests execute as ONE bm25_topk_batch plan, so
        # the per-query driver planning that capped the raw pool at
        # ~3 qps amortizes across each wave. Result cache OFF: every
        # query still executes; this measures batching, not memoization.
        from solr_spark.query.serving import QueryBatcher

        batcher = QueryBatcher(
            index, k=10, mode="OR", use_cache=False,
            max_batch=64, max_wait_ms=8,
        )

        def one_served(job):
            _, qtext, _, _ = job
            t0 = time.time()
            batcher.search(qtext)
            return time.time() - t0

        try:
            one_served(jobs[0])  # warm the batch plan shape
            t_srv = time.time()
            with ThreadPoolExecutor(max_workers=8) as pool:
                lat_srv = list(pool.map(one_served, jobs))
            t_srv = time.time() - t_srv

            # server-concurrency view (32 clients): a search SERVER sees
            # many concurrent clients, and that is where micro-batching
            # pays — a closed-loop 8-client pool can only ever form
            # 8-query waves, which leaves the batch plan's fixed cost
            # unamortized. Raw pool at 32 clients is the contrast: the
            # per-query driver planning serializes it regardless of the
            # client count.
            t_srv32 = time.time()
            with ThreadPoolExecutor(max_workers=32) as pool:
                lat_srv32 = list(pool.map(one_served, jobs))
            t_srv32 = time.time() - t_srv32
            lat_srv32.sort()
        finally:
            batcher.close()
        lat_srv.sort()

        t_raw32 = time.time()
        with ThreadPoolExecutor(max_workers=32) as pool:
            lat_raw32 = list(pool.map(one, jobs))
        t_raw32 = time.time() - t_raw32
        lat_raw32.sort()

        # batched formulation: the same workload as ONE distributed plan
        # (bm25_topk_batch) — this is the path whose throughput should
        # scale with cluster size; the concurrent-single-query pool above
        # is driver-planning-bound by design and measures the p50 bar
        from solr_spark.query.engine import bm25_topk_batch

        batch_queries = {
            f"q{i}": job[1] for i, job in enumerate(jobs)
        }
        bm25_topk_batch(index, batch_queries, k=10).count()  # warm
        t_b = time.time()
        bm25_topk_batch(index, batch_queries, k=10).collect()
        t_b = time.time() - t_b

        # HOT searcher view: a serving deployment holds the index in
        # memory (Solr: warm searcher + OS page cache; here:
        # Index.pin_memory() persists postings+docs in the executor
        # columnar cache). Same 8-client raw pool, per-query parquet
        # decode eliminated — the interactive p50 headline.
        index.pin_memory()
        t_hot = time.time()
        with ThreadPoolExecutor(max_workers=8) as pool:
            lat_hot = list(pool.map(one, jobs))
        t_hot = time.time() - t_hot
        lat_hot.sort()

        corpus.unpersist()
        spark.stop()
        res.update(
            {
                "metric": "bm25 query throughput qps (scaling mode)",
                "value": round(t_wall, 3),
                "unit": "sec",
                "qps": round(len(jobs) / t_wall, 2),
                "p50_s": round(lat[len(lat) // 2], 3),
                "p90_s": round(lat[int(len(lat) * 0.9)], 3),
                "qps_served": round(len(jobs) / t_srv, 2),
                "p50_served_s": round(lat_srv[len(lat_srv) // 2], 3),
                "p90_served_s": round(lat_srv[int(len(lat_srv) * 0.9)], 3),
                "qps_served_c32": round(len(jobs) / t_srv32, 2),
                "p50_served_c32_s": round(lat_srv32[len(lat_srv32) // 2], 3),
                "p90_served_c32_s": round(
                    lat_srv32[int(len(lat_srv32) * 0.9)], 3
                ),
                "qps_raw_c32": round(len(jobs) / t_raw32, 2),
                "p50_raw_c32_s": round(lat_raw32[len(lat_raw32) // 2], 3),
                "qps_batch": round(len(batch_queries) / t_b, 2),
                "batch_wall_s": round(t_b, 3),
                "qps_hot": round(len(jobs) / t_hot, 2),
                "p50_hot_s": round(lat_hot[len(lat_hot) // 2], 3),
                "p90_hot_s": round(lat_hot[int(len(lat_hot) * 0.9)], 3),
                "n_queries": len(jobs),
                "bench_docs": n_docs,
                "cores": cores,
            }
        )
        return res

    def timed_build(dirpath, name, **kw):
        reps = 1 if scaling_mode else repeats
        best_idx, vals = None, []
        for _ in range(reps):
            shutil.rmtree(dirpath, ignore_errors=True)
            t0 = time.time()
            best_idx = build_index(spark, corpus, dirpath, **kw)
            vals.append(round(time.time() - t0, 3))
        raw_builds[name] = vals
        queries[name] = min(vals)
        return best_idx

    index = timed_build(
        idx_dir, "index_build",
        num_buckets=16, salt_threshold=20000, num_salts=8,
    )
    build_s = queries["index_build"]
    res["docs_per_sec"] = round(n_docs / build_s, 1)
    res["raw_builds"] = raw_builds

    if scaling_mode:
        # scaling-proxy mode: the efficiency metric is docs/sec only
        corpus.unpersist()
        spark.stop()
        res.update(
            {
                "metric": "index build docs/sec (scaling mode)",
                "value": round(build_s, 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "bench_docs": n_docs,
                "cores": cores,
            }
        )
        return res

    # --- BM25 query latency over the built index (median of 3) ---
    for name, qtext, k, mode in QUERY_SET:
        times = []
        for _ in range(3):
            t = time.time()
            bm25_topk(index, qtext, k=k, mode=mode).collect()
            times.append(time.time() - t)
        queries[name] = round(sorted(times)[1], 3)
    # block-max pruned path on the pruning-relevant shapes
    for name, qtext, k, mode in QUERY_SET:
        if name not in WAND_SET:
            continue
        times = []
        for _ in range(3):
            t = time.time()
            bm25_topk_wand(index, qtext, k=k, mode=mode).collect()
            times.append(time.time() - t)
        queries[f"{name}_wand"] = round(sorted(times)[1], 3)

    # positions build + indexed phrase query (round-2: phrase without a
    # corpus re-tokenize); positions are an optional index component so
    # their build cost is reported separately from index_build
    from solr_spark.query.positions import phrase_docids
    from solr_spark.operators.phrase import phrase_match

    pos_dir = f"{base}/solr_spark_bench/index_pos_{cores}"
    pos_index = timed_build(
        pos_dir, "positions_build",
        num_buckets=16, salt_threshold=20000,
        num_salts=8, build_blocks=False, build_positions=True,
    )
    # the realistic deployment shape: ONE build producing postings +
    # blocks + positions (what the gate index and a production user run;
    # index_build + positions_build above double-pay tokenize/invert to
    # stay comparable with earlier rounds)
    full_dir = f"{base}/solr_spark_bench/index_full_{cores}"
    timed_build(
        full_dir, "combined_build",
        num_buckets=16, salt_threshold=20000,
        num_salts=8, build_blocks=True, build_positions=True,
    )
    shutil.rmtree(full_dir, ignore_errors=True)

    # best-of protocol for the single-shot ops (round-5): a cold first
    # run pays parquet page-cache misses + JIT/python-worker warmup
    # that r-over-r comparisons then misread as regressions (the r5
    # first run measured dedup_lsh at 39 s cold vs 4.9 s on the third
    # same-session run, zero code change). Builds already report
    # best-of-N with raws kept; do the same here.
    raw_ops: dict[str, list[float]] = {}

    def timed_op(name: str, fn, reps: int = 2) -> None:
        vals = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            vals.append(round(time.time() - t0, 3))
        raw_ops[name] = vals
        queries[name] = min(vals)

    timed_op(
        "q_phrase_indexed",
        lambda: phrase_docids(pos_index, ["json", "parser"], slop=0).count(),
    )
    # inline comparison point: derive positions from raw text at query time
    corpus_ids = pos_index.docs().select("docid", "repo", "path", "commit")
    timed_op(
        "q_phrase_inline",
        lambda: phrase_match(
            corpus.join(corpus_ids, ["repo", "path", "commit"]),
            "json parser", id_col="docid", text_col="content",
        ).count(),
    )

    # --- operator suite over harness tables ---
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed_op("facet_lang", lambda: terms_facet(docs, "lang", limit=10).collect())
    timed_op(
        "dedup_lsh",
        lambda: lsh_candidate_pairs(
            doc_tokens(docs, id_col="doc_id", text_col="text"), ordered=False
        ).count(),
    )
    qv = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    timed_op("ann_cosine", lambda: cosine_topk(emb, qv, k=10).collect())
    from solr_spark.operators.dedup import dup_span_stats

    doc_toks = doc_tokens(docs, id_col="doc_id", text_col="text")
    timed_op("dedup_spans", lambda: dup_span_stats(doc_toks, n=8).count())
    res["raw_ops"] = raw_ops

    # --- sf1 block (round-5): the 10x-corpus comparison floor ---
    # The 200k-doc suite is fixed-overhead-dominated (most queries <1 s);
    # a 2M-doc single combined build + the same query suite gives the
    # scale-honest numbers BENCH/BASELINE.md tracks from round 5 on.
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") == "1":
        sf1_docs = int(os.environ.get("SPARK_GRAFT_BENCH_SF1_DOCS", "2000000"))
        sf1: dict = {"bench_docs": sf1_docs}
        big = synthesize_corpus(spark, sf1_docs, seed=42).persist()
        big.count()  # generation outside the timed window
        sf1["contention"] = _contention_markers()
        d1 = f"{base}/solr_spark_bench/index_sf1_{cores}"
        shutil.rmtree(d1, ignore_errors=True)
        t0 = time.time()
        big_idx = build_index(
            spark, big, d1,
            num_buckets=32, salt_threshold=20000, num_salts=8,
            build_blocks=True, build_positions=True,
        )
        sf1["combined_build_s"] = round(time.time() - t0, 3)
        sf1["docs_per_sec"] = round(sf1_docs / sf1["combined_build_s"], 1)
        q1: dict = {}
        for name, qtext, k, qmode in QUERY_SET:
            times = []
            for _ in range(3):
                t = time.time()
                bm25_topk(big_idx, qtext, k=k, mode=qmode).collect()
                times.append(time.time() - t)
            q1[name] = round(sorted(times)[1], 3)
        for name, qtext, k, qmode in QUERY_SET:
            if name not in WAND_SET:
                continue
            times = []
            for _ in range(3):
                t = time.time()
                bm25_topk_wand(big_idx, qtext, k=k, mode=qmode).collect()
                times.append(time.time() - t)
            q1[f"{name}_wand"] = round(sorted(times)[1], 3)
        ph = []
        for _ in range(2):
            t = time.time()
            phrase_docids(big_idx, ["json", "parser"], slop=0).count()
            ph.append(round(time.time() - t, 3))
        q1["q_phrase_indexed"] = min(ph)
        sf1["queries"] = q1
        big.unpersist()
        shutil.rmtree(d1, ignore_errors=True)
        res["sf1"] = sf1

    corpus.unpersist()
    spark.stop()
    res.update(
        {
            "metric": "index_build+query suite wall seconds (local[%d])" % cores,
            "value": round(sum(queries.values()), 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf_dir.rstrip("/").split("sf")[-1],
            "bench_docs": n_docs,
            "cores": cores,
        }
    )
    return res


if __name__ == "__main__":
    print(json.dumps(run()))
