"""Inverted-index builder: corpus -> docs / postings / blocks / term_stats.

Spark-first re-expression of the reference's indexing path
(solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:233
DirectUpdateHandler2.addDoc -> analyzer -> IndexWriter inversion):

    corpus --tokenize (JVM regexp)--> docs(docid, doclen, dl_q, sha256)
           --explode + groupBy------> postings(term, docid, tf, dl_q)
           --groupBy(term)----------> term_stats(term, df, cttf)
           --sort + mapInPandas-----> blocks (delta+varint, block-max)

Scale design points:
- docid assignment = global sort rank over the unique key
  (repo, path, commit), computed with a range-partitioned sort + partition
  offset scan (no single-partition window, no driver collect of data).
- postings are hash-bucketed by crc32(term) % num_buckets and written
  partitioned by bucket -> query-time partition pruning (the analogue of
  the reference's hash doc routing,
  solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java:89).
- head terms (df > salt_threshold) are salted into num_salts sub-lists
  (salt = docid % num_salts) so no single task encodes/scans a whole
  head-term posting list (precedent: the "big terms" special case in
  solr/core/src/java/org/apache/solr/search/facet/UnInvertedField.java:109).
- resumable: with num_chunks > 1 the tokenize+invert phase runs per
  chunk, each committing a staged parquet + a JSON manifest; a restart
  skips finished chunks (analogue of tlog replay,
  solr/core/src/java/org/apache/solr/update/UpdateLog.java:374; the final
  atomic publish mirrors the hard commit,
  solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:103-158).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from solr_spark.analysis.analyzer import (
    stop_filter_col,
    synonym_filter_col,
    synonym_graph_col,
    tokens_catenate_col,
    tokens_col,
)
from solr_spark.analysis.porter import porter_stem_col
from solr_spark.functions.smallfloat import quantize_col
from solr_spark.index.blocks import BLOCKS_SCHEMA, make_block_encoder

DOC_KEY = ("repo", "path", "commit")

#: per-term skip-list entries kept in term_stats (bounds the largest
#: query-time k the metadata seed can serve: k <= CAP * BLOCK_SIZE)
SKIPLIST_CAP = 64


FILES_PER_BUCKET = 4

#: deletes-sidecar rows above which the liveDocs anti-join stops
#: broadcasting and degrades to a shuffle anti-join (a pending delete
#: set is unbounded — a delete-by-query can match half the corpus — so
#: the broadcast must be gated on a verified size, not assumed small)
DELETES_BROADCAST_CAP = 2_000_000

#: driver-side term-dictionary LRU capacity (entries are ~100-byte stat
#: dicts incl. negative lookups, so 64k entries is a few MB — the same
#: order as Lucene's TermInfosReader term-info cache / Solr's
#: documentCache sizing). Hot query terms repeat heavily (Zipf), so a
#: warm LRU removes the per-query dictionary-seek Spark job entirely.
DICT_LRU_CAP = 65_536


def _write_bucketed(
    df: DataFrame, path: str, num_buckets: int, sort_cols: tuple[str, ...]
) -> None:
    """Write a tid-keyed index table partitioned by bucket with a SMALL,
    tid-sorted file set: per-query-job cost is dominated by files opened
    (round-2 measurement: a 512-file layout cost ~1 s/job in listing +
    footers), and per-file tid-sorting gives tight row-group min/max so
    the `tid IN (...)` pushdown skips row groups. A tid-derived salt
    keeps write parallelism at num_buckets*FILES_PER_BUCKET while every
    tid's rows land in ONE file of its bucket. Scaling knob at cluster
    size = num_buckets.

    The bucket is a pure function of tid, so the exchange keys on the
    DERIVED expressions and the column is projected back only after the
    shuffle — 4 bytes/row that never ride the wire."""
    bexpr = tid_bucket_col("tid", num_buckets)
    salt = F.pmod(F.xxhash64(F.col("tid"), F.lit(7)), F.lit(FILES_PER_BUCKET))
    (
        df.drop("bucket")
        .repartition(num_buckets * FILES_PER_BUCKET, bexpr, salt)
        .withColumn("bucket", bexpr)
        .sortWithinPartitions(*[F.col(c) for c in sort_cols])
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def bucket_of_col(term: Column | str, num_buckets: int) -> Column:
    """crc32-based term bucket — same value computable from Python
    (zlib.crc32) for driver-side partition pruning at query time. Used
    for the term_stats dictionary, which is looked up BY STRING."""
    c = F.col(term) if isinstance(term, str) else term
    return F.pmod(F.crc32(F.encode(c, "UTF-8")), F.lit(num_buckets)).cast("int")


def bucket_of_py(term: str, num_buckets: int) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % num_buckets


def tid_bucket_col(tid: Column | str, num_buckets: int) -> Column:
    """Postings/blocks are keyed by tid = xxhash64(term) (8 bytes instead
    of a repeated string in every shuffle/scan row); their partition
    bucket derives from the tid so the driver can prune after resolving
    term -> tid through term_stats. The (crc32-bucket, xxhash64) composite
    key space makes term collisions negligible (~V^2 / (B * 2^64))."""
    c = F.col(tid) if isinstance(tid, str) else tid
    return F.pmod(c, F.lit(num_buckets)).cast("int")


def tid_bucket_py(tid: int, num_buckets: int) -> int:
    return tid % num_buckets  # python % is non-negative for positive modulus


def assign_docids(
    df: DataFrame,
    keys: tuple[str, ...] = DOC_KEY,
    _cleanup: list | None = None,
) -> DataFrame:
    """Add a deterministic dense `docid` = global sort rank over `keys`.

    Scale-aware two-phase rank over the NARROW key projection only (the
    wide `content` column never enters the rank shuffle or the Arrow
    round-trip): range-partition + sort the keys, persist so the counting
    job and the id job see identical partition boundaries, collect one
    count per partition, add offset + local index via Arrow-batched
    mapInPandas, then hash-join the ids back onto the full rows. No
    single-partition bottleneck anywhere — survives a 1000-executor
    scale-up. Keys must be unique (enforced upstream) so the rank is
    run-independent even though range boundaries are sampled.

    The key sort MUST stay persisted until the caller has materialized
    every consumer of the returned frame (the counting job and the id
    job must see identical partition boundaries). Pass `_cleanup` to
    receive the persisted handle and unpersist it yourself once done —
    build_index does this at publish time; without it, one cached RDD
    per call leaks for the session's lifetime (round-2 VERDICT item).
    """
    key_cols = [F.col(k) for k in keys]
    sorted_keys = (
        df.select(*keys)
        .repartitionByRange(*key_cols)
        .sortWithinPartitions(*key_cols)
    ).persist()
    if _cleanup is not None:
        _cleanup.append(sorted_keys)
    counts = (
        sorted_keys.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    cnt = {r["pid"]: r["count"] for r in counts}
    max_pid = max(cnt, default=-1)
    offsets = {}
    acc = 0
    for pid in range(max_pid + 1):
        offsets[pid] = acc
        acc += cnt.get(pid, 0)

    # Round-6 (guide §4.1): the id pass is pure JVM now. The previous
    # mapInPandas shipped 14 MB of keys through 256 Python workers and
    # the stage profile showed 1,184 executor-run-s against 44.6 cpu-s —
    # tasks were blocked on Python worker spin-up, not computing.
    # monotonically_increasing_id() over the SAME persisted sorted
    # partitions is (partition_id << 33) | local_row_index, so the
    # global rank is offsets[pid] + local_index with a literal offsets
    # array — identical docids (both forms number the persisted
    # partition-local row order), zero Python.
    off_arr = F.array(
        *[F.lit(int(offsets.get(p, 0))) for p in range(max_pid + 1)]
    ) if max_pid >= 0 else F.array(F.lit(0))
    local_idx = F.monotonically_increasing_id().bitwiseAND(
        F.lit((1 << 33) - 1)
    )
    ids = sorted_keys.select(
        *keys,
        (
            F.element_at(off_arr, F.spark_partition_id() + F.lit(1))
            + local_idx
        ).alias("docid"),
    )
    # BOTH join sides are corpus-sized, so broadcasting is never
    # correct here — but Catalyst can wildly UNDER-estimate either side
    # (a spark.range-derived corpus stats at 8 bytes/row; the real rows
    # carry kilobyte content strings) and pick a broadcast join that
    # collects the whole corpus through the driver (observed: 1M docs
    # -> ~1 GB of task results -> spark.driver.maxResultSize kill).
    # The shuffle_hash hint pins a shuffled hash join: each task builds
    # only its partition's id map, nothing crosses the driver.
    # (Round-6 note: a measured-count-gated BROADCAST of the ids side —
    # leaving the corpus un-shuffled — was tried and REJECTED by A/B:
    # the id exchange doubles as the re-partitioning that gives the
    # downstream tokenize/invert stages `spark.sql.shuffle.partitions`
    # balanced partitions; without it they inherit the corpus's coarse
    # scan partitioning and the invert's partial-agg tables grow past
    # cache residency — 200k-doc index_build 28.1 s -> 35.7 s.)
    return df.join(ids.hint("shuffle_hash"), list(keys))


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self):
        return os.path.join(self.root, "docs")

    @property
    def postings(self):
        return os.path.join(self.root, "postings")

    @property
    def blocks(self):
        return os.path.join(self.root, "blocks")

    @property
    def term_stats(self):
        return os.path.join(self.root, "term_stats")

    @property
    def positions(self):
        return os.path.join(self.root, "positions")

    @property
    def term_dict_stage(self):
        return os.path.join(self.root, "stage", "term_dict")

    @property
    def meta(self):
        return os.path.join(self.root, "meta.json")

    @property
    def stage(self):
        return os.path.join(self.root, "stage")

    @property
    def checkpoints(self):
        return os.path.join(self.root, "_checkpoints")

    @property
    def deletes(self):
        # a snapshot-committed sidecar table of deleted docids — the
        # liveDocs analogue (sources/snapshots.py gives the atomic
        # append-commit the tlog delete path needs)
        return os.path.join(self.root, "deletes")


@dataclass
class Index:
    """Handle over a built index directory."""

    spark: SparkSession
    paths: IndexPaths
    meta: dict = field(default_factory=dict)
    _ts_cache: object = field(default=None, init=False, repr=False)
    #: driver-side caches, all tied to this handle's snapshot view —
    #: Solr's caches hang off the SolrIndexSearcher and a commit opens
    #: a new searcher with fresh caches (SolrIndexSearcher.java:123-124
    #: filterCache/queryResultCache); here maintenance ops call
    #: invalidate_caches() on the handle, the openSearcher analogue.
    _df_cache: dict = field(default_factory=dict, init=False, repr=False)
    _dict_lru: object = field(default=None, init=False, repr=False)
    _qr_lru: object = field(default=None, init=False, repr=False)
    _del_state: object = field(default=None, init=False, repr=False)
    _gen: int = field(default=0, init=False, repr=False)
    _pinned: list = field(default_factory=list, init=False, repr=False)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "Index":
        paths = IndexPaths(root)
        with open(paths.meta) as f:
            meta = json.load(f)
        return cls(spark, paths, meta)

    def _read(self, path: str) -> DataFrame:
        # memoized table handles: spark.read.parquet re-lists the dir +
        # reads footers on EVERY call, which the concurrent-pool study
        # measured as part of the ~0.3 s/query driver serialization.
        # The directory is immutable between maintenance ops, which
        # invalidate this cache (the new-searcher analogue).
        df = self._df_cache.get(path)
        if df is None:
            df = self.spark.read.parquet(path)
            self._df_cache[path] = df
        return df

    def docs(self) -> DataFrame:
        return self._read(self.paths.docs)

    def postings(self) -> DataFrame:
        return self._read(self.paths.postings)

    def blocks(self) -> DataFrame:
        return self._read(self.paths.blocks)

    def positions(self) -> DataFrame:
        return self._read(self.paths.positions)

    def pin_memory(self, components: tuple = ("postings", "docs")) -> "Index":
        """Serving mode: persist the hot table frames in executor
        memory and materialize them now, so every query scans Spark's
        in-memory columnar cache instead of re-decoding parquet. The
        analogue of Solr serving from a warm searcher + OS page cache —
        a search SERVER holds its index hot; batch jobs skip this.
        Maintenance ops unpin via invalidate_caches() (commit == new
        cold searcher). Memory cost is the decoded table size — on a
        real cluster that is spread over executors; size the cluster or
        pin `("postings",)` only."""
        for comp in components:
            path = getattr(self.paths, comp)
            df = self._read(path)
            if df.storageLevel.useMemory:
                continue
            df = df.persist()
            df.count()  # materialize outside the first query's latency
            self._df_cache[path] = df
            self._pinned.append(df)
        return self

    def invalidate_caches(self) -> None:
        """Drop every driver-side cache on this handle: table handles,
        the term-dictionary LRU, the query-result cache, the deletes
        snapshot, pinned serving frames, and the persisted term_stats
        frame. Maintenance ops (delete/expunge/merge/add/upsert) call
        this — the analogue of a Solr commit opening a new searcher
        with cold caches."""
        for df in self._pinned:
            try:
                df.unpersist()
            except Exception:
                pass
        self._pinned.clear()
        self._df_cache.clear()
        self._dict_lru = None
        self._qr_lru = None
        self._del_state = None
        self._gen += 1
        if self._ts_cache is not None:
            try:
                self._ts_cache.unpersist()
            except Exception:
                pass
            self._ts_cache = None

    def _invalidate_deletes(self) -> None:
        """Narrow invalidation after a sidecar append: the dictionary
        and table handles stay valid (stats are build-time, files are
        untouched) but the liveDocs view and any cached query RESULTS
        are stale."""
        self._del_state = None
        self._qr_lru = None
        self._gen += 1

    def term_stats(self) -> DataFrame:
        # the dictionary is hot (every query starts with a term->tid
        # seek) and small relative to postings — cache it; the analogue
        # of Solr's in-memory term dictionary / filterCache role
        if self._ts_cache is None:
            self._ts_cache = self.spark.read.parquet(self.paths.term_stats).persist()
        return self._ts_cache

    def has_deletes(self) -> bool:
        """Cheap driver-side check (one small file read) — the no-delete
        fast path adds ZERO plan nodes to queries."""
        from solr_spark.sources.snapshots import current_version

        return current_version(self.paths.deletes) > 0

    def deleted_ids(self) -> DataFrame:
        """Distinct deleted docids (the liveDocs complement). Sidecar-
        sized: deletes accumulate between expunges, never corpus-sized
        in steady state (Lucene's deleted-docs ratio triggers merges the
        same way expunge_deletes is the operator's lever here).

        Cached per sidecar VERSION: the manifest version is a cheap
        local read, so cross-handle deletes are still seen, while the
        frame + size estimate build once per snapshot instead of once
        per query."""
        return self._deletes_snapshot()[1]

    def _deletes_snapshot(self):
        from solr_spark.sources.snapshots import current_version
        from solr_spark.sources.snapshots import read as snap_read
        from solr_spark.sources.snapshots import total_rows

        ver = current_version(self.paths.deletes)
        if self._del_state is not None and self._del_state[0] == ver:
            return self._del_state
        ids = (
            snap_read(self.spark, self.paths.deletes)
            .select("docid")
            .distinct()
        )
        est = total_rows(self.paths.deletes) if ver > 0 else 0
        self._del_state = (ver, ids, est)
        return self._del_state

    def deleted_rows_estimate(self) -> int | None:
        """Upper bound on the deletes sidecar size from manifest
        metadata alone (pre-dedup sum of per-batch counts; no Spark
        job). None when an old manifest lacks a count."""
        if not self.has_deletes():
            return 0
        return self._deletes_snapshot()[2]

    def minus_deleted(self, df: DataFrame) -> DataFrame:
        """`df` anti-joined against the deletes sidecar. Broadcasts the
        sidecar while it is verifiably small (the manifest row counts
        bound it) and silently degrades to a shuffle anti-join above
        DELETES_BROADCAST_CAP or when the size is unknown — an
        unbounded pending-delete set must never become a forced
        driver/executor broadcast (round-4 scale finding)."""
        if not self.has_deletes():
            return df
        dele = self.deleted_ids()
        est = self.deleted_rows_estimate()
        if est is not None and est <= DELETES_BROADCAST_CAP:
            dele = F.broadcast(dele)
        return df.join(dele, "docid", "left_anti")

    def postings_live(self) -> DataFrame:
        """Postings minus deleted docs. The deletes side broadcasts
        while sidecar-sized (see `minus_deleted`); stats
        (n_docs/avgdl/df) deliberately keep their build-time values —
        exactly Lucene's behavior with uncommitted deletes
        (docFreq/maxDoc count deleted docs until segments merge), which
        also keeps block-max upper bounds valid."""
        return self.minus_deleted(self.postings())

    def docs_live(self) -> DataFrame:
        return self.minus_deleted(self.docs())

    def buckets_for(self, terms: list[str]) -> list[int]:
        b = self.meta["num_buckets"]
        return sorted({bucket_of_py(t, b) for t in terms})

    def pbuckets_for(self, tids: list[int]) -> list[int]:
        b = self.meta["num_buckets"]
        return sorted({tid_bucket_py(t, b) for t in tids})

    def analyze(self, text: str) -> list[str]:
        """Analyze text with THIS index's chain: the base chain plus
        any stopword/synonym config stored at build time (meta keys
        `stopwords` / `synonyms`). Query-side code must analyze through
        the index handle so both sides agree — Solr pairs index/query
        analyzers in the same fieldType for the same reason."""
        from solr_spark.analysis.analyzer import (
            stop_filter_py, synonym_filter_py, synonym_graph_py, tokenize_py,
        )
        from solr_spark.analysis.porter import porter_stem_py

        # QUERY side deliberately never catenates even when the index
        # side did (meta.analyzer.catenate) — the reference's
        # text_en_splitting pairs catenateWords=1 at index time with
        # catenateWords=0 at query time (managed-schema.xml:390-423);
        # the catenated index tokens are what let a one-word query
        # ("wifi") match a delimited document ("Wi-Fi").
        az = self.meta.get("analyzer") or {}
        if az.get("delimited_payloads"):
            # payload fieldType = whitespace tokenizer; query terms are
            # bare (any stray delimiter+payload suffix is stripped so
            # index/query analysis stay paired)
            d = az["delimited_payloads"]
            return [
                t.split(d, 1)[0].lower() for t in text.split() if t
            ]
        if az.get("ascii_fold"):
            from solr_spark.analysis.analyzer import ascii_fold_str_py

            text = ascii_fold_str_py(text)
        toks = tokenize_py(text)
        sw = self.meta.get("stopwords")
        if sw:
            toks = stop_filter_py(toks, sw)
        syn = self.meta.get("synonyms")
        if syn:
            toks = synonym_filter_py(toks, syn)
        if az.get("synonym_graph"):
            toks = synonym_graph_py(toks, az["synonym_graph"])
        if az.get("stem") == "porter":
            toks = [porter_stem_py(t) for t in toks]
        if az.get("length"):
            from solr_spark.analysis.analyzer import length_filter_py

            lo, hi = az["length"]
            toks = length_filter_py(toks, lo, hi)
        # edge_ngram / shingle are INDEX-side stages (suggester shape):
        # the query side matches its literal tokens against the grams,
        # mirroring the catenate asymmetry above
        return toks

    def build_report(self) -> dict:
        """Doc/term/postings metrics plus per-chunk lineage — the
        'resumable from checkpoint with per-partition lineage +
        metrics' reporting surface. Combines the meta rollups with
        every committed chunk manifest (_checkpoints/chunk_*.json:
        per-chunk docs_out/postings_out/elapsed_ms) and the dictionary/
        postings row counts (parquet count() is a footer read, not a
        data pass)."""
        import glob as _glob

        chunks = []
        for p in sorted(
            _glob.glob(os.path.join(self.paths.checkpoints, "chunk_*.json"))
        ):
            with open(p) as f:
                chunks.append(json.load(f))
        return {
            "n_docs": self.meta.get("n_docs"),
            "avgdl": self.meta.get("avgdl"),
            "n_terms": self.term_stats().count(),
            "n_postings": self.postings().count(),
            "num_chunks": self.meta.get("num_chunks"),
            "build_seconds": self.meta.get("build_seconds"),
            "has_blocks": self.meta.get("has_blocks"),
            "has_positions": self.meta.get("has_positions"),
            "chunks": chunks,
        }

    def term_dictionary(self, field: str | None = None) -> DataFrame:
        """The term_stats frame restricted to ONE field's dictionary.

        On a single-field index this is term_stats itself. On a
        multi-field index term_stats holds one row per (field, term), so
        any term-keyed consumer (suggesters, MLT term selection) must
        pick a field first or it reads duplicate terms with
        arbitrary-field df/tid (round-2 ADVICE). Defaults to the first
        indexed field, matching the query engine's qf default."""
        ts = self.term_stats()
        flds = self.meta.get("fields")
        if not flds:
            return ts
        return ts.where(F.col("field") == (field or flds[0]))

    def term_stats_for(
        self, terms: list[str], field: str | None = None
    ) -> dict[str, dict]:
        """Driver-side lookup {term: {tid, df, cttf}} with bucket pruning
        — the term->tid resolution step every query starts with (the
        analogue of the term-dictionary seek). On a multi-field index the
        lookup is scoped to `field` (default: first indexed field) so a
        term never resolves to an arbitrary field's tid/df."""
        if not terms:
            return {}
        flds = self.meta.get("fields")
        if flds:
            fld = field or flds[0]
            return {
                t: s
                for (_, t), s in self.term_stats_fielded(
                    [(fld, t) for t in terms]
                ).items()
            }
        out, misses = {}, []
        for t in terms:
            hit, s = self._dict_get((None, t))
            if hit:
                if s is not None:
                    out[t] = s
            else:
                misses.append(t)
        if not misses:
            return out
        rows = (
            self.term_stats()
            .where(F.col("bucket").isin(self.buckets_for(misses)))
            .where(F.col("term").isin(misses))
            .collect()
        )
        found = {}
        for r in rows:
            d = {"tid": r["tid"], "df": r["df"], "cttf": r["cttf"]}
            if "mtp" in r.__fields__:
                d["mtp"] = r["mtp"]
                d["skips"] = (
                    [(s["m"], s["nd"]) for s in r["skips"]]
                    if r["skips"] is not None
                    else None
                )
            found[r["term"]] = d
        for t in set(misses):
            d = found.get(t)
            self._dict_put((None, t), d)  # negatives cached too
            if d is not None:
                out[t] = d
        return out

    def _dict_get(self, key) -> tuple[bool, dict | None]:
        """(hit, stats-or-None) from the term-dictionary LRU. A cached
        None is a NEGATIVE entry (term absent from the index) — absent
        terms repeat across queries just like present ones."""
        from collections import OrderedDict

        if self._dict_lru is None:
            self._dict_lru = OrderedDict()
        lru = self._dict_lru
        if key in lru:
            lru.move_to_end(key)
            return True, lru[key]
        return False, None

    def _dict_put(self, key, val) -> None:
        lru = self._dict_lru
        lru[key] = val
        lru.move_to_end(key)
        while len(lru) > DICT_LRU_CAP:
            lru.popitem(last=False)

    def term_stats_fielded(
        self, pairs: list[tuple[str, str]]
    ) -> dict[tuple[str, str], dict]:
        """{(field, term): {tid, df, cttf}} on a multi-field index —
        the per-field dictionary seek (one scan covers every qf field;
        bucket pruning is by term, the field filter rides the same scan)."""
        if not pairs:
            return {}
        out, miss_pairs = {}, []
        for key in dict.fromkeys(pairs):  # de-dup, keep order
            hit, s = self._dict_get(key)
            if hit:
                if s is not None:
                    out[key] = s
            else:
                miss_pairs.append(key)
        if not miss_pairs:
            return out
        terms = sorted({t for _, t in miss_pairs})
        flds = sorted({f for f, _ in miss_pairs})
        want = set(miss_pairs)
        rows = (
            self.term_stats()
            .where(F.col("bucket").isin(self.buckets_for(terms)))
            .where(F.col("term").isin(terms))
            .where(F.col("field").isin(flds))
            .collect()
        )
        found = {}
        for r in rows:
            if (r["field"], r["term"]) not in want:
                continue
            d = {"tid": r["tid"], "df": r["df"], "cttf": r["cttf"]}
            if "mtp" in r.__fields__:
                d["mtp"] = r["mtp"]
                d["skips"] = (
                    [(s["m"], s["nd"]) for s in r["skips"]]
                    if r["skips"] is not None
                    else None
                )
            found[(r["field"], r["term"])] = d
        for key in miss_pairs:
            d = found.get(key)
            self._dict_put(key, d)
            if d is not None:
                out[key] = d
        return out


def _analyze_docs(
    corpus: DataFrame,
    fields: list[str] | None = None,
    stopwords: list[str] | None = None,
    synonyms: dict[str, str] | None = None,
    store_content: bool = False,
    analyzer: dict | None = None,
) -> DataFrame:
    """corpus (+docid) -> docs with tokens materialized once.

    Multi-field mode (`fields`): one token array per field plus per-field
    doclen/dl_q — each field is its own inverted index with its own
    length norms, the Solr per-field analysis model
    (solr/core/src/java/org/apache/solr/schema/IndexSchema.java fields +
    FieldType analyzers; per-field norms in the Lucene similarity).
    """
    # Round-4 stages live in the `analyzer` config dict: `catenate`
    # (index-side WDGF catenation — query side never catenates, the
    # reference's text_en_splitting index/query asymmetry,
    # managed-schema.xml:390-423), `synonym_graph` (multi-token
    # expansions), `stem` ("porter"). Stage order mirrors Solr's
    # text_en chain: tokenize -> stop -> synonyms -> stem.
    az = analyzer or {}
    if az.get("delimited_payloads") and fields:
        raise ValueError(
            "delimited_payloads supports single-field indexes only"
        )

    def chain(col):
        src = F.col(col) if isinstance(col, str) else col
        if az.get("pre_analyzed"):
            # PreAnalyzedUpdateProcessor / PreAnalyzedField
            # (solr/core/src/java/org/apache/solr/update/processor/
            # PreAnalyzedUpdateProcessorFactory.java): the column already
            # HOLDS the token stream (array<string>) — skip the chain
            # entirely; the external analyzer owns the tokens
            return src
        if az.get("delimited_payloads"):
            # DelimitedPayloadTokenFilter fieldType (Solr's payloads
            # fieldType: WhitespaceTokenizer + delimitedPayload,
            # managed-schema delimitedPayload float encoder): tokens are
            # `term<delim>payload`; the TERM stream strips the payload.
            # No other chain stages apply — mirrors the reference
            # fieldType, which pairs the filter with the whitespace
            # tokenizer only. The aligned float payloads are extracted
            # separately (see `_payload_chain`).
            d = az["delimited_payloads"]
            raw = F.filter(
                F.split(F.trim(src), r"\s+"), lambda x: x != F.lit("")
            )
            return F.transform(
                raw, lambda x: F.lower(F.substring_index(x, d, 1))
            )
        if az.get("ascii_fold"):
            # char-filter slot: fold BEFORE tokenizing, or accents split
            # tokens on the ASCII charset (see ascii_fold_str_col)
            from solr_spark.analysis.analyzer import ascii_fold_str_col

            src = ascii_fold_str_col(src)
        t = tokens_catenate_col(src) if az.get("catenate") else tokens_col(src)
        if stopwords:
            t = stop_filter_col(t, stopwords)
        if synonyms:
            t = synonym_filter_col(t, synonyms)
        if az.get("synonym_graph"):
            t = synonym_graph_col(t, az["synonym_graph"])
        if az.get("stem") == "porter":
            t = porter_stem_col(t)
        if az.get("length"):
            from solr_spark.analysis.analyzer import length_filter_col

            lo, hi = az["length"]
            t = length_filter_col(t, lo, hi)
        # shape-changing suggester stages last (index-side only: the
        # query analyzes to plain tokens that match the grams/shingles)
        if az.get("edge_ngram"):
            from solr_spark.analysis.analyzer import edge_ngram_col

            g0, g1 = az["edge_ngram"]
            t = edge_ngram_col(t, g0, g1)
        if az.get("shingle"):
            from solr_spark.analysis.analyzer import shingle_col

            t = shingle_col(t, int(az["shingle"]))
        return t

    if not fields:
        # Round-6 note: swapping this JVM regex chain for the vectorized
        # Arrow tokenizer (analyzer.tokenize_arrow_batch, a measured 2x
        # win for the inline phrase operator) was A/B'd here and
        # REJECTED: in the build the tokenize overlaps the docs write +
        # sha256 + invert across all cores, so the ~97 executor-CPU-s it
        # saves (632->669 run-s, 574->477 cpu-s, interleaved same-window
        # pairs) comes back as Python-boundary wait — wall 29.7 s vs
        # 30.8 s, a wash — while making the analyze stage opaque to
        # Catalyst (guide §4.2 column-pruning caveat).
        toks = chain("content")
        # every non-content column is a STORED field (the docs table is
        # the document store): filters — including date-math ranges —
        # and payload fetch read them back without touching the corpus;
        # store_content=True additionally stores the text itself (the
        # stored="true" text field Solr highlighting requires)
        excl = ("docid",) if store_content else ("docid", "content")
        passthrough = [c for c in corpus.columns if c not in excl]
        # pre-analyzed content is an array: the per-row invariant hashes
        # the canonical joined token stream instead of the raw string
        sha_content = (
            F.sha2(F.array_join(F.col("content"), "\x1f"), 256)
            if az.get("pre_analyzed")
            else F.sha2(F.col("content"), 256)
        )
        extra = []
        if az.get("delimited_payloads"):
            # position-aligned float payloads (NULL where a token
            # carries none) — rides next to _tokens into the positions
            # layout; the escape handles regex-special delimiters
            d = az["delimited_payloads"]
            import re as _re

            rx = _re.escape(d)
            raw = F.filter(
                F.split(F.trim(F.col("content")), r"\s+"),
                lambda x: x != F.lit(""),
            )
            extra.append(
                F.transform(
                    raw,
                    # try_element_at: a token without a delimiter has no
                    # payload -> NULL (element_at raises on index 2 of a
                    # 1-element array under Spark 4 ANSI mode)
                    lambda x: F.try_element_at(
                        F.split(x, rx, 2), F.lit(2)
                    ).cast("float"),
                ).alias("_payloads")
            )
        return corpus.select(
            "docid",
            *passthrough,
            sha_content.alias("sha256"),
            toks.alias("_tokens"),
            *extra,
        ).withColumn("doclen", F.size("_tokens")).withColumn(
            "dl_q", quantize_col("doclen").cast("int")
        )
    passthrough = [
        c
        for c in corpus.columns
        if c != "docid" and (store_content or c not in fields)
    ]
    sha_src = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(f), F.lit("")) for f in fields]
    )
    out = corpus.select(
        "docid",
        *passthrough,
        F.sha2(sha_src, 256).alias("sha256"),
        # per-field chain: analyzer/stopword/synonym config applies to
        # every indexed field (was silently single-field-only before)
        *[chain(f).alias(f"_tokens_{i}") for i in range(len(fields))
          for f in [fields[i]]],
    )
    total = None
    for i in range(len(fields)):
        out = out.withColumn(f"doclen_{i}", F.size(f"_tokens_{i}")).withColumn(
            f"dl_q_{i}", quantize_col(F.col(f"doclen_{i}")).cast("int")
        )
        c = F.col(f"doclen_{i}")
        total = c if total is None else total + c
    return out.withColumn("doclen", total)


def _token_cols(df: DataFrame) -> list[str]:
    # in-flight analysis columns the docs store must not persist (the
    # payloads live in the positions table, positionally aligned)
    return [
        c
        for c in df.columns
        if c.startswith("_tokens") or c == "_payloads"
    ]


def _postings_from_docs(
    docs_tok: DataFrame, fields: list[str] | None = None
) -> DataFrame:
    """(docid, _tokens, dl_q) -> (tid, docid, tf, dl_q).

    The term string is hashed to a 64-bit tid BEFORE the groupBy, so the
    big invert shuffle moves only fixed-width longs (strings survive in
    the small term dictionary only). Partial (map-side) aggregation is
    automatic; dl_q rides in the key (constant per docid) so scoring
    needs no join back to docs.

    Multi-field mode: tid = xxhash64(field, term), so the field lives
    INSIDE the 64-bit key — postings/positions keep the exact single-
    field schema and shuffle width except a 4-byte `fid` ordinal the
    block encoder needs for per-field avgdl (dropped at the parquet
    write); dl_q carries the FIELD's quantized length (per-field norms).
    """
    if not fields:
        return (
            docs_tok.select("docid", "dl_q", F.explode("_tokens").alias("term"))
            .select("docid", "dl_q", F.xxhash64("term").alias("tid"))
            .groupBy("tid", "docid", "dl_q")
            .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        )
    tall = None
    for i, f in enumerate(fields):
        part = docs_tok.select(
            "docid",
            F.col(f"dl_q_{i}").alias("dl_q"),
            F.explode(f"_tokens_{i}").alias("term"),
        ).select(
            "docid",
            "dl_q",
            F.xxhash64(F.lit(f), F.col("term")).alias("tid"),
            F.lit(i).cast("int").alias("fid"),
        )
        tall = part if tall is None else tall.unionByName(part)
    return tall.groupBy("tid", "docid", "dl_q", "fid").agg(
        F.count(F.lit(1)).cast("int").alias("tf")
    )


def _positions_from_docs(
    docs_tok: DataFrame, fields: list[str] | None = None
) -> DataFrame:
    """(docid, _tokens) -> FLAT (tid, docid, pos) rows — 1-based token
    positions. Same tid keying/bucketing as postings so phrase queries
    prune partitions identically. Positions are optional
    (OMIT_TF_POSITIONS analogue) and the table is the index's biggest:
    storing flat rows (file-sorted by tid, docid, pos — delta-friendly)
    lets the build pay ONE layout exchange instead of a groupBy shuffle
    PLUS the layout exchange (the array aggregation moved every position
    byte through an extra shuffle; measured 175 s of a 227 s
    200k-doc build). The per-(tid, docid) arrays phrase matching wants
    are re-assembled at query time on the bucket-PRUNED scan — work
    proportional to the query terms' postings, not the corpus."""
    if not fields:
        if "_payloads" in docs_tok.columns:
            # payload-bearing layout: zip keeps term/payload aligned by
            # position; schema grows ONE nullable float column, the
            # payload-free read path prunes it (PLANS.md payload-prune
            # audit) so non-payload queries pay nothing
            return docs_tok.select(
                "docid",
                F.posexplode(F.arrays_zip("_tokens", "_payloads")).alias(
                    "pos", "z"
                ),
            ).select(
                F.xxhash64(F.col("z._tokens")).alias("tid"),
                "docid",
                (F.col("pos") + F.lit(1)).cast("int").alias("pos"),
                F.col("z._payloads").alias("payload"),
            )
        return docs_tok.select(
            "docid", F.posexplode("_tokens").alias("pos", "term")
        ).select(
            F.xxhash64("term").alias("tid"),
            "docid",
            (F.col("pos") + F.lit(1)).cast("int").alias("pos"),
        )
    tall = None
    for i, f in enumerate(fields):
        part = docs_tok.select(
            "docid", F.posexplode(f"_tokens_{i}").alias("pos", "term")
        ).select(
            F.xxhash64(F.lit(f), F.col("term")).alias("tid"),
            "docid",
            (F.col("pos") + F.lit(1)).cast("int").alias("pos"),
        )
        tall = part if tall is None else tall.unionByName(part)
    return tall


def _term_dict_from_docs(
    docs_tok: DataFrame, fields: list[str] | None = None
) -> DataFrame:
    """(docid, _tokens) -> distinct (term, tid) dictionary (small: one
    row per vocabulary term; map-side partial distinct keeps the shuffle
    tiny relative to postings). Multi-field: (field, term, tid) — the
    dictionary is the ONLY table that stores the field string."""
    if not fields:
        return (
            docs_tok.select(F.explode("_tokens").alias("term"))
            .distinct()
            .select("term", F.xxhash64("term").alias("tid"))
        )
    tall = None
    for i, f in enumerate(fields):
        part = docs_tok.select(
            F.lit(f).alias("field"), F.explode(f"_tokens_{i}").alias("term")
        )
        tall = part if tall is None else tall.unionByName(part)
    return tall.distinct().select(
        "field", "term", F.xxhash64(F.col("field"), F.col("term")).alias("tid")
    )


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    *,
    num_buckets: int = 8,
    salt_threshold: int = 5000,
    num_salts: int = 8,
    num_chunks: int = 1,
    resume: bool = False,
    build_blocks: bool = True,
    build_positions: bool = False,
    block_size: int | None = None,
    keep_stage: bool = False,
    fields: list[str] | None = None,
    stopwords: list[str] | None = None,
    synonyms: dict[str, str] | None = None,
    store_content: bool = False,
    analyzer: dict | None = None,
) -> Index:
    """Build (or resume building) the full index at `out_dir`.

    Thin guard over `_build_index_impl`: every DataFrame the build
    persists is unpersisted on exit (success OR failure) so long-lived
    sessions that build several indexes (the gate does) never accumulate
    cached RDDs (round-2 VERDICT hygiene item)."""
    # Build-scoped shuffle sizing (round-4 scaling study,
    # BENCH/stage_profile_*c_1000000.json): the invert reduce ran at
    # 3x-cores partitions coalesced UP to ~50 MB by AQE's 64 MB
    # advisory, and its per-task hash tables fell out of cache — task
    # CPU time inflated 13x at 32 cores vs 8 (memory stalls bill as CPU
    # time). Small reduce partitions (~8 MB) keep the agg tables
    # cache-resident: measured 1M-doc 32-core build 385 s -> 140 s
    # (2596 -> 7150 docs/s) with shuffle.partitions 96->256 + 8 MB
    # advisory. Scoped here (saved/restored) so query workloads keep
    # the session's latency-oriented sizing.
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    build_parts = max(64, 8 * spark.sparkContext.defaultParallelism)
    conf.set("spark.sql.shuffle.partitions", str(build_parts))
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    persisted: list[DataFrame] = []
    try:
        return _build_index_impl(
            spark,
            corpus,
            out_dir,
            num_buckets=num_buckets,
            salt_threshold=salt_threshold,
            num_salts=num_salts,
            num_chunks=num_chunks,
            resume=resume,
            build_blocks=build_blocks,
            build_positions=build_positions,
            block_size=block_size,
            keep_stage=keep_stage,
            fields=fields,
            stopwords=stopwords,
            synonyms=synonyms,
            store_content=store_content,
            analyzer=analyzer,
            persisted=persisted,
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
        for df in persisted:
            try:
                df.unpersist()
            except Exception:
                pass


def _build_index_impl(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    *,
    num_buckets: int,
    salt_threshold: int,
    num_salts: int,
    num_chunks: int,
    resume: bool,
    build_blocks: bool,
    build_positions: bool,
    block_size: int | None,
    keep_stage: bool,
    fields: list[str] | None,
    stopwords: list[str] | None,
    synonyms: dict[str, str] | None,
    store_content: bool,
    analyzer: dict | None,
    persisted: list,
) -> Index:
    """Build (or resume building) the full index at `out_dir`.

    If the corpus has no `docid` column one is assigned deterministically
    (sort rank over (repo, path, commit)).

    `fields`: index several text columns as independent per-field
    inverted indexes (tid = hash(field, term); per-field norms) — the
    schema-fields model that lets edismax/qf run against the REAL index.
    Block-max metadata is per-field since round 3 (the encoder reads a
    fid ordinal riding the in-flight postings and applies that FIELD's
    avgdl to tf_part), enabling block-max WAND on any field of a
    single-chunk multi-field build; chunked multi-field builds skip
    blocks (the staged postings lose the fid) and serve every field via
    the flat path.
    """
    if fields and num_chunks > 1:
        # multi-field blocks need the in-flight fid ordinal (per-field
        # avgdl in the block-max metadata); the chunked path re-reads
        # postings from their fid-less parquet, so blocks stay off there
        build_blocks = False
    paths = IndexPaths(out_dir)
    if not resume and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(paths.checkpoints, exist_ok=True)

    t0 = time.time()

    # ---- phase 0: deterministic docids ----
    # chunked (resumable) builds stage the id-assigned corpus to parquet so
    # every chunk/retry sees identical docids from stable storage; a
    # single-chunk build skips the staging round-trip (the rank is
    # deterministic within one job graph via the persisted key sort)
    if "docid" not in corpus.columns:
        if num_chunks == 1:
            corpus = assign_docids(corpus, _cleanup=persisted)
        else:
            ids_dir = os.path.join(paths.stage, "corpus_ids")
            man0 = os.path.join(paths.checkpoints, "corpus_ids.json")
            if not (resume and os.path.exists(man0)):
                assign_docids(corpus, _cleanup=persisted).write.mode(
                    "overwrite"
                ).parquet(ids_dir)
                with open(man0, "w") as f:
                    json.dump({"status": "done"}, f)
            corpus = spark.read.parquet(ids_dir)

    # ---- phase 1: per-chunk tokenize + invert (resumable) ----
    # single-chunk fast path: write docs and bucket-partitioned postings
    # straight to their final layout (no stage copy, one shuffle less)
    single = num_chunks == 1
    laid: DataFrame | None = None  # single-chunk: layout-shuffled postings
    doc_agg = None
    for chunk in range(num_chunks):
        manifest = os.path.join(paths.checkpoints, f"chunk_{chunk}.json")
        if resume and os.path.exists(manifest):
            continue
        part = corpus
        if num_chunks > 1:
            part = corpus.where(F.pmod(F.col("docid"), F.lit(num_chunks)) == chunk)
        tick = time.time()
        docs_tok = _analyze_docs(
            part, fields, stopwords, synonyms, store_content, analyzer
        ).persist()
        persisted.append(docs_tok)
        docs_dir = paths.docs if single else os.path.join(paths.stage, f"docs_c{chunk}")
        post_dir = paths.postings if single else os.path.join(paths.stage, f"post_c{chunk}")
        dict_dir = os.path.join(paths.stage, f"dict_c{chunk}")
        docs_tok.drop(*_token_cols(docs_tok)).write.mode("overwrite").parquet(docs_dir)
        # ONE layout shuffle, reused three times: the (bucket, tid-salt)
        # exchange + per-file tid sort below is the SAME distribution the
        # postings write, the df/cttf term aggregation and the block
        # encode all consume, so it runs once and is persisted
        # (MEMORY_AND_DISK) instead of being paid as three separate
        # full-postings shuffles/scans. Layout rationale (unchanged from
        # _write_bucketed): one file per bucket sorted by tid -> small
        # listing/footer cost and tight row-group tid min/max for
        # `tid IN (...)` pushdown (round-2 measurement: a 512-file
        # layout cost ~1 s/job on a 250k-row metadata scan). The bucket
        # and file-salt both derive from tid, so the exchange keys on
        # the expressions and bucket is projected back AFTER the shuffle
        # — the column never rides the wire.
        bexpr = tid_bucket_col("tid", num_buckets)
        fsalt = F.pmod(
            F.xxhash64(F.col("tid"), F.lit(7)), F.lit(FILES_PER_BUCKET)
        )
        # NOTE on a rejected "fusion" (round-3, measured on a 200k-doc /
        # 32-core A/B): deriving postings FROM the laid positions — so a
        # positions-enabled build pays one token-volume exchange instead
        # of running the invert too — LOSES on every variant tried:
        # (a) partition-local run-length via mapInPandas costs a full
        # positions Arrow round-trip through Python (+47 s vs the +10 s
        # JVM invert); (b) JVM re-aggregation of the laid/written
        # positions pays the same exchange volume as the invert PLUS a
        # 48M-row re-scan (build 45-50 s vs 40.8 s). The invert's
        # map-side partial agg already shrinks its exchange to postings
        # volume, so the only duplicated work is a cheap codegen explode
        # over the cached token arrays. A true single-exchange build
        # needs NESTED per-(tid,docid) rows shuffled once (positions as
        # arrays), which changes the on-disk flat layout the phrase path
        # depends on — not worth it at the measured margins.
        if single:
            laid = (
                _postings_from_docs(docs_tok, fields)
                .repartition(num_buckets * FILES_PER_BUCKET, bexpr, fsalt)
                .withColumn("bucket", bexpr)
                .sortWithinPartitions("tid", "docid")
                .persist()
            )
            persisted.append(laid)
            # the fid ordinal (multi-field) only feeds the in-flight
            # block encode; on-disk postings keep the field-free schema
            laid.drop("fid").write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(post_dir)
        else:
            _postings_from_docs(docs_tok, fields).drop("fid").write.mode(
                "overwrite"
            ).parquet(post_dir)
        if build_positions:
            chunk_pos = _positions_from_docs(docs_tok, fields)
            if single:
                _write_bucketed(
                    chunk_pos, paths.positions, num_buckets,
                    ("tid", "docid", "pos"),
                )
            else:
                chunk_pos.write.mode("overwrite").parquet(
                    os.path.join(paths.stage, f"pos_c{chunk}")
                )
        _term_dict_from_docs(docs_tok, fields).write.mode("overwrite").parquet(dict_dir)
        if single:
            # fold the corpus stats (n_docs, avgdl — per field in multi-
            # field mode) into the cached tokenize pass instead of a
            # separate docs-parquet scan job
            doc_agg = docs_tok.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("doclen").alias("total_len"),
                *[
                    F.sum(f"doclen_{i}").alias(f"total_len_{i}")
                    for i in range(len(fields or ()))
                ],
            ).collect()[0]
        docs_tok.unpersist()
        man = {
            "chunk": chunk,
            "elapsed_ms": int((time.time() - tick) * 1000),
            "status": "done",
        }
        if not single:
            # chunked builds record per-chunk lineage counts; the
            # single-chunk fast path derives them from phase-2 stats
            # instead of paying two extra count jobs
            man["docs_out"] = spark.read.parquet(docs_dir).count()
            man["postings_out"] = spark.read.parquet(post_dir).count()
        with open(manifest, "w") as f:
            json.dump(man, f)

    # ---- phase 2: finalize (global stats, bucketed layout, blocks) ----
    if single:
        if laid is None:
            # resume=True and the only chunk's manifest was already
            # committed: phase 1 was skipped, so the live layout shuffle
            # and cached doc stats don't exist — re-read the final
            # parquet layouts instead (pre-round-3 this crashed with a
            # NoneType subscript; ADVICE.md round 2, reproduced by
            # scripts/submit_build.py --resume with num_chunks=1)
            postings = spark.read.parquet(paths.postings)
            agg = spark.read.parquet(paths.docs).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("doclen").alias("total_len"),
                *[
                    F.sum(f"doclen_{i}").alias(f"total_len_{i}")
                    for i in range(len(fields or ()))
                ],
            ).collect()[0]
        else:
            postings = laid
            agg = doc_agg
    else:
        docs = spark.read.parquet(os.path.join(paths.stage, "docs_c*"))
        postings = spark.read.parquet(os.path.join(paths.stage, "post_c*"))
        docs.write.mode("overwrite").parquet(paths.docs)
        docs = spark.read.parquet(paths.docs)
        agg = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doclen").alias("total_len"),
            *[
                F.sum(f"doclen_{i}").alias(f"total_len_{i}")
                for i in range(len(fields or ()))
            ],
        ).collect()[0]
    n_docs = int(agg["n"])
    avgdl = float(agg["total_len"]) / n_docs if n_docs else 0.0
    avgdl_by_field = (
        {
            f: (float(agg[f"total_len_{i}"]) / n_docs if n_docs else 0.0)
            for i, f in enumerate(fields)
        }
        if fields
        else None
    )

    term_dict = spark.read.parquet(os.path.join(paths.stage, "dict_c*")).distinct()
    postings_agg = postings.groupBy("tid").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("cttf")
    )

    # bucketed flat postings (the correctness/scoring path)
    if not single:
        _write_bucketed(postings, paths.postings, num_buckets, ("tid", "docid"))
        postings = spark.read.parquet(paths.postings)

    if build_positions and not single:
        _write_bucketed(
            spark.read.parquet(os.path.join(paths.stage, "pos_c*")),
            paths.positions, num_buckets, ("tid", "docid", "pos"),
        )

    block_meta = None
    if fields and laid is None:
        # resumed single-chunk multi-field build: the written postings
        # carry no fid ordinal, so per-field block metadata cannot be
        # rebuilt — skip blocks (flat scoring serves every field)
        build_blocks = False
    if build_blocks and n_docs:
        from solr_spark.index.blocks import BLOCK_SIZE

        bsz = block_size or BLOCK_SIZE
        # Round-6: the head-term salt is derived INSIDE the encoder
        # (make_block_encoder salt_threshold/num_salts): the layout keys
        # on pure functions of tid, so a tid's in-partition run length
        # is its exact df and the encoder salts head groups locally.
        # This drops the head-tid broadcast join and the second full
        # sortWithinPartitions the old shape paid over every posting
        # (guide §2.4) — the laid cache feeds the encoder as-is.
        if single and laid is not None:
            # encode parallelism = num_buckets * FILES_PER_BUCKET tasks
            # — the same width as the postings write; num_buckets is the
            # cluster-size scaling knob.
            sorted_post = laid
        else:
            shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
            sorted_post = (
                spark.read.parquet(paths.postings)
                .repartition(shuffle_parts, "tid")
                .sortWithinPartitions("tid", "docid")
            )
        blocks = sorted_post.mapInArrow(
            # multi-field: per-field avgdl array, indexed by the fid
            # ordinal riding the in-flight postings (per-field norms in
            # the block-max metadata)
            make_block_encoder(
                [avgdl_by_field[f] for f in fields] if fields else avgdl,
                bsz, salt_threshold=salt_threshold, num_salts=num_salts,
            ),
            schema=BLOCKS_SCHEMA,
        )
        # encode at full width, then compact to one tid-sorted file per
        # bucket (same listing/footer + row-group-pruning rationale as
        # the postings layout); the extra exchange moves only the small
        # encoded rows, never raw postings
        _write_bucketed(blocks, paths.blocks, num_buckets, ("tid", "salt", "block_id"))

        # per-term block-max summary folded into the dictionary: mtp is
        # the term's global max tf_part (-> MaxScore upper bound ub =
        # w*mtp); skips is the top-SKIPLIST_CAP blocks by min_tf_part as
        # (m, nd) pairs — walking it until Σnd >= k yields a SOUND lower
        # bound of the kth single-term score with NO decode job at query
        # time (the batch analogue of Lucene's block-max skip data).
        # Window (not collect_list-then-slice) so a head term with
        # millions of blocks never materializes one giant array.
        from pyspark.sql import Window

        bmeta = spark.read.parquet(paths.blocks).select(
            "tid", "min_tf_part", F.col("n_docs").alias("nd"), "max_tf_part"
        )
        mtp = bmeta.groupBy("tid").agg(F.max("max_tf_part").alias("mtp"))
        w = Window.partitionBy("tid").orderBy(
            F.desc("min_tf_part"), F.desc("nd")
        )
        skips = (
            bmeta.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= SKIPLIST_CAP)
            .groupBy("tid")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("min_tf_part").alias("m"), F.col("nd"))
                    ),
                    asc=False,
                ).alias("skips")
            )
        )
        block_meta = mtp.join(skips, "tid")

    term_stats = (
        postings_agg.join(term_dict, "tid")
        .withColumn("is_head", F.col("df") > F.lit(salt_threshold))
        .withColumn("bucket", bucket_of_col("term", num_buckets))
    )
    if block_meta is not None:
        term_stats = term_stats.join(block_meta, "tid", "left")
    else:
        term_stats = term_stats.withColumn(
            "mtp", F.lit(None).cast("double")
        ).withColumn("skips", F.lit(None).cast("array<struct<m:double,nd:int>>"))
    (
        term_stats.repartition(max(1, num_buckets // 2), "bucket")
        .sortWithinPartitions("term")  # row-group pruning on the seek key
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(paths.term_stats)
    )

    if laid is not None:
        laid.unpersist()
    meta = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "num_buckets": num_buckets,
        "num_salts": num_salts,
        "salt_threshold": salt_threshold,
        "num_chunks": num_chunks,
        "build_seconds": round(time.time() - t0, 3),
        "has_blocks": bool(build_blocks and n_docs),
        "has_positions": bool(build_positions and n_docs),
        "has_payloads": bool(
            build_positions
            and n_docs
            and (analyzer or {}).get("delimited_payloads")
        ),
    }
    if fields:
        meta["fields"] = list(fields)
        meta["avgdl_by_field"] = avgdl_by_field
    if store_content:
        meta["stored_content"] = True
    if stopwords:
        meta["stopwords"] = list(stopwords)
    if synonyms:
        meta["synonyms"] = dict(synonyms)
    if analyzer:
        meta["analyzer"] = dict(analyzer)
    with open(paths.meta, "w") as f:
        json.dump(meta, f, indent=2)
    if not keep_stage:
        shutil.rmtree(paths.stage, ignore_errors=True)
    return Index(spark, paths, meta)
