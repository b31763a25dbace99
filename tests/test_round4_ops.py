"""Round-4 additions: persisted LSH ANN index, analyzer round-4 stages
(Porter stemmer, multi-token synonym graph, WDGF catenation), new
update processors, value-source tranche 4."""

import hashlib
import struct

import pytest
from pyspark.sql import functions as F


def _vec(i, dim=8):
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{i}:{d}".encode()).digest()
        out.append(struct.unpack("<i", h[:4])[0] / 2**31)
    return out


def test_lsh_build_search_persisted(spark, tmp_path):
    """Persisted multi-table hyperplane LSH: build once (partitioned by
    tbl/bucket), search from the parquet alone in a fresh session; the
    probed scan must carry the (tbl, bucket) partition filters, and
    full-probe search must equal exact brute force."""
    from solr_spark.operators.similarity import cosine_topk, lsh_build, lsh_search

    emb = spark.createDataFrame(
        [(i, _vec(i)) for i in range(400)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "lsh")
    lsh_build(emb, path, n_planes=4, n_tables=4)
    q = _vec(123)
    s2 = spark.newSession()
    # probing every bucket of every table == exact brute force
    full = [
        r["vec_id"]
        for r in lsh_search(s2, path, q, k=5, probe_hamming=4).collect()
    ]
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assert full == exact and exact[0] == 123
    # 1-bit probes: the query's own bucket is always probed, so the
    # true nearest (the query vector itself) is always found
    near = [
        r["vec_id"] for r in lsh_search(s2, path, q, k=5, probe_hamming=1).collect()
    ]
    assert near[0] == 123
    # partition pruning: the scan plan carries tbl/bucket filters
    plan = (
        lsh_search(s2, path, q, k=5, probe_hamming=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "bucket" in plan and "tbl" in plan


def test_lsh_search_dim_mismatch(spark, tmp_path):
    from solr_spark.operators.similarity import lsh_build, lsh_search

    emb = spark.createDataFrame(
        [(i, _vec(i, 6)) for i in range(50)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "lsh6")
    lsh_build(emb, path, n_planes=3, n_tables=2)
    with pytest.raises(ValueError, match="dim"):
        lsh_search(spark, path, _vec(0, 8), k=3)


def test_lsh_persisted_matches_inline(spark, tmp_path):
    """The persisted index and the inline cosine_topk_lsh use identical
    plane seeds, so identical (planes, tables, probes) give identical
    candidate sets → identical results."""
    from solr_spark.operators.similarity import (
        cosine_topk_lsh,
        lsh_build,
        lsh_search,
    )

    emb = spark.createDataFrame(
        [(i, _vec(i)) for i in range(300)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "lshp")
    lsh_build(emb, path, n_planes=4, n_tables=3, seed=42)
    q = _vec(7)
    a = [
        (r["vec_id"], r["sim"])
        for r in lsh_search(spark, path, q, k=8, probe_hamming=1).collect()
    ]
    b = [
        (r["vec_id"], r["sim"])
        for r in cosine_topk_lsh(
            emb, q, k=8, n_planes=4, n_tables=3, seed=42, probe_hamming=1
        ).collect()
    ]
    assert a == b


# ---------------------------------------------------------------- porter

PORTER_VECTORS = {
    # examples from the published algorithm (Porter 1980)
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # longest-match exclusivity: failed long-suffix condition blocks
    # the shorter suffixes in the same step
    "element": "element", "cement": "cement",
    # short words unchanged; vowel-y marking chains
    "is": "is", "as": "as", "dying": "dy", "lying": "ly",
    "syzygy": "syzygi", "sky": "sky", "crying": "cry", "string": "string",
    "meetings": "meet", "news": "new",
}


def test_porter_paper_vectors():
    from solr_spark.analysis.porter import porter_stem_py

    bad = {
        w: (porter_stem_py(w), e)
        for w, e in PORTER_VECTORS.items()
        if porter_stem_py(w) != e
    }
    assert not bad, bad


def _fuzz_words(n=1500, seed=11):
    import random

    random.seed(seed)
    sufs = [
        "", "s", "es", "ies", "sses", "eed", "ed", "ing", "y", "ational",
        "tional", "enci", "izer", "ization", "ation", "iveness", "aliti",
        "icate", "ative", "al", "ance", "er", "ement", "ment", "ent", "ion",
        "ism", "ate", "ous", "ize", "e", "ll", "yy", "ly",
    ]
    out = []
    for _ in range(n):
        base = "".join(
            random.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(random.randint(1, 8))
        )
        out.append(base + random.choice(sufs))
    out += ["a", "ab", "yyy", "y", "sayyid", "gypsy", "8", "123", "x9"]
    return list(dict.fromkeys(out))


def test_porter_three_form_parity(spark):
    """The Column, Python and DuckDB forms implement the SAME rule
    chain — fuzz all three over suffix-heavy random words."""
    import duckdb

    from solr_spark.analysis.porter import (
        porter_scalar_sql, porter_stem_col, porter_stem_py,
    )

    words = _fuzz_words()
    con = duckdb.connect()
    rows = con.execute(
        "SELECT t, " + porter_scalar_sql("t")
        + " FROM (SELECT unnest(?) AS t)", [words]
    ).fetchall()
    assert all(porter_stem_py(t) == s for t, s in rows)

    df = spark.createDataFrame([(w,) for w in words], "t string")
    out = df.select(
        "t", F.element_at(porter_stem_col(F.array("t")), 1).alias("s")
    ).collect()
    assert all(porter_stem_py(r["t"]) == r["s"] for r in out)


def test_catenate_and_graph_parity(spark):
    import duckdb

    from solr_spark.analysis.analyzer import (
        synonym_graph_col, synonym_graph_py, synonym_graph_sql,
        tokenize_catenate_py, tokens_catenate_col, tokens_catenate_sql,
    )

    graph = {"wifi": ["wireless", "fidelity"], "db": ["data", "base"]}
    texts = [
        "Wi-Fi camelCase HTTPServer utf-8 500-42 data base",
        "state-of-the-art x9y mid-2020s model",
        "wi-fi wi-fi wifi", "ab-ab data-base DataBase", "", "hello",
        "a-b-c-1-2-3", "ALL CAPS-LOCK", "foo_bar-baz  qux",
    ]
    import random

    random.seed(9)
    for _ in range(200):
        texts.append(
            "".join(random.choice("ab1- _xY") for _ in range(random.randint(0, 25)))
        )

    con = duckdb.connect()
    sql = synonym_graph_sql(tokens_catenate_sql("txt"), graph)
    rows = con.execute(
        f"SELECT txt, {sql} FROM (SELECT unnest(?) AS txt)", [texts]
    ).fetchall()
    for txt, got in rows:
        assert list(got) == synonym_graph_py(tokenize_catenate_py(txt), graph), txt

    df = spark.createDataFrame([(t,) for t in texts], "txt string")
    out = df.select(
        "txt", synonym_graph_col(tokens_catenate_col("txt"), graph).alias("o")
    ).collect()
    for r in out:
        assert list(r["o"]) == synonym_graph_py(
            tokenize_catenate_py(r["txt"]), graph
        ), r["txt"]


def test_catenate_semantics():
    from solr_spark.analysis.analyzer import tokenize_catenate_py

    # parts + catenated word runs and number runs; no duplicate for
    # single-part runs
    assert tokenize_catenate_py("Wi-Fi") == ["wi", "fi", "wifi"]
    assert tokenize_catenate_py("camelCase") == ["camel", "case", "camelcase"]
    assert tokenize_catenate_py("data") == ["data"]
    assert tokenize_catenate_py("500-42") == ["500", "42", "50042"]
    # digit parts break word runs (catenateWords joins letter runs only)
    toks = tokenize_catenate_py("utf-8x")
    assert toks[:3] == ["utf", "8", "x"] and "utf8x" not in toks


def test_stemmed_index_end_to_end(spark, tmp_path):
    """Build an index with the text_en-style chain; a one-word query
    must match a delimited doc (catenation) and an inflected doc
    (stemming), with the query analyzed through the index handle."""
    from solr_spark.index.builder import Index, build_index
    from solr_spark.query.engine import bm25_topk

    rows = [
        (0, "the Wi-Fi router dropped the connection"),
        (1, "running processes were merged nightly"),
        (2, "totally unrelated zebra text"),
    ]
    corpus = spark.createDataFrame(rows, "docid long, content string")
    idx = build_index(
        spark,
        corpus,
        str(tmp_path / "stemidx"),
        num_buckets=4,
        build_blocks=False,
        analyzer={"stem": "porter", "catenate": True},
    )
    # catenation: "wifi" (one token) matches doc 0's "Wi-Fi"
    hits = {r["docid"] for r in bm25_topk(idx, "wifi", k=5).collect()}
    assert 0 in hits
    # stemming both sides: "runs merge" -> run/merg matches doc 1
    hits = {r["docid"] for r in bm25_topk(idx, "runs merges", k=5).collect()}
    assert 1 in hits and 2 not in hits
    # query side never catenates: analyze() leaves "Wi-Fi" as parts only
    assert idx.analyze("Wi-Fi") == ["wi", "fi"]
    # config survives reload
    idx2 = Index.load(spark, str(tmp_path / "stemidx"))
    assert idx2.meta["analyzer"]["stem"] == "porter"
    assert idx2.analyze("running") == ["run"]


# ------------------------------------------------------- update processors

def test_clone_field_regex(spark):
    from solr_spark.operators.updateproc import apply_chain, clone_field_regex

    df = spark.createDataFrame(
        [(1, "a", "b", "c")], "id long, feat_xs string, feat_ys string, other string"
    )
    out = apply_chain(df, [clone_field_regex(r"feat_(.*)s", r"$1_full")])
    assert set(out.columns) == {"id", "feat_xs", "feat_ys", "other", "x_full", "y_full"}
    r = out.collect()[0]
    assert r["x_full"] == "a" and r["y_full"] == "b"


def test_doc_expiration_ttl(spark):
    from solr_spark.operators.updateproc import (
        apply_chain, doc_expiration, expired_filter,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-15 00:00:00")],
        "id long, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = apply_chain(df, [doc_expiration(7 * 86400, base_col="ts")])
    assert "_expire_at_" in out.columns
    expired = out.where(expired_filter("2024-01-10 00:00:00"))
    assert [r["id"] for r in expired.collect()] == [1]


def test_uuid_v3_shape_and_determinism(spark):
    import duckdb

    from solr_spark.operators.updateproc import (
        apply_chain, uuid_v3_field, uuid_v3_sql,
    )

    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    out = apply_chain(df, [uuid_v3_field("u", "ns", ["k"])]).collect()
    import re

    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    assert all(pat.match(r["u"]) for r in out)
    assert len({r["u"] for r in out}) == 50  # distinct keys -> distinct ids
    # DuckDB twin produces identical ids
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT k, {uuid_v3_sql('ns', ['k'])} AS u"
        " FROM (SELECT unnest(range(50)) AS k)"
    ).fetchall()
    want = {r["k"]: r["u"] for r in out}
    assert all(want[k] == u for k, u in rows)


def test_detect_language_matches_lang_id(spark):
    """The processor Column form and the pipeline DataFrame form share
    one decision rule."""
    from solr_spark.analysis.analyzer import tokens_col
    from solr_spark.operators.textstats import lang_id, lang_id_col
    from solr_spark.operators.updateproc import apply_chain, detect_language

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").alias("docid"), "text"
    )
    via_proc = apply_chain(docs, [detect_language("text", "pl")]).select(
        "docid", F.col("pl").alias("pred_lang")
    )
    via_frame = lang_id(docs.select("docid", tokens_col("text").alias("toks")))
    assert via_proc.orderBy("docid").collect() == via_frame.orderBy("docid").collect()


# ---------------------------------------------------------- value sources

def test_value_sources_tranche4(spark):
    from solr_spark.functions.valuesources import FuncParseError, parse_func
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, '{"k": 7.5}', 100.0, [3.0, 1.0, 2.0], "A")],
        "id long, props string, value double, arr array<double>, tag string",
    )
    row = df.select(
        parse_func("payload(props,'k')").alias("p"),
        parse_func("payload(props,'missing',42)").alias("pd"),
        parse_func("currency(value,'EUR')").alias("eur"),
        parse_func("field(arr,'min')").alias("amin"),
        parse_func("field(arr,'max')").alias("amax"),
        parse_func("literal('x')").alias("lit"),
        parse_func("if(true(),1,2)").alias("t"),
        parse_func("if(false(),1,2)").alias("f"),
        parse_func("hsin(1,0,0,0,0)").alias("zero"),
    ).collect()[0]
    assert row["p"] == 7.5 and row["pd"] == 42.0
    assert abs(row["eur"] - 108.0) < 1e-9
    assert row["amin"] == 1.0 and row["amax"] == 3.0
    assert row["lit"] == "x" and row["t"] == 1 and row["f"] == 2
    assert row["zero"] == 0.0
    # hsin: quarter circumference on unit sphere, radians
    import math

    q = df.select(
        parse_func(f"hsin(1,0,0,0,{math.pi / 2})").alias("q")
    ).collect()[0]["q"]
    assert abs(q - math.pi / 2) < 1e-9
    with _pt.raises(FuncParseError):
        parse_func("currency(value,'XXX')")
    with _pt.raises(FuncParseError):
        parse_func("field(arr,'median')")


# ------------------------------------------------------------- snapshots

def test_snapshot_publish_read_incremental(spark, tmp_path):
    """Snapshot-committed parquet table: atomic versioned commits,
    consistent pinned reads, batch-pull incremental consumption (the
    topic() checkpoint contract over snapshots)."""
    import os

    from solr_spark.sources import snapshots as S

    tbl = str(tmp_path / "events_tbl")
    d1 = spark.range(0, 10).withColumnRenamed("id", "event_id")
    d2 = spark.range(10, 15).withColumnRenamed("id", "event_id")
    assert S.current_version(tbl) == 0
    v1 = S.publish(tbl, d1)
    assert v1 == 1 and S.read(spark, tbl).count() == 10
    # torn write: a data dir WITHOUT a manifest is invisible
    os.makedirs(os.path.join(tbl, "data", "v99"), exist_ok=True)
    assert S.read(spark, tbl).count() == 10
    # incremental: consumer checkpoints the returned version
    inc, v = S.incremental_read(spark, tbl, 0)
    assert v == 1 and inc.count() == 10
    none_inc, v_same = S.incremental_read(spark, tbl, v)
    assert none_inc is None and v_same == 1
    v2 = S.publish(tbl, d2)  # append snapshot
    inc2, v = S.incremental_read(spark, tbl, v1)
    assert v == v2 == 2
    assert sorted(r["event_id"] for r in inc2.collect()) == [10, 11, 12, 13, 14]
    # full view at latest = both dirs; pinned read at v1 = old view
    assert S.read(spark, tbl).count() == 15
    assert S.read(spark, tbl, version=1).count() == 10
    # overwrite snapshot replaces the view and stops incremental chains
    S.publish(tbl, d2, mode="overwrite")
    assert S.read(spark, tbl).count() == 5
    import pytest as _pt

    with _pt.raises(ValueError, match="overwrite"):
        S.incremental_read(spark, tbl, v2)


def test_index_snapshot_versioned_publish(spark, tmp_path):
    """Two index builds into one snapshot root: readers loading through
    the pointer switch atomically; a pinned version stays loadable."""
    from solr_spark.query.engine import bm25_topk
    from solr_spark.sources import snapshots as S

    root = str(tmp_path / "idx_tbl")
    c1 = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha alpha delta")],
        "docid long, content string",
    )
    c2 = spark.createDataFrame(
        [(0, "epsilon zeta"), (1, "epsilon eta theta"), (2, "alpha iota")],
        "docid long, content string",
    )
    S.build_index_versioned(spark, c1, root, num_buckets=2, build_blocks=False)
    assert S.current_version(root) == 1
    i1 = S.load_index_snapshot(spark, root)
    assert {r["docid"] for r in bm25_topk(i1, "alpha", k=5).collect()} == {0, 1}
    S.build_index_versioned(spark, c2, root, num_buckets=2, build_blocks=False)
    assert S.current_version(root) == 2
    i2 = S.load_index_snapshot(spark, root)
    assert {r["docid"] for r in bm25_topk(i2, "alpha", k=5).collect()} == {2}
    # pinned old version still serves
    i1b = S.load_index_snapshot(spark, root, version=1)
    assert {r["docid"] for r in bm25_topk(i1b, "alpha", k=5).collect()} == {0, 1}


def test_topic_resume_over_snapshots(spark, tmp_path):
    """topic() over a snapshot table's append-only data dirs: drain,
    publish a new snapshot, drain again with the SAME checkpoint —
    exactly-once into the sink, only the new snapshot's rows added."""
    from solr_spark.sources import snapshots as S
    from solr_spark.streaming.topic import run_topic_once, topic_stream

    tbl = str(tmp_path / "topic_tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    S.publish(tbl, spark.range(0, 8).withColumnRenamed("id", "event_id"))
    stream = topic_stream(spark, f"{tbl}/data/*", "event_id long")
    run_topic_once(stream, out, ckpt)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(8))
    S.publish(tbl, spark.range(8, 12).withColumnRenamed("id", "event_id"))
    stream = topic_stream(spark, f"{tbl}/data/*", "event_id long")
    run_topic_once(stream, out, ckpt)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(12))  # no duplicates, new rows delivered


def test_field_value_selectors_and_ignore(spark):
    from solr_spark.operators.updateproc import (
        apply_chain, first_field_value, ignore_fields, last_field_value,
        max_field_value, min_field_value,
    )

    df = spark.createDataFrame(
        [(1, [3, 1, 2], [3, 1, 2], [3, 1, 2], [3, 1, 2], "x")],
        "id long, a array<int>, b array<int>, c array<int>, d array<int>, tmp_junk string",
    )
    out = apply_chain(
        df,
        [
            first_field_value("a"),
            last_field_value("b"),
            min_field_value("c"),
            max_field_value("d"),
            ignore_fields(r"tmp_.*"),
        ],
    )
    assert "tmp_junk" not in out.columns
    r = out.collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 2, 1, 3)


def test_run_daemon_resident(spark, tmp_path):
    """Resident daemon(): processingTime loop picks up files that
    arrive AFTER the query starts — the DaemonStream wake-interval
    contract the one-shot drain can't express."""
    import threading
    import time

    from solr_spark.streaming.topic import run_daemon, topic_stream

    src = tmp_path / "src"
    src.mkdir()
    out: list[int] = []
    spark.range(0, 5).toDF("v").coalesce(1).write.mode("append").parquet(str(src))

    def feed():
        time.sleep(2.0)
        spark.range(5, 9).toDF("v").coalesce(1).write.mode("append").parquet(str(src))

    t = threading.Thread(target=feed)
    t.start()
    run_daemon(
        topic_stream(spark, str(src), "v long"),
        lambda b, _id: out.extend(r["v"] for r in b.collect()),
        str(tmp_path / "ckpt"),
        interval="500 milliseconds",
        iterations=2,
        timeout_s=60,
    )
    t.join()
    assert sorted(out) == list(range(9))


# --------------------------------------------------- value-source tranche 6

def test_agg_parsers_match_local(spark):
    """agg_* JSON-Facet aggregation parsers (ValueSourceParser.java:
    944-1088) — sum/avg/sumsq/variance/stddev/min/max/count/countvals/
    missing/unique/percentile over a grouped frame, checked against a
    locally computed oracle with the reference's corrected variance
    (AggUtil.java:61-64)."""
    from solr_spark.functions.valuesources import FuncParseError, parse_agg
    import pytest as _pt

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
        ("b", 10.0), ("b", 10.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            parse_agg("count()").alias("n"),
            parse_agg("countvals(x)").alias("cv"),
            parse_agg("missing(x)").alias("miss"),
            parse_agg("sum(x)").alias("s"),
            parse_agg("avg(x)").alias("m"),
            parse_agg("sumsq(x)").alias("ssq"),
            parse_agg("min(x)").alias("lo"),
            parse_agg("max(x)").alias("hi"),
            parse_agg("variance(x)").alias("var"),
            parse_agg("stddev(x)").alias("sd"),
            parse_agg("unique(g)").alias("u"),
            parse_agg("percentile(x, 0.5)").alias("p50"),
            parse_agg("agg(sum(mul(x, 2)))").alias("s2"),
        )
        .collect()
    }
    a = out["a"]
    # group a: values 1,2,3 (one null). corrected variance of 1,2,3 = 1
    assert a["n"] == 4 and a["cv"] == 3 and a["miss"] == 1
    assert a["s"] == 6.0 and a["m"] == 2.0 and a["ssq"] == 14.0
    assert a["lo"] == 1.0 and a["hi"] == 3.0
    assert a["var"] == 1.0 and a["sd"] == 1.0
    assert a["u"] == 1 and a["p50"] == 2.0 and a["s2"] == 12.0
    b = out["b"]
    assert b["var"] == 0.0 and b["sd"] == 0.0 and b["miss"] == 0
    # hll is approximate: equals exact on tiny cardinalities
    h = df.groupBy("g").agg(parse_agg("hll(x)").alias("h")).collect()
    assert all(r["h"] >= 1 for r in h)
    with _pt.raises(FuncParseError):
        parse_agg("nosuchagg(x)")
    with _pt.raises(FuncParseError):
        parse_agg("sum(x, y)")
    with _pt.raises(FuncParseError):
        parse_agg("plainscalar")


def test_sleep_threadid_parse_time(spark):
    """sleep(ms, src) pauses at PARSE time and returns src unchanged;
    threadid() is a parse-time long constant (ValueSourceParser.java:
    147-165) — both debug utilities, neither touches the plan."""
    import time

    from solr_spark.functions.valuesources import parse_func

    df = spark.createDataFrame([(5.0,)], "x double")
    t0 = time.monotonic()
    col = parse_func("sleep(120, add(x, 1))")
    assert time.monotonic() - t0 >= 0.1  # slept while parsing
    assert df.select(col.alias("v")).collect()[0]["v"] == 6.0
    tid = df.select(parse_func("threadid()").alias("t")).collect()[0]["t"]
    import threading

    assert tid == threading.get_ident()


def test_joindf_docfreq_lookup(spark, tmp_path):
    """joindf(f0, qf): per-doc docfreq of the term equal to the doc's
    stored f0 value (JoinDocFreqValueSource, ValueSourceParser.java:331)
    — resolved as one docs-scan joined to the term dictionary."""
    from solr_spark.functions.valuesources import parse_func_df
    from solr_spark.index.builder import build_index

    rows = [
        (0, "apple banana", "apple"),
        (1, "banana cherry", "banana"),
        (2, "cherry apple banana", "kiwi"),
    ]
    corpus = spark.createDataFrame(rows, "docid long, content string, tag string")
    idx = build_index(
        spark, corpus, str(tmp_path / "jdfidx"), num_buckets=4,
        build_blocks=False,
    )
    base = idx.docs().select("docid")
    out, col = parse_func_df("joindf(tag, content)", base, index=idx)
    got = {r["docid"]: r["v"] for r in out.select("docid", col.alias("v")).collect()}
    # df(apple)=2, df(banana)=3, kiwi absent -> 0
    assert got == {0: 2.0, 1: 3.0, 2: 0.0}


# --------------------------------------------- update-processor tranche 3

def test_signature_and_template(spark):
    """SignatureUpdateProcessorFactory (md5 + lookup3-width) and
    TemplateUpdateProcessorFactory {field} substitution."""
    import hashlib

    from solr_spark.operators import updateproc as UP

    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc"), (None, "c")], "x string, y string"
    )
    out = UP.apply_chain(df, [
        UP.signature_field("sig", ["x", "y"]),
        UP.signature_field("sig64", ["x", "y"], algo="lookup3"),
        UP.template_field("greet", "hi {x}!{missing}"),
    ]).collect()
    want = hashlib.md5("ab\x1fc".encode()).hexdigest()
    assert out[0]["sig"] == want and out[0]["sig64"] == want[:16]
    # unit separator keeps ("ab","c") != ("a","bc")
    assert out[0]["sig"] != out[1]["sig"]
    # null hashes as empty
    assert out[2]["sig"] == hashlib.md5("\x1fc".encode()).hexdigest()
    assert out[0]["greet"] == "hi ab!" and out[2]["greet"] == "hi !"


def test_regexp_boost_composes(spark):
    from solr_spark.operators import updateproc as UP

    df = spark.createDataFrame(
        [("spark rocks",), ("plain text",)], "t string"
    )
    out = UP.apply_chain(df, [
        UP.regexp_boost("t", r".*spark.*", 2.0),
        UP.regexp_boost("t", r".*rocks.*", 3.0),  # multiplies the running boost
    ]).collect()
    assert out[0]["boost_d"] == 6.0 and out[1]["boost_d"] == 1.0


def test_url_classify(spark):
    from solr_spark.operators import updateproc as UP

    df = spark.createDataFrame(
        [("https://Docs.Example.COM/a/b/page.html",),
         ("http://example.org/",)],
        "url string",
    )
    out = UP.url_classify("url")(df).collect()
    r0, r1 = out
    assert r0["url_levels"] == 3 and r0["url_toplevel"] == "com"
    assert not r0["url_landingpage"] and r1["url_landingpage"]
    assert r0["url_canonical"] == "https://docs.example.com/a/b/page.html"
    assert r1["url_canonical"] == "http://example.org"
    assert r0["url_length"] == len("https://Docs.Example.COM/a/b/page.html")


def test_ignore_large_skip_existing_rename_parsebool(spark):
    from solr_spark.operators import updateproc as UP
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, "short", "Yes"), (2, "x" * 100, "off"), (3, "mid", "maybe")],
        "id long, body string, flag string",
    )
    out = UP.apply_chain(df, [
        UP.ignore_large_document(50),
        UP.parse_boolean("flag"),
        UP.field_name_mutating(r"^body$", "text"),
    ])
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 3} and "text" in out.columns
    assert rows[1]["flag"] is True and rows[3]["flag"] is None
    existing = spark.createDataFrame([(1,)], "id long")
    left = UP.skip_existing(existing, "id")(df)
    assert sorted(r["id"] for r in left.collect()) == [2, 3]
    with _pt.raises(ValueError):
        UP.field_name_mutating(r"^(id|flag)$", "same")(df)


# ------------------------------------------------ analysis filter tranche

def test_fold_length_ngram_shingle_three_form_parity(spark):
    """ascii_fold / length_filter / edge_ngram / shingle: Column ==
    Python == DuckDB on text exercising accents, ligatures, short/long
    tokens (the same tri-form contract as stop/synonym/stem)."""
    import duckdb

    from solr_spark.analysis import analyzer as A

    texts = [
        "Crème brûlée & Ærø straße",
        "a bb ccc dddd eeeee",
        "Ångström naïve façade Œuvre",
        "",
        "x",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    con = duckdb.connect()

    def all3(col_fn, py_fn, sql_fn):
        base = A.tokens_col("text")
        got_col = [
            r["t"] for r in df.select(col_fn(base).alias("t")).collect()
        ]
        got_py = [py_fn(A.tokenize_py(t)) for t in texts]
        sql = sql_fn(A.tokens_sql("text"))
        got_sql = [
            list(r[0])
            for r in con.execute(
                f"SELECT {sql} FROM (SELECT unnest(?) AS text)", [texts]
            ).fetchall()
        ]
        assert got_col == got_py == got_sql

    all3(A.ascii_fold_col, A.ascii_fold_py, A.ascii_fold_sql)
    all3(
        lambda c: A.length_filter_col(c, 2, 4),
        lambda t: A.length_filter_py(t, 2, 4),
        lambda s: A.length_filter_sql(s, 2, 4),
    )
    all3(
        lambda c: A.edge_ngram_col(c, 2, 3),
        lambda t: A.edge_ngram_py(t, 2, 3),
        lambda s: A.edge_ngram_sql(s, 2, 3),
    )
    all3(A.shingle_col, A.shingle_py, A.shingle_sql)
    all3(
        lambda c: A.shingle_col(c, 3, "_", False),
        lambda t: A.shingle_py(t, 3, "_", False),
        lambda s: A.shingle_sql(s, 3, "_", False),
    )


def test_fold_semantics():
    from solr_spark.analysis.analyzer import ascii_fold_py

    assert ascii_fold_py(["crème", "straße", "ærø", "œuvre"]) == [
        "creme", "strasse", "aero", "oeuvre"
    ]


def test_edge_ngram_index_autocomplete(spark, tmp_path):
    """Suggester shape end-to-end: an edge_ngram index matches a
    literal prefix query; the query side analyzes to plain tokens
    (index!=query asymmetry, like catenate)."""
    from solr_spark.index.builder import build_index
    from solr_spark.query.engine import bm25_topk

    rows = [
        (0, "distributed database systems"),
        (1, "distillation methods"),
        (2, "zebra crossings"),
    ]
    corpus = spark.createDataFrame(rows, "docid long, content string")
    idx = build_index(
        spark, corpus, str(tmp_path / "ngidx"), num_buckets=4,
        build_blocks=False,
        analyzer={"ascii_fold": True, "edge_ngram": (3, 6)},
    )
    assert idx.analyze("dist") == ["dist"]  # query side: no grams
    hits = [r["docid"] for r in bm25_topk(idx, "dist", k=10).collect()]
    assert set(hits) == {0, 1}
    hits2 = [r["docid"] for r in bm25_topk(idx, "distil", k=10).collect()]
    assert hits2 == [1]


def test_facet_domain_transforms(spark):
    """Domain changes compose: filter -> toParent -> toChildren round
    trips to exactly the children of matched blocks; join_domain maps
    through an arbitrary from/to key pair."""
    from solr_spark.operators import facets as FA

    parents = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "pid long, seg string"
    )
    children = spark.createDataFrame(
        [(1, 5.0), (1, 50.0), (2, 7.0), (3, 60.0)], "pid long, v double"
    )
    hit_kids = children.where(F.col("v") >= 50)
    up = FA.domain_to_parent(hit_kids, parents, "pid")
    assert sorted(r["pid"] for r in up.collect()) == [1, 3]
    down = FA.domain_to_children(up, children, "pid")
    assert sorted(r["v"] for r in down.collect()) == [5.0, 50.0, 60.0]
    segs = spark.createDataFrame([("x", 10), ("y", 20), ("z", 30)], "seg string, w long")
    j = FA.join_domain(up, segs, "seg", "seg")
    assert sorted(r["w"] for r in j.collect()) == [10]


# ----------------------------------------- stream expression tranche 2

def test_stream_expr_having_sort_outer(spark):
    """New eval() stream types: having (boolean evaluator tree), sort,
    leftOuterJoin/outerHashJoin, cartesianProduct, facet, stats,
    random (deterministic sample)."""
    from solr_spark.plans.streamexpr import eval_expr

    t = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 5.0), ("c", 4, 7.0)],
        "k string, id long, v double",
    )
    r = spark.createDataFrame([("a", 100), ("b", 200)], "k string, w int")
    tables = {"t": t, "r": r}

    hv = eval_expr(
        'having(search(t), and(gt(v, 6), lteq(id, 2)))', tables
    ).collect()
    assert sorted(x["id"] for x in hv) == [1, 2]
    hv2 = eval_expr(
        'having(search(t), or(eq(k, "c"), gt(add(v, id), 21)))', tables
    ).collect()
    assert sorted(x["id"] for x in hv2) == [2, 4]

    so = eval_expr('sort(search(t), by="v desc")', tables).collect()
    assert [x["id"] for x in so] == [2, 1, 4, 3]

    lo = eval_expr('leftOuterJoin(search(t), search(r), on="k")', tables)
    rows = {x["id"]: x["w"] for x in lo.collect()}
    assert rows[1] == 100 and rows[4] is None
    oh = eval_expr('outerHashJoin(search(t), search(r), on="k")', tables)
    assert {x["id"]: x["w"] for x in oh.collect()} == rows

    fc = eval_expr(
        'facet(t, buckets="k", sum(v), count(*))', tables
    ).collect()
    assert [(x["k"], x["sum(v)"]) for x in fc] == [
        ("a", 30.0), ("b", 5.0), ("c", 7.0)
    ]
    st = eval_expr('stats(t, sum(v), max(id))', tables).collect()[0]
    assert st["sum(v)"] == 42.0 and st["max(id)"] == 4

    rnd1 = [x["id"] for x in eval_expr('random(t, rows=2)', tables).collect()]
    rnd2 = [x["id"] for x in eval_expr('random(t, rows=2)', tables).collect()]
    assert rnd1 == rnd2 and len(rnd1) == 2  # deterministic replay

    arr = spark.createDataFrame([(1, [10, 20])], "id long, xs array<int>")
    cp = eval_expr('cartesianProduct(search(a), xs)', {"a": arr}).collect()
    assert sorted(x["xs"] for x in cp) == [10, 20]


def test_tolerant_split_quarantine(spark):
    """Tolerant chain: failing rows route to quarantine tagged with
    every failed check; passing rows continue clean."""
    from solr_spark.operators import updateproc as UP

    df = spark.createDataFrame(
        [(1, "ok", 5), (2, None, 5), (3, "ok", -1), (4, None, -2)],
        "id long, name string, qty int",
    )
    ok, bad = UP.tolerant_split(df, {
        "missing_name": F.col("name").isNotNull(),
        "neg_qty": F.col("qty") >= 0,
    })
    assert [r["id"] for r in ok.orderBy("id").collect()] == [1]
    b = {r["id"]: sorted(r["_errors_"]) for r in bad.collect()}
    assert b == {
        2: ["missing_name"], 3: ["neg_qty"],
        4: ["missing_name", "neg_qty"],
    }
    assert "_errors_" not in ok.columns


def test_flatten_nested_blockjoin_roundtrip(spark):
    """flatten_nested produces the explicit-root layout blockjoin
    queries: parents level 0, children exploded with _root_ lineage."""
    from solr_spark.operators import blockjoin as BJ
    from solr_spark.operators import updateproc as UP

    df = spark.createDataFrame(
        [(10, "p1", [{"sku": "a", "qty": 1}, {"sku": "b", "qty": 9}]),
         (20, "p2", [])],
        "id long, title string, "
        "items array<struct<sku:string, qty:int>>",
    )
    flat = UP.flatten_nested(df, "items", id_col="id")
    parents = flat.where(F.col("_nest_level_") == 0)
    kids = flat.where(F.col("_nest_level_") == 1)
    assert parents.count() == 2 and kids.count() == 2
    assert {r["_root_"] for r in kids.collect()} == {10}
    hit = BJ.parent_query(
        parents, kids, "_root_", F.col("qty") >= 5, parent_key="_root_"
    )
    assert [r["id"] for r in hit.collect()] == [10]


def test_build_report_lineage(spark, tmp_path):
    """build_report(): meta rollups + per-chunk manifests + dictionary/
    postings counts — the resumable-build metrics surface."""
    from solr_spark.index.builder import build_index

    corpus = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(40)],
        "docid long, content string",
    )
    idx = build_index(
        spark, corpus, str(tmp_path / "repidx"), num_buckets=4,
        num_chunks=2, build_blocks=False,
    )
    rep = idx.build_report()
    assert rep["n_docs"] == 40 and rep["num_chunks"] == 2
    assert rep["n_terms"] >= 42 and rep["n_postings"] > 0
    assert len(rep["chunks"]) == 2
    assert all(c["status"] == "done" for c in rep["chunks"])
    assert sum(c["docs_out"] for c in rep["chunks"]) == 40


# ------------------------------------------------- LTR JSON model scoring

def test_ltr_linear_and_trees_models(spark):
    """Solr LTR managed-store JSON models score as Columns: LinearModel
    (weights x normalized features) and MultipleAdditiveTreesModel
    (threshold + 1e-6 slack, boundary goes LEFT — the reference's
    NODE_SPLIT_SLACK semantics)."""
    from solr_spark.operators.ml import ltr_model_score

    df = spark.createDataFrame(
        [(1, 10.0, 0.5), (2, 55.0, 0.5), (3, -5.0, 2.0)],
        "id long, f1 double, f2 double",
    )
    linear = {
        "class": "org.apache.solr.ltr.model.LinearModel",
        "features": [
            {"name": "f1",
             "norm": {"class": "org.apache.solr.ltr.norm.MinMaxNormalizer",
                      "params": {"min": "5", "max": "55"}}},
            {"name": "f2"},
        ],
        "params": {"weights": {"f1": 1.0, "f2": 2.0}},
    }
    got = {
        r["id"]: round(r["s"], 6)
        for r in df.select("id", ltr_model_score(linear).alias("s")).collect()
    }
    # f1 minmax: (v-5)/50 -> 0.1, 1.0, -0.2 ; + 2*f2
    assert got == {1: 1.1, 2: 2.0, 3: 3.8}

    trees = {
        "class": "org.apache.solr.ltr.model.MultipleAdditiveTreesModel",
        "features": [{"name": "f1"}, {"name": "f2"}],
        "params": {"trees": [
            {"weight": 1.0, "root": {
                "feature": "f1", "threshold": "10.0",
                "left": {"value": "5.0"},
                "right": {"feature": "f2", "threshold": "1.0",
                          "left": {"value": "1.0"},
                          "right": {"value": "2.0"}}}},
            {"weight": 0.5, "root": {"value": "4.0"}},
        ]},
    }
    got_t = {
        r["id"]: round(r["s"], 6)
        for r in df.select("id", ltr_model_score(trees).alias("s")).collect()
    }
    # id1: f1=10 <= 10+slack -> LEFT 5.0 (boundary goes left); +0.5*4=2
    # id2: f1=55 -> right, f2=0.5<=1 -> 1.0 ; +2
    # id3: f1=-5 -> left 5.0 ; +2
    assert got_t == {1: 7.0, 2: 3.0, 3: 7.0}
    # missing feature column reads 0.0
    df2 = spark.createDataFrame([(9, 20.0)], "id long, f1 double")
    s = df2.select(ltr_model_score(trees, df2).alias("s")).collect()[0]["s"]
    assert s == 1.0 + 2.0  # f2 missing -> 0 <= 1 -> left 1.0, + tree2 2.0


def test_ltr_neural_network_and_wrapper(spark, tmp_path):
    """NeuralNetworkModel: layer math out_i = act(bias_i + W_i . in)
    with the reference's activation registry (leakyrelu slope 0.01);
    DefaultWrapperModel unwraps to the resource file."""
    import json

    from solr_spark.operators.ml import ltr_load_model, ltr_model_score

    nn = {
        "class": "org.apache.solr.ltr.model.NeuralNetworkModel",
        "features": [{"name": "x1"}, {"name": "x2"}],
        "params": {"layers": [
            {"matrix": [[1.0, -1.0], [0.5, 0.5]], "bias": [0.0, 1.0],
             "activation": "relu"},
            {"matrix": [[2.0, 1.0]], "bias": [-1.0],
             "activation": "identity"},
        ]},
    }
    df = spark.createDataFrame([(1, 3.0, 1.0), (2, 0.0, 4.0)],
                               "id long, x1 double, x2 double")
    got = {
        r["id"]: round(r["s"], 6)
        for r in df.select("id", ltr_model_score(nn).alias("s")).collect()
    }
    # id1: h=[relu(3-1)=2, relu(0.5*4+1)=3] -> 2*2+3-1 = 6
    # id2: h=[relu(-4)=0, relu(2+1)=3]      -> 0+3-1   = 2
    assert got == {1: 6.0, 2: 2.0}

    inner = tmp_path / "real_model.json"
    inner.write_text(json.dumps(nn))
    wrapper = tmp_path / "wrapper.json"
    wrapper.write_text(json.dumps({
        "class": "org.apache.solr.ltr.model.DefaultWrapperModel",
        "params": {"resource": "real_model.json"},
    }))
    loaded = ltr_load_model(str(wrapper))
    assert loaded["class"].endswith("NeuralNetworkModel")
    got2 = {
        r["id"]: round(r["s"], 6)
        for r in df.select("id", ltr_model_score(loaded).alias("s")).collect()
    }
    assert got2 == got
    # leakyrelu slope
    leaky = {"class": "NeuralNetworkModel",
             "features": [{"name": "x1"}],
             "params": {"layers": [
                 {"matrix": [[1.0]], "bias": [0.0], "activation": "leakyrelu"},
             ]}}
    v = spark.createDataFrame([(-5.0,)], "x1 double").select(
        ltr_model_score(leaky).alias("s")).collect()[0]["s"]
    assert abs(v - (-0.05)) < 1e-9


# -------------------------------------- pipeline: pii / contamination / pack

def test_pii_scrub_and_counts(spark):
    """PII redaction: Column and DuckDB twins run the SAME RE2-safe
    patterns; counts audit frame matches."""
    import duckdb

    from solr_spark.operators import textstats as TS

    texts = [
        "mail me at a.b-c+x@exa-mple.org now",
        "ssn 123-45-6789 phone +1-555-123-4567 ip 10.0.0.255",
        "clean text with no pii at all",
        "two mails x@y.io and z@w.co",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [r["s"] for r in df.select(
        TS.pii_scrub_col("text").alias("s")).collect()]
    assert got[0] == "mail me at [EMAIL] now"
    assert got[1] == "ssn [SSN] phone [PHONE] ip [IP]"
    assert got[2] == texts[2]
    assert got[3] == "two mails [EMAIL] and [EMAIL]"
    con = duckdb.connect()
    sql = TS.pii_scrub_sql("text")
    dd = [r[0] for r in con.execute(
        f"SELECT {sql} FROM (SELECT unnest(?) AS text)", [texts]).fetchall()]
    assert dd == got
    counts = {r["docid"]: (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"])
              for r in TS.pii_counts(df, "doc_id", "text").collect()}
    assert counts[0] == (1, 0, 0, 0) and counts[2] == (0, 0, 0, 0)
    assert counts[1] == (0, 1, 1, 1) and counts[3] == (2, 0, 0, 0)
    csel = ", ".join(TS.pii_counts_sql("text"))
    drow = con.execute(
        f"SELECT {csel} FROM (SELECT unnest(?) AS text) ", [[texts[1]]]
    ).fetchone()
    assert tuple(drow) == counts[1]


def test_contamination_scoring(spark):
    from solr_spark.operators import textstats as TS

    def tok(rows):
        return spark.createDataFrame(rows, "docid long, toks array<string>")

    docs = tok([
        (0, ["a", "b", "c", "d", "e"]),     # shingles(3): abc bcd cde
        (1, ["x", "y", "z", "w"]),          # xyz yzw
        (2, ["a", "b"]),                    # too short -> 0 shingles
    ])
    bench = tok([(100, ["b", "c", "d", "e", "q"])])  # bcd cde deq
    got = {r["docid"]: (r["n_sh"], r["n_hit"], r["contamination"])
           for r in TS.contamination(docs, bench, n=3).collect()}
    assert got[0] == (3, 2, 0.6667)
    assert got[1] == (2, 0, 0.0)
    assert got[2] == (0, 0, 0.0)


def test_pack_sequences_two_phase(spark):
    """pack_id = floor(prefix_token_offset / budget), exact vs a
    single-node oracle; identical across shuffle-partition settings
    (the two-phase prefix sum is partitioning-independent)."""
    import duckdb

    from solr_spark.operators import textstats as TS

    rows = [(i, (i * 37 % 90) + 10) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, ntok long")
    out = TS.pack_sequences(df, "doc_id", "ntok", budget=500)
    got = {r["doc_id"]: (r["token_offset"], r["pack_id"])
           for r in out.collect()}
    con = duckdb.connect()
    want = con.execute("""
        SELECT doc_id,
               coalesce(sum(ntok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
               coalesce(sum(ntok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // 500 AS pack
        FROM (SELECT unnest($1) AS doc_id, unnest($2) AS ntok)
    """, [[r[0] for r in rows], [r[1] for r in rows]]).fetchall()
    assert got == {d: (o, p) for d, o, p in want}
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        out2 = TS.pack_sequences(df, "doc_id", "ntok", budget=500)
        got2 = {r["doc_id"]: (r["token_offset"], r["pack_id"])
                for r in out2.collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert got2 == got


def test_streamexpr_tranche3_graph_and_agg(spark):
    """Compiler tranche 3: nodes/shortestPath/scoreNodes/
    significantTerms/timeseries/drill compile to the same results as the
    operator APIs they dispatch to."""
    from solr_spark.operators import graph as G
    from solr_spark.operators import relevance as R
    from solr_spark.plans.streamexpr import eval_expr

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4)], "a long, b long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    tables = {"e": edges, "s": seeds}
    got = eval_expr('nodes(e, search(s), walk="a->b", maxDepth=2)', tables)
    want = G.gather_nodes(
        edges.select(edges.a.alias("src"), edges.b.alias("dst")), seeds, 2
    )
    assert got.collect() == want.collect()

    sp = eval_expr('shortestPath(e, from=1, to=4, edge="a->b", maxDepth=6)', tables)
    assert [(r["node"], r["dist"]) for r in sp.collect()] == [(4, 2)]

    freq = spark.createDataFrame([(2, 3), (3, 1)], "node long, df long")
    nodes_in = spark.createDataFrame([(2, 5), (3, 2)], "node long, cnt long")
    sn = eval_expr(
        'scoreNodes(search(n), freq=f, numDocs=10, count="cnt")',
        {"n": nodes_in, "f": freq},
    )
    want_sn = G.score_nodes(nodes_in, freq, 10, "cnt")
    assert sn.collect() == want_sn.collect()

    toks = spark.createDataFrame(
        [(i, ["x", "y"] if i % 2 else ["x", "z"]) for i in range(20)],
        "docid long, toks array<string>",
    )
    st = eval_expr('significantTerms(t, q="y", minDocFreq=2, limit=5)', {"t": toks})
    want_st = R.significant_terms(toks, "y", 2, 5)
    assert st.collect() == want_st.collect()

    ev = spark.createDataFrame(
        [("2020-01-01 05:00:00", 1.0), ("2020-01-01 09:00:00", 2.0),
         ("2020-01-02 01:00:00", 5.0)],
        "ts string, v double",
    ).selectExpr("cast(ts as timestamp) ts", "v")
    t1 = eval_expr('timeseries(ev, field="ts", gap="+1DAY", sum(v), count(*))',
                   {"ev": ev}).collect()
    assert [(r["bucket_ts"], r["sum(v)"], r["count(*)"]) for r in t1] == [
        ("2020-01-01 00:00:00", 3.0, 2), ("2020-01-02 00:00:00", 5.0, 1)]
    dr = eval_expr('drill(ev, over="v", count(*))', {"ev": ev}).collect()
    assert [(r["v"], r["count(*)"]) for r in dr] == [(1.0, 1), (2.0, 1), (5.0, 1)]


def test_streamexpr_tranche3_let_update_eval(spark):
    """let/get/tuple/echo/list/update/daemon/eval branch semantics."""
    import pytest

    from solr_spark.plans.streamexpr import StreamExprError, eval_expr

    t = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    tables = {"t": t}

    lt = eval_expr(
        'let(a=search(t, q="k:[2 TO *]"), top(get(a), n=1, sort="v desc"))',
        tables,
    ).collect()
    assert [(r["k"], r["v"]) for r in lt] == [(3, 30)]

    tp = eval_expr('tuple(x=1, s="hi")', tables).collect()
    assert (tp[0]["x"], tp[0]["s"]) == (1, "hi")
    assert eval_expr('echo("ping")', tables).collect()[0]["echo"] == "ping"

    ls = eval_expr('list(select(search(t), "k"), select(search(t), "v as k"))',
                   tables).collect()
    assert sorted(r["k"] for r in ls[:3]) == [1, 2, 3]
    assert sorted(r["k"] for r in ls[3:]) == [10, 20, 30]

    # update into the registry (bare ident dest), then daemon() one-shot
    up = eval_expr('update(t2, search(t, q="k:[2 TO *]"))', tables).collect()
    assert up[0]["batchIndexed"] == 2
    assert "t2" in tables and tables["t2"].count() == 2
    dm = eval_expr('daemon(update(t3, search(t)))', tables).collect()
    assert dm[0]["batchIndexed"] == 3

    # eval(): expression string arrives as the first tuple's expr_s field
    ex = spark.createDataFrame(
        [('top(search(t), n=1, sort="k asc")',)], "expr_s string"
    )
    ev = eval_expr("eval(search(x))", {"t": t, "x": ex}).collect()
    assert [(r["k"], r["v"]) for r in ev] == [(1, 10)]

    with pytest.raises(StreamExprError):
        eval_expr("eval(search(x))", {"x": ex.where("1=0")}).collect()


def test_streamexpr_executor(spark):
    """executor(): every tuple's expr_s runs; update() side effects land
    in the registry and the summary stream reports per-task row counts."""
    from solr_spark.plans.streamexpr import eval_expr

    t = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    jobs = spark.createDataFrame(
        [('update(lo, search(t, q="k:[* TO 1]"))',),
         ('update(hi, search(t, q="k:[2 TO *]"))',)],
        "expr_s string",
    )
    tables = {"t": t, "jobs": jobs}
    got = eval_expr("executor(search(jobs))", tables).collect()
    assert sorted(r["rows"] for r in got) == [1, 1]  # update emits 1 summary row
    assert tables["lo"].count() == 1 and tables["hi"].count() == 2


def test_streamexpr_executor_threads(spark):
    """executor(threads=N): the driver-side task queue drains through a
    worker pool (ExecutorStream's thread pool); results are identical
    to the serial path."""
    from solr_spark.plans.streamexpr import eval_expr

    t = spark.createDataFrame([(i, i * 10) for i in range(6)], "k long, v long")
    jobs = spark.createDataFrame(
        [(f'update(o{i}, search(t, q="k:[{i} TO {i}]"))',) for i in range(4)],
        "expr_s string",
    )
    tables = {"t": t, "jobs": jobs}
    got = eval_expr("executor(search(jobs), threads=3)", tables).collect()
    assert sorted(r["rows"] for r in got) == [1, 1, 1, 1]
    for i in range(4):
        assert tables[f"o{i}"].count() == 1


def test_word_break_suggest(spark):
    from solr_spark.operators.relevance import word_break_suggest

    d = spark.createDataFrame(
        [("spark", 10), ("hash", 8), ("data", 20), ("base", 5),
         ("database", 3)],
        "term string, df long",
    )
    got = word_break_suggest(d, ["sparkhash", "data", "base"]).collect()
    rows = [(r["kind"], r["original"], r["suggestion"], r["score_df"]) for r in got]
    assert ("break", "sparkhash", "spark hash", 8) in rows
    assert ("combine", "data base", "database", 3) in rows
    # dict words split into dict words also emit break suggestions only
    # when both halves exist; 'data' halves don't
    assert not [r for r in rows if r[1] == "data" and r[0] == "break"]
    # min_df prunes the rare halves
    assert word_break_suggest(d, ["sparkhash"], min_df=9).count() == 0
    assert word_break_suggest(d, []).count() == 0


def test_bayes_classifier_exact(spark):
    """Multinomial NB with Laplace smoothing: hand-computed posterior on
    a tiny corpus, unseen-term penalty applied, deterministic tie rule."""
    import math

    from solr_spark.operators.ml import bayes_classify, bayes_train

    train = spark.createDataFrame(
        [(0, ["spam", "buy", "buy"], "bad"),
         (1, ["spam", "cash"], "bad"),
         (2, ["meeting", "notes"], "good"),
         (3, ["notes", "spark"], "good")],
        "docid long, toks array<string>, label string",
    )
    tm, cm = bayes_train(train)
    # V=6 distinct terms; class 'bad': 5 tokens, 'good': 4 tokens
    llik = {(r["label"], r["term"]): r["llik"] for r in tm.collect()}
    assert abs(llik[("bad", "buy")] - math.log(3 / 11)) < 1e-12
    assert abs(llik[("good", "notes")] - math.log(3 / 10)) < 1e-12
    cmrows = {r["label"]: (r["prior"], r["miss"]) for r in cm.collect()}
    assert abs(cmrows["bad"][0] - math.log(0.5)) < 1e-12
    assert abs(cmrows["bad"][1] - math.log(1 / 11)) < 1e-12

    test = spark.createDataFrame(
        [(10, ["buy", "cash"]), (11, ["notes", "unknownzz"])],
        "docid long, toks array<string>",
    )
    got = {r["docid"]: r["class_s"] for r in bayes_classify(test, tm, cm).collect()}
    assert got == {10: "bad", 11: "good"}

    # processor form: joins the label back onto the incoming frame
    from solr_spark.operators.ml import classify_update_processor

    out = classify_update_processor(
        test.withColumn("extra", F.lit("x")), train
    )
    assert {r["docid"]: r["class_s"] for r in out.collect()} == got
    assert "extra" in out.columns


def test_time_routed_alias_write_read(spark, tmp_path):
    """TimeRoutedAlias: writes land in time buckets, a window read
    prunes partitions (PartitionFilters in the plan), and category
    routing composes."""
    from solr_spark.operators.updateproc import (
        time_routed_read, time_routed_write,
    )

    df = spark.createDataFrame(
        [(i, f"2021-{1 + i % 6:02d}-15 00:00:00",
          "a" if (i // 6) % 2 else "b")
         for i in range(60)],
        "id long, ts string, cat string",
    ).selectExpr("id", "cast(ts as timestamp) ts", "cat")
    root = str(tmp_path / "tra")
    time_routed_write(df, root, "ts", gap="month", category_col="cat")

    got = time_routed_read(spark, root, start="2021-02-01", end="2021-04-01")
    assert got.count() == 20  # two of six monthly buckets
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_route_" in plan.split("PartitionFilters")[1].split("]")[0]

    import os

    buckets = sorted(
        d for d in os.listdir(root) if d.startswith("_route_=")
    )
    assert len(buckets) == 6
    cats = os.listdir(os.path.join(root, buckets[0]))
    assert sorted(c for c in cats if c.startswith("_route_cat_=")) == [
        "_route_cat_=a", "_route_cat_=b",
    ]


def test_streamexpr_metric_tranche(spark):
    """std/per/wsum/countDist metrics in rollup/facet/stats compile to
    the exact aggregate columns."""
    import math

    from solr_spark.plans.streamexpr import eval_expr

    t = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 3.0, 1.0), ("a", 5.0, 1.0), ("b", 4.0, 3.0)],
        "k string, v double, w double",
    )
    got = eval_expr(
        'rollup(search(t), over="k", std(v), per(v, 50), wsum(v, w), countDist(v))',
        {"t": t},
    ).collect()
    r = {x["k"]: x for x in got}
    assert abs(r["a"]["std(v)"] - 2.0) < 1e-12  # stddev_samp of 1,3,5
    assert r["a"]["per(v,50)"] == 3.0
    assert r["a"]["wsum(v,w)"] == 1.0 * 2 + 3.0 + 5.0
    assert r["a"]["countDist(v)"] == 3
    assert r["b"]["std(v)"] is None or math.isnan(r["b"]["std(v)"])


def test_streamexpr_select_computed_fields(spark):
    """select() computed fields (`add(a, b) as c`) and the unary/binary
    evaluator tranche (abs/round/ceil/floor/mod/pow)."""
    from solr_spark.plans.streamexpr import eval_expr

    t = spark.createDataFrame(
        [(1, 2.0, -3.5), (2, 5.0, 1.2)], "k long, a double, b double"
    )
    got = eval_expr(
        'select(search(t), "k", add(a, b) as s, abs(b) as ab, '
        'round(b) as rb, mod(k, 2) as m, pow(a, 2) as p)',
        {"t": t},
    ).collect()
    r = {x["k"]: x for x in got}
    assert r[1]["s"] == -1.5 and r[1]["ab"] == 3.5 and r[1]["p"] == 4.0
    assert r[2]["m"] == 0 and r[1]["m"] == 1
    assert r[1]["rb"] == -4.0 or r[1]["rb"] == -3.0  # HALF_UP vs HALF_EVEN
    # string-form aliases still work alongside computed fields
    got2 = eval_expr('select(search(t), "a as x")', {"t": t}).collect()
    assert {x["x"] for x in got2} == {2.0, 5.0}


def test_rrf_fuse(spark):
    """RRF: score = sum over lists of 1/(k0 + rank); doc in both lists
    beats single-list docs at similar ranks; with_rank cuts then ranks
    under the same ordering."""
    from solr_spark.operators.similarity import rrf_fuse, with_rank

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "docid long, rank int")
    b = spark.createDataFrame([(2, 1), (9, 2)], "docid long, rank int")
    got = {r["docid"]: r["rrf"] for r in rrf_fuse([a, b], k0=60, limit=10).collect()}
    assert abs(got[2] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert abs(got[1] - round(1 / 61, 6)) < 1e-9
    top = rrf_fuse([a, b], limit=1).collect()
    assert top[0]["docid"] == 2  # present in both lists wins

    scored = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(20)], "docid long, sc double"
    )
    r = with_rank(scored, [F.desc("sc"), F.asc("docid")], 5).collect()
    assert [(x["docid"], x["rank"]) for x in r] == [(i, i + 1) for i in range(5)]
