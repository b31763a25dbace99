"""Streaming-expression parser + evaluator: the eval() role.

The reference's streaming expressions are a Lisp-ish function language
parsed by StreamExpressionParser and dispatched through the Lang.java
registry (solrj/src/java/org/apache/solr/client/solrj/io/Lang.java:45-373);
`eval()` (EvalStream.java:38) compiles a tuple-supplied expression string
and streams its result. Here the same surface compiles to a DataFrame:
each stream function maps onto the operators in
solr_spark/operators/streams.py, so the evaluated plan is a normal
Catalyst plan (pushdown/broadcast/AQE all apply — the expression language
is sugar, not an interpreter in the data path).

Supported functions (one per reference stream class):
  search(tbl, q="f1:v1 f2:v2", fl="a,b", sort="a asc")   SearchStream
  select(stream, "a", "b as c")                          SelectStream
  top(n=5, stream, sort="x desc")                        RankStream
  unique(stream, over="a,b")                             UniqueStream
  rollup(stream, over="a", sum(x), count(*), ...)        RollupStream
  innerJoin(l, r, on="k")                                InnerJoinStream
  hashJoin(l, r, on="k")                                 HashJoinStream
  intersect(l, r, on="k")                                IntersectStream
  complement(l, r, on="k")                               ComplementStream
  merge(s1, s2, on="a asc")                              MergeStream
  fetch(tbl, stream, on="k", fl="x,y")                   FetchStream
  priority(high, low)                                    PriorityStream
  nodes(edges, seeds, walk="src->dst", maxDepth=2)       GatherNodesStream
  shortestPath(edges, from=1, to=5, edge="src->dst")     ShortestPathStream
  scoreNodes(stream, freq=tbl, numDocs=N)                ScoreNodesStream
  significantTerms(toks, q="term", minDocFreq=3)         SignificantTermsStream
  timeseries(tbl, field="ts", gap="+1DAY", metrics...)   TimeSeriesStream
  drill(tbl, q=..., over="a", metrics...)                DrillStream
  let(a=stream, ..., expr) / get(a)                      LetStream/GetStream
  tuple(k=v, ...) / echo("s")                            TupStream/EchoStream
  list(s1, s2, ...) / plist(s1, s2, ...)                 ListStream/ParallelListStream
  update(dest, stream) / daemon(update(...), ...)        UpdateStream/DaemonStream
  eval(stream) / executor(stream)                        EvalStream/ExecutorStream
  reduce(stream, by=, group(sort=, n=))                  ReducerStream+GroupOperation
  parallel(coll, stream, workers=, sort=)                ParallelStream
  null(stream) / commit(dest, update(...))               NullStream/CommitStream
  delete(dest, stream, id=)                              DeleteStream
  topic(ckpt, coll, q=, id=)                             TopicStream (one-shot)
  features(coll, field=, outcome=, numTerms=)            FeaturesSelectionStream
  train(coll, features(...), field=, outcome=)           TextLogitStream
  model(path|coll) / classify(model, stream, field=)     ModelStream/ClassifyStream

Metrics inside rollup: sum/avg/min/max(col), count(*), countDist, std,
per(col, P), wsum(col, w).
q= filters are conjunctive `field:value` pairs (+ bare `*:*`); ranges
`field:[a TO b]` are typed off the column.

Evaluators (io.eval.*, Lang.java:130-373) compile to Columns inside
select()/having(): boolean (eq/gt/lt/gteq/lteq/and/or/not/eor/if/
isNull/notNull), arithmetic (add/sub/mult/div/mod/pow + abs/round/ceil/
floor/sqrt/log/ln/log10/precision), string (upper/lower/trim/concat/
split/replace/valueAt), temporal (year..quarter/epoch-millis), and the
math-expression array layer — array/sequence/zeros/ones/natural/addAll/
copyOfRange/rev/asc/desc/length, scalar*/ebe* element-wise ops, unitize/
zscores/rank/movingAvg/diff, mean/var/stddev/median/percentile/
geometricMean/harmonicMean/l1norm/norm, dotProduct/cosineSimilarity/
euclideanDistance/manhattanDistance/corr/cov — each a higher-order-
function Column (transform/zip_with/aggregate/slice), so the
reference's client-side double[] math runs distributed per-row inside
whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOK = re.compile(
    r"\s*(?:(?P<str>\"[^\"]*\")"
    r"|(?P<num>-?\d+\.?\d*)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<punct>[(),=*]))"
)


class StreamExprError(ValueError):
    pass


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOK.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise StreamExprError(f"bad stream expression at {s[i:]!r}")
        i = m.end()
        for k in ("str", "num", "name", "punct"):
            if m.group(k) is not None:
                out.append((k, m.group(k)))
                break
    return out


class Call:
    def __init__(self, name: str):
        self.name = name
        self.args: list = []  # Call | str(ident) | float | quoted str
        self.kwargs: dict[str, object] = {}

    def __repr__(self):
        return f"{self.name}({self.args}, {self.kwargs})"


def parse_expr(s: str) -> Call:
    toks = _lex(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def value():
        nonlocal pos
        k, v = peek()
        pos += 1
        if k == "str":
            return ("lit", v[1:-1])
        if k == "num":
            return ("lit", float(v) if "." in v else int(v))
        if k == "punct" and v == "*":
            return ("ident", "*")
        if k == "name":
            nk, nv = peek()
            if nk == "punct" and nv == "(":
                pos -= 1
                return call()
            if nk == "punct" and nv == "=":
                pos += 1
                return ("kw", v, value())
            return ("ident", v)
        raise StreamExprError(f"unexpected token {v!r}")

    def call() -> Call:
        nonlocal pos
        k, name = peek()
        if k != "name":
            raise StreamExprError(f"expected function name, got {name!r}")
        pos += 1
        k, v = peek()
        if not (k == "punct" and v == "("):
            raise StreamExprError(f"expected '(' after {name}")
        pos += 1
        node = Call(name)
        k, v = peek()
        if not (k == "punct" and v == ")"):
            while True:
                a = value()
                k, v = peek()
                if k == "name" and v == "as":  # `expr as alias`
                    pos += 1
                    k2, alias = peek()
                    if k2 != "name":
                        raise StreamExprError("expected alias name after 'as'")
                    pos += 1
                    a = ("alias", a, alias)
                if isinstance(a, tuple) and a[0] == "kw":
                    node.kwargs[a[1]] = a[2]
                else:
                    node.args.append(a)
                k, v = peek()
                if k == "punct" and v == ",":
                    pos += 1
                    continue
                break
        k, v = peek()
        if not (k == "punct" and v == ")"):
            raise StreamExprError(f"expected ')' closing {name}")
        pos += 1
        return node

    node = call()
    if pos != len(toks):
        raise StreamExprError(f"trailing input in {s!r}")
    return node


# ---- evaluation ----

_RANGE = re.compile(r"^\[(\S+)\s+TO\s+(\S+)\]$")


_CLAUSE = re.compile(r"\S+:\[[^\]]*\]|\S+")


def _q_filter(df: DataFrame, q: str) -> DataFrame:
    # split on whitespace but keep `field:[a TO b]` ranges whole
    for clause in _CLAUSE.findall(q):
        if clause == "*:*":
            continue
        if ":" not in clause:
            raise StreamExprError(f"q clause {clause!r} must be field:value")
        fld, val = clause.split(":", 1)
        m = _RANGE.match(val)
        col = F.col(fld)
        if m:
            lo, hi = m.group(1), m.group(2)
            dt = dict(df.dtypes).get(fld, "string")
            if lo != "*":
                df = df.where(col >= F.lit(lo).cast(dt))
            if hi != "*":
                df = df.where(col <= F.lit(hi).cast(dt))
        else:
            df = df.where(col.cast("string") == val)
    return df


def _sort_cols(spec) -> list[Column]:
    out = []
    for part in str(_unlit(spec)).split(","):
        bits = part.split()
        c = F.col(bits[0])
        out.append(c.desc() if len(bits) > 1 and bits[1].lower() == "desc" else c.asc())
    return out


def _unlit(v):
    return v[1] if isinstance(v, tuple) else v


def _fields(spec) -> list[str]:
    return [f.strip() for f in str(_unlit(spec)).split(",") if f.strip()]


def _metric(node: Call) -> Column:
    arg = node.args[0][1] if node.args else "*"
    name = node.name.lower()
    if name == "count":
        return F.count(F.lit(1)).alias("count(*)")
    if name == "countdist":
        return F.count_distinct(F.col(arg)).alias(f"countDist({arg})")
    if name == "std":
        return F.stddev_samp(F.col(arg)).alias(f"std({arg})")
    if name == "per":
        # per(col, P) — the percentile metric (io.stream.metrics
        # PercentileMetric); exact, like the facet percentile path
        p = float(_unlit(node.args[1])) / 100.0
        return F.percentile(F.col(arg), F.lit(p)).alias(
            f"per({arg},{int(p * 100)})"
        )
    if name == "wsum":
        # wsum(col, weightCol) — WeightedSumMetric
        warg = node.args[1][1]
        return F.sum(F.col(arg) * F.col(warg)).alias(f"wsum({arg},{warg})")
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}.get(name)
    if fn is None:
        raise StreamExprError(f"unknown metric {node.name!r}")
    return fn(F.col(arg)).alias(f"{name}({arg})")


def eval_expr(expr: str | Call, tables: dict[str, DataFrame]) -> DataFrame:
    """Evaluate a streaming expression against named tables (the
    collection registry)."""
    node = parse_expr(expr) if isinstance(expr, str) else expr
    return _eval(node, tables)


def _eval(node, tables) -> DataFrame:
    if isinstance(node, tuple):
        if node[0] == "ident" and node[1] in tables:
            return tables[node[1]]
        raise StreamExprError(f"not a stream: {node!r}")
    from solr_spark.operators import streams as S

    name = node.name
    kw = node.kwargs
    if name == "search":
        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        fl = _fields(kw["fl"]) if "fl" in kw else df.columns
        sort = _sort_cols(kw["sort"]) if "sort" in kw else []
        return S.search(df, None, sort, fl) if sort else df.select(*fl)
    if name == "select":
        df = _eval(node.args[0], tables)
        cols = []
        for a in node.args[1:]:
            if isinstance(a, tuple) and a[0] == "alias":
                # computed field: select(stream, add(a, b) as c) —
                # SelectStream with an evaluator (io.eval.*) expression
                cols.append(_bool_eval(a[1]).alias(a[2]))
                continue
            spec = str(_unlit(a))
            if " as " in spec:
                src, dst = spec.split(" as ")
                cols.append(F.col(src.strip()).alias(dst.strip()))
            else:
                cols.append(F.col(spec.strip()))
        return df.select(*cols)
    if name == "top":
        df = _eval(node.args[0], tables)
        return S.top(df, _sort_cols(kw["sort"]), int(_unlit(kw["n"])))
    if name == "unique":
        return S.unique(_eval(node.args[0], tables), _fields(kw["over"]))
    if name == "rollup":
        df = _eval(node.args[0], tables)
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Call)]
        return S.rollup(df, _fields(kw["over"]), metrics)
    if name in ("innerJoin", "hashJoin", "intersect", "complement", "merge"):
        left = _eval(node.args[0], tables)
        right = _eval(node.args[1], tables)
        if name == "innerJoin":
            return S.inner_join(left, right, _fields(kw["on"]))
        if name == "hashJoin":
            return S.hash_join(left, right, _fields(kw["on"]))
        if name == "intersect":
            return S.intersect_on(left, right, _fields(kw["on"]))
        if name == "complement":
            return S.complement_on(left, right, _fields(kw["on"]))
        return S.merge_streams([left, right], _sort_cols(kw["on"]))
    if name == "fetch":
        tbl = node.args[0][1]
        df = _eval(node.args[1], tables)
        return S.fetch(df, tables[tbl], _fields(kw["on"]), _fields(kw["fl"]))
    if name == "priority":
        return priority_stream(
            _eval(node.args[0], tables), _eval(node.args[1], tables)
        )
    if name == "having":
        # having(stream, booleanEvaluator) — HavingStream.java; the
        # evaluator tree (eq/gt/lt/gteq/lteq/and/or/not over fields,
        # numbers, and arithmetic) compiles to one filter Column
        df = _eval(node.args[0], tables)
        return df.where(_bool_eval(node.args[1]))
    if name == "sort":
        # sort(stream, by="f asc,...") — full re-sort (SortStream.java
        # materializes and sorts; Spark's orderBy is the same barrier)
        df = _eval(node.args[0], tables)
        return df.orderBy(*_sort_cols(kw["by"]))
    if name in ("leftOuterJoin", "outerHashJoin"):
        left = _eval(node.args[0], tables)
        right = _eval(node.args[1], tables)
        on = _fields(kw["on"])
        if name == "outerHashJoin":  # hash-side broadcast, like hashJoin
            from pyspark.sql.functions import broadcast as _bc

            right = _bc(right)
        return left.join(right, on, "left")
    if name == "cartesianProduct":
        df = _eval(node.args[0], tables)
        return S.cartesian_product(df, str(_unlit(node.args[1])))
    if name == "facet":
        # facet(collection, buckets="a,b", metric(), ...) — push the
        # grouped agg down (FacetStream.java sends a JSON facet)
        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        buckets = _fields(kw["buckets"])
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Call)]
        return df.groupBy(*buckets).agg(*metrics).orderBy(*buckets)
    if name == "stats":
        # stats(collection, metric(), ...) — one global aggregate row
        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Call)]
        return df.agg(*metrics)
    if name == "random":
        # random(collection, rows=N) — deterministic sample: hash-order
        # the rows (RandomStream.java uses a random sort; a seeded hash
        # keeps replays identical, the repo-wide determinism contract)
        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        n = int(_unlit(kw["rows"])) if "rows" in kw else 10
        return df.orderBy(F.md5(F.concat_ws("\x1f", *df.columns))).limit(n)
    if name in ("nodes", "gatherNodes"):
        # nodes(edges, <seeds>, walk="srcCol->dstCol", maxDepth=N) —
        # GatherNodesStream.java; the walk names the edge columns, the
        # inner stream's FIRST column supplies the seed ids
        from solr_spark.operators import graph as G

        edges_tbl = node.args[0][1]
        if edges_tbl not in tables:
            raise StreamExprError(f"unknown collection {edges_tbl!r}")
        src_c, dst_c = str(_unlit(kw["walk"])).split("->")
        edges = tables[edges_tbl].select(
            F.col(src_c.strip()).alias("src"), F.col(dst_c.strip()).alias("dst")
        )
        seeds_df = _eval(node.args[1], tables)
        seeds = seeds_df.select(F.col(seeds_df.columns[0]).alias("node"))
        hops = int(_unlit(kw["maxDepth"])) if "maxDepth" in kw else 1
        return G.gather_nodes(edges, seeds, hops)
    if name == "shortestPath":
        # shortestPath(edges, from=a, to=b, edge="src->dst", maxDepth=N) —
        # BFS level = min #edges (ShortestPathStream.java); `to` filters
        # the reached set to the destination's (node, dist) row
        from solr_spark.operators import graph as G

        edges_tbl = node.args[0][1]
        if edges_tbl not in tables:
            raise StreamExprError(f"unknown collection {edges_tbl!r}")
        spec = str(_unlit(kw.get("edge", ("lit", "src->dst"))))
        src_c, dst_c = (spec.split("->") if "->" in spec else spec.split("="))
        edges = tables[edges_tbl].select(
            F.col(src_c.strip()).alias("src"), F.col(dst_c.strip()).alias("dst")
        )
        depth = int(_unlit(kw["maxDepth"])) if "maxDepth" in kw else 6
        out = G.bfs_shortest_path(edges, int(_unlit(kw["from"])), depth)
        if "to" in kw:
            out = out.where(F.col("node") == int(_unlit(kw["to"])))
        return out
    if name == "scoreNodes":
        # scoreNodes(<nodes>, freq=tbl, numDocs=N[, count="col"]) — the
        # docFreq side is the registered (node, df) frequency table the
        # reference fetches from the terms component
        from solr_spark.operators import graph as G

        inner = _eval(node.args[0], tables)
        freq_tbl = str(_unlit(kw["freq"]))
        if freq_tbl not in tables:
            raise StreamExprError(f"unknown collection {freq_tbl!r}")
        count_col = str(_unlit(kw["count"])) if "count" in kw else "count(*)"
        return G.score_nodes(
            inner, tables[freq_tbl], int(_unlit(kw["numDocs"])), count_col
        )
    if name == "significantTerms":
        # significantTerms(toks, q="term", minDocFreq=3, limit=15) over a
        # (docid, toks) collection — SignificantTermsStream.java
        from solr_spark.operators import relevance as R

        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        return R.significant_terms(
            tables[tbl],
            str(_unlit(kw["q"])),
            int(_unlit(kw["minDocFreq"])) if "minDocFreq" in kw else 3,
            int(_unlit(kw["limit"])) if "limit" in kw else 15,
        )
    if name == "timeseries":
        # timeseries(tbl, q=..., field="ts", gap="+1DAY", metrics...) —
        # Solr gap syntax maps onto date_trunc units
        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        gap = str(_unlit(kw.get("gap", ("lit", "+1DAY"))))
        unit = _GAP_UNITS.get(gap.upper(), gap.lower())
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Call)]
        return S.timeseries(df, str(_unlit(kw["field"])), unit, metrics)
    if name == "drill":
        # drill(tbl, q=..., over="a,b", metrics...) — DrillStream exports
        # per-shard and rolls up partials; Catalyst's partial aggregation
        # (map-side combine before the exchange) IS that plan, so drill
        # compiles to the same grouped agg as facet()
        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        buckets = _fields(kw["over"])
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Call)]
        return df.groupBy(*buckets).agg(*metrics).orderBy(*buckets)
    if name in ("shuffle", "export"):
        # ShuffleStream / the /export handler: both are the full sorted
        # sweep — search without the top-k score merge. Spark's scan IS
        # the sweep; a sort= lands in a global orderBy (range-partition
        # exchange), fl= prunes columns at the parquet reader.
        node2 = Call("search")
        node2.args, node2.kwargs = node.args, node.kwargs
        return _eval(node2, tables)
    if name == "noop":
        # NoOpStream.java — identity passthrough (used to defeat
        # wrapper-detection in parallel plans)
        return _eval(node.args[0], tables)
    if name == "sql":
        # ParallelSQL ({!sql} / SqlHandler): the registry's tables are
        # exposed as temp views and the statement runs through Catalyst
        # — the reference hands SQL to Calcite over streaming sources;
        # Spark's own SQL layer is the same role with a real optimizer.
        stmt = str(_unlit(kw["stmt"] if "stmt" in kw else node.args[0]))
        spark = _any_session(tables)
        for k, v in tables.items():
            if isinstance(v, DataFrame) and re.fullmatch(r"\w+", k):
                v.createOrReplaceTempView(k)
        return spark.sql(stmt)
    if name == "calc":
        # CalculatorStream: a one-tuple, zero-field source; evaluator
        # fields are added by the enclosing select(calc(), expr as x)
        return _any_session(tables).range(1).select()
    if name == "hashRollup":
        # HashRollupStream — same contract as rollup() without the
        # sorted-input requirement; Spark's groupBy is already the
        # hash-partial+final shape, so both names compile identically.
        df = _eval(node.args[0], tables)
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Call)]
        return S.rollup(df, _fields(kw["over"]), metrics)
    if name == "facet2D":
        # Facet2DStream: top-X x-buckets, each with its top-Y y-buckets
        # by the metric (dimensions="X,Y"). One grouped agg + two window
        # ranks — no per-bucket refinement round-trips.
        from pyspark.sql.window import Window

        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        xf, yf = str(_unlit(kw["x"])), str(_unlit(kw["y"]))
        dx, dy = (int(v) for v in str(_unlit(kw["dimensions"])).split(","))
        mnodes = [a for a in node.args[1:] if isinstance(a, Call)]
        metric = _metric(mnodes[0]) if mnodes else F.count(F.lit(1)).alias("count(*)")
        cells = df.groupBy(xf, yf).agg(metric)
        mcol = cells.columns[-1]
        xtot = (
            cells.groupBy(xf)
            .agg(F.sum(mcol).alias("_xtot"))
            .orderBy(F.desc("_xtot"), xf)
            .limit(dx)
        )
        ranked = cells.join(F.broadcast(xtot), xf).withColumn(
            "_yrank",
            F.row_number().over(
                Window.partitionBy(xf).orderBy(F.desc(mcol), yf)
            ),
        )
        return (
            ranked.where(F.col("_yrank") <= dy)
            .orderBy(F.desc("_xtot"), xf, F.desc(mcol), yf)
            .select(xf, yf, mcol)
        )
    if name == "recNum":
        # RecNumStream: a 0-based record number in stream order. Stream
        # order must be explicit in a distributed plan — by= names the
        # sort (defaults to every column ascending), and the row_number
        # window is the single-ordering barrier the reference's
        # sequential counter implies.
        from pyspark.sql.window import Window

        df = _eval(node.args[0], tables)
        by = _sort_cols(kw["by"]) if "by" in kw else [
            F.col(c).asc() for c in df.columns
        ]
        return df.withColumn(
            "recNum", F.row_number().over(Window.orderBy(*by)) - 1
        )
    if name in ("parseCSV", "parseTSV"):
        # CsvStream/TsvStream: parse a `line` field into typed-as-string
        # fields. Over cat(): compiles to the native reader
        # (spark.read.csv with header) — the scan parses, no Python.
        # Over a generic stream: fields= names the columns and the line
        # splits on the delimiter (quoted-comma handling deferred to the
        # native reader path, as documented).
        sep = "," if name == "parseCSV" else "\t"
        inner = node.args[0]
        if isinstance(inner, Call) and inner.name == "cat":
            path = str(_unlit(inner.args[0]))
            spark = _any_session(tables)
            return spark.read.option("header", True).option("sep", sep).csv(path)
        df = _eval(inner, tables)
        cols = _fields(kw["fields"])
        parts = F.split(F.col("line"), re.escape(sep))
        return df.select(
            *[F.element_at(parts, i + 1).alias(c) for i, c in enumerate(cols)]
        )
    if name == "cat":
        # CatStream: emit (file, line) tuples from files under a path —
        # spark.read.text with input_file_name, the distributed cat.
        path = str(_unlit(node.args[0]))
        spark = _any_session(tables)
        return (
            spark.read.text(path)
            .select(
                F.input_file_name().alias("file"),
                F.col("value").alias("line"),
            )
        )
    if name in ("putCache", "getCache", "removeCache", "listCache"):
        # stream caches (Lang: putCache/getCache/removeCache/listCache)
        # — a driver-side registry keyed (space, key), holding
        # MATERIALIZED streams (the reference caches tuple lists on the
        # node; here the cached object is a cached DataFrame, so reuse
        # skips recompute but stays distributed).
        cache = tables.setdefault("__cache__", {})
        spark = _any_session(tables)
        space = str(_unlit(node.args[0]))
        if name == "listCache":
            keys = sorted(k for s, k in cache if s == space) or []
            return spark.createDataFrame([(k,) for k in keys], "key string")
        key = str(_unlit(node.args[1]))
        if name == "putCache":
            df = _eval(node.args[2], tables).cache()
            n = df.count()
            old = cache.get((space, key))
            if old is not None:
                old.unpersist()
            cache[(space, key)] = df
            return spark.createDataFrame([(int(n),)], "cached long")
        if name == "getCache":
            df = cache.get((space, key))
            if df is None:
                raise StreamExprError(f"cache miss: {space}/{key}")
            return df
        df = cache.pop((space, key), None)
        if df is not None:
            df.unpersist()
        return spark.createDataFrame(
            [(1 if df is not None else 0,)], "removed long"
        )
    if name == "knnSearch":
        # KnnStream (knnSearch): MoreLikeThis over the registry — the
        # target doc's terms weighted by idf pick the interesting terms,
        # then docs score by summed matching-term idf. Two shuffles
        # (token df agg + score agg); the target-doc term seek is one
        # broadcast-sized collect, like the MLT handler's single-doc
        # term vector fetch.
        tbl = node.args[0][1]
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        idf_, qf = str(_unlit(kw["id"])), str(_unlit(kw["qf"]))
        k = int(_unlit(kw.get("k", 10)))
        n_terms = int(_unlit(kw.get("mintf", 0)) or 0) or 5
        idc = df.columns[0] if "id" not in df.columns else "id"
        toks = df.select(
            F.col(idc).alias("_kid"),
            F.explode(
                F.split(F.lower(F.col(qf)), r"[^a-z0-9]+")
            ).alias("term"),
        ).where(F.col("term") != "")
        n_docs = df.count()
        dfreq = toks.groupBy("term").agg(
            F.count_distinct("_kid").alias("df")
        )
        target = (
            toks.where(F.col("_kid") == idf_)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .join(dfreq, "term")
            .withColumn(
                "w",
                F.col("tf")
                * F.log(
                    (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                ),
            )
            .orderBy(F.desc("w"), "term")
            .limit(n_terms)
        )
        scored = (
            toks.where(F.col("_kid") != idf_)
            .distinct()
            .join(F.broadcast(target.select("term", "w")), "term")
            .groupBy("_kid")
            .agg(F.round(F.sum("w"), 6).alias("score"))
            .orderBy(F.desc("score"), "_kid")
            .limit(k)
            .select(F.col("_kid").alias(idc), "score")
        )
        return scored
    if name == "let":
        # let(a=<stream>, b=<stream>, <expr>) — binds names for the body
        # (LetStream.java); bindings see earlier bindings, body sees all
        scoped = dict(tables)
        for k, v in node.kwargs.items():
            scoped[k] = _eval(v, scoped)
        if len(node.args) != 1:
            raise StreamExprError("let() takes bindings plus ONE body stream")
        return _eval(node.args[0], scoped)
    if name == "get":
        return _eval(node.args[0], tables)
    if name == "tuple":
        # tuple(k=1, s="x") — one literal row (TupStream)
        spark = _any_session(tables)
        names = list(node.kwargs)
        row = tuple(_unlit(v) for v in node.kwargs.values())
        return spark.createDataFrame([row], names)
    if name == "echo":
        spark = _any_session(tables)
        return spark.createDataFrame([(str(_unlit(node.args[0])),)], ["echo"])
    if name == "cell":
        # CellStream: materializes the inner stream's tuples into ONE
        # tuple holding them as a list field — the let()-side bridge
        # from streams to math-expression arrays. Here: a 1-row frame
        # with an array<struct> column; collect_list is the
        # materialization, so the cell stays size-bounded by design
        # (the reference also holds the whole list on one node).
        label = str(_unlit(node.args[0]))
        inner = _eval(node.args[1], tables)
        return inner.agg(
            F.collect_list(F.struct(*inner.columns)).alias(label)
        )
    if name in ("list", "plist"):
        # list() drains streams in order; plist() runs them in parallel
        # but still emits in list order — batch shape: an ordered tagged
        # union (Spark executes the branches concurrently anyway).
        # Guarantee: stream-BLOCK order; intra-stream order follows the
        # inner stream's own sort, as in the reference
        dfs = [_eval(a, tables) for a in node.args]
        out = None
        for i, df in enumerate(dfs):
            tagged = df.withColumn("_stream", F.lit(i))
            out = tagged if out is None else out.unionByName(
                tagged, allowMissingColumns=True
            )
        return out.orderBy("_stream").drop("_stream")
    if name == "update":
        # update(dest, <stream>) — the indexing sink (UpdateStream.java).
        # A quoted dest is a parquet path (append); a bare identifier
        # registers the materialized stream as a new collection in the
        # registry. Emits the batch summary tuple. This is an ACTION:
        # the write/materialization runs at eval time.
        dest = node.args[0]
        df = _eval(node.args[1], tables)
        spark = df.sparkSession
        if dest[0] == "lit":  # quoted path
            df.write.mode("append").parquet(str(dest[1]))
            n = spark.read.parquet(str(dest[1])).count()
        else:
            df = df.cache()
            n = df.count()
            tables[str(dest[1])] = df
        return spark.createDataFrame([(int(n),)], "batchIndexed long")
    if name == "daemon":
        # daemon(<update(...)>, id=, runInterval=) — one-shot drain form:
        # evaluate the wrapped update now and emit its summary (the
        # resident wake-every-interval form is streaming/topic.run_daemon)
        return _eval(node.args[0], tables)
    if name == "eval":
        # eval(<stream>) — EvalStream.java:38: read the FIRST tuple's
        # expr_s field, compile it, and stream ITS result (driver reads
        # one row to fetch the expression string)
        inner = _eval(node.args[0], tables)
        first = inner.select("expr_s").first()
        if first is None:
            raise StreamExprError("eval(): inner stream is empty")
        return _eval(parse_expr(str(first["expr_s"])), tables)
    if name == "executor":
        # executor(<stream>[, threads=N]) — ExecutorStream.java: run
        # EVERY tuple's expr_s expression (typically update(...) jobs)
        # and emit one summary tuple per task. The expression strings are
        # collected to the driver (the reference's task queue is likewise
        # driver-side and bounded); each compiled job is a distributed
        # Spark plan, and threads=N runs N of them concurrently — Spark's
        # scheduler interleaves the independent jobs across task slots,
        # so the thread pool is the ExecutorStream worker-pool analogue.
        inner = _eval(node.args[0], tables)
        rows = inner.select("expr_s").collect()
        if not rows:
            raise StreamExprError("executor(): inner stream is empty")
        spark = inner.sparkSession
        n_threads = int(_unlit(kw.get("threads", 1)) or 1)

        def _one(expr_s: str) -> tuple[str, int]:
            return expr_s, int(_eval(parse_expr(expr_s), tables).count())

        exprs = [str(r["expr_s"]) for r in rows]
        if n_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=n_threads) as pool:
                out = list(pool.map(_one, exprs))
        else:
            out = [_one(e) for e in exprs]
        return spark.createDataFrame(out, "expr_s string, rows long")
    if name == "reduce":
        # reduce(stream, by="k", group(sort="x desc", n=4)) —
        # ReducerStream + GroupOperation (io/stream/ReducerStream.java,
        # io/ops/GroupOperation.java): partition by the key, keep each
        # group's top-n under the group sort. Compiles to ONE window
        # (no applyInPandas — the group op here is expressible as
        # row_number, so it stays in codegen; arbitrary Python group ops
        # are operators.streams.reduce_groups)
        from pyspark.sql import Window

        df = _eval(node.args[0], tables)
        by = _fields(kw["by"])
        group = next(
            (a for a in node.args[1:] if isinstance(a, Call) and a.name == "group"),
            None,
        )
        if group is None:
            raise StreamExprError("reduce() needs a group(sort=..., n=...) op")
        gsort = _sort_cols(group.kwargs["sort"])
        gn = int(_unlit(group.kwargs["n"])) if "n" in group.kwargs else 1
        w = Window.partitionBy(*by).orderBy(*gsort)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= gn)
            .drop("_rn")
            .orderBy(*[F.col(b).asc() for b in by], *gsort)
        )
    if name == "parallel":
        # parallel(coll, stream, workers=N, sort=...) — ParallelStream
        # fans the wrapped stream over N workers; Spark's executors ARE
        # the workers (partition parallelism), so the compile is the
        # inner plan plus the declared re-sort barrier
        inner = next((a for a in node.args if isinstance(a, Call)), None)
        if inner is None:
            raise StreamExprError("parallel() needs a wrapped stream")
        df = _eval(inner, tables)
        return df.orderBy(*_sort_cols(kw["sort"])) if "sort" in kw else df
    if name == "null":
        # null(stream) — NullStream: drain the inner stream, emit ONE
        # tuple with the drained count (the reference's parallel-warmup
        # utility; the count() action is the drain)
        df = _eval(node.args[0], tables)
        n = df.count()
        return df.sparkSession.createDataFrame([(int(n),)], "nullCount long")
    if name == "commit":
        # commit(dest, stream, batchSize=...) — CommitStream wraps an
        # update() and issues the commit. Writes here publish via atomic
        # snapshot/rename at update() time, so commit is the pass-through
        # acknowledgement of the wrapped stream's summary
        inner = next((a for a in node.args if isinstance(a, Call)), None)
        if inner is None:
            raise StreamExprError("commit() needs a wrapped stream")
        return _eval(inner, tables)
    if name == "delete":
        # delete(dest, stream, id="docid") — DeleteStream: delete-by-id
        # into the dest collection. The registry form anti-joins the id
        # set out of the registered table and re-registers it (the
        # index-backed form is index.maintenance.delete_by_df); emits the
        # batch summary like update()
        dest = str(_unlit(node.args[0]))
        if dest not in tables:
            raise StreamExprError(f"unknown collection {dest!r}")
        df = _eval(node.args[1], tables)
        id_col = str(_unlit(kw.get("id", ("lit", "id"))))
        ids = df.select(F.col(id_col)).distinct()
        before = tables[dest].count()
        kept = tables[dest].join(F.broadcast(ids), id_col, "left_anti").cache()
        n_kept = kept.count()
        tables[dest] = kept
        return df.sparkSession.createDataFrame(
            [(int(before - n_kept),)], "totalDeleted long"
        )
    if name == "topic":
        # topic(checkpoints, coll, q=..., id="docid") — TopicStream's
        # batch one-shot: deliver rows the checkpoint set hasn't seen,
        # then advance the checkpoint (register the delivered ids). The
        # reference tracks per-shard _version_ highwater marks in a
        # checkpoint collection; the registry form keeps the seen-id set
        # as that collection (directory-growth topics are
        # streaming/topic.topic_stream)
        ckpt, coll = str(_unlit(node.args[0])), str(_unlit(node.args[1]))
        if coll not in tables:
            raise StreamExprError(f"unknown collection {coll!r}")
        id_col = str(_unlit(kw.get("id", ("lit", "docid"))))
        df = tables[coll]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        if ckpt in tables:
            df = df.join(
                F.broadcast(tables[ckpt].select(id_col)), id_col, "left_anti"
            )
        delivered = df.cache()
        delivered.count()
        seen = delivered.select(id_col)
        tables[ckpt] = (
            tables[ckpt].select(id_col).unionByName(seen).distinct().cache()
            if ckpt in tables
            else seen.cache()
        )
        return delivered
    if name == "features":
        # features(coll, field="toks", outcome="label", numTerms=N) —
        # FeaturesSelectionStream: top terms by information gain
        from solr_spark.operators import ml as ML

        tbl = str(_unlit(node.args[0]))
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        if "q" in kw:
            df = _q_filter(df, str(_unlit(kw["q"])))
        field = str(_unlit(kw.get("field", ("lit", "toks"))))
        outcome = str(_unlit(kw.get("outcome", ("lit", "label"))))
        n_terms = int(_unlit(kw["numTerms"])) if "numTerms" in kw else 10
        min_df = int(_unlit(kw["minDocFreq"])) if "minDocFreq" in kw else 5
        toks = df.select("docid", F.col(field).alias("toks"))
        labels = df.select("docid", F.col(outcome).alias("label"))
        return ML.igain_terms(toks, labels, limit=n_terms, min_df=min_df)
    if name == "train":
        # train(coll, features(...), field=, outcome=, maxIterations=) —
        # TextLogitStream: logistic regression over the selected term-
        # presence features; emits the model as (term_s, weight_d) rows
        # plus the intercept row, the reference's model-tuple shape
        from solr_spark.operators import ml as ML

        tbl = str(_unlit(node.args[0]))
        if tbl not in tables:
            raise StreamExprError(f"unknown collection {tbl!r}")
        df = tables[tbl]
        feats_node = next(
            (a for a in node.args[1:] if isinstance(a, Call)), None
        )
        if feats_node is not None:
            feats = [
                r["term"] for r in _eval(feats_node, tables).collect()
            ]
        elif "features" in kw:
            feats = _fields(kw["features"])
        else:
            raise StreamExprError("train() needs features(...) or features=")
        field = str(_unlit(kw.get("field", ("lit", "toks"))))
        outcome = str(_unlit(kw.get("outcome", ("lit", "label"))))
        max_iter = (
            int(_unlit(kw["maxIterations"])) if "maxIterations" in kw else 30
        )
        toks = df.select("docid", F.col(field).alias("toks"))
        labels = df.select("docid", F.col(outcome).alias("label"))
        model, _ = ML.textlogit_train(toks, labels, feats, max_iter=max_iter)
        spark = df.sparkSession
        rows = [
            (t, float(w)) for t, w in zip(feats, model.coefficients.toArray())
        ] + [("__intercept__", float(model.intercept))]
        return spark.createDataFrame(rows, "term_s string, weight_d double")
    if name == "model":
        # model(path | coll, id=...) — ModelStream: fetch a stored
        # model's tuples. A quoted arg is a model_store parquet path; a
        # bare identifier is a registered (term_s, weight_d) table
        dest = node.args[0]
        if dest[0] == "lit":
            spark = _any_session(tables)
            return spark.read.parquet(str(dest[1]))
        if str(dest[1]) not in tables:
            raise StreamExprError(f"unknown model collection {dest[1]!r}")
        return tables[str(dest[1])]
    if name == "classify":
        # classify(model(...), stream, field="toks") — ClassifyStream:
        # score each tuple with the fetched logistic model. The model is
        # tiny (feature-count rows) so it collects to the driver and the
        # score compiles to pure Column arithmetic: sigmoid(b + Σ w_t ·
        # presence(t)) — whole-stage codegen, no per-row Python
        model_df = _eval(node.args[0], tables)
        docs = _eval(node.args[1], tables)
        field = str(_unlit(kw.get("field", ("lit", "toks"))))
        rows = {r[0]: float(r[1]) for r in model_df.collect()}
        b = rows.pop("__intercept__", 0.0)
        z = F.lit(b)
        for t, w in sorted(rows.items()):
            z = z + F.when(
                F.array_contains(F.col(field), t), F.lit(w)
            ).otherwise(F.lit(0.0))
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        return docs.withColumn("probability_d", prob).withColumn(
            "prediction_i", (prob > 0.5).cast("int")
        )
    raise StreamExprError(f"unknown stream function {name!r}")


#: Solr timeseries gap -> date_trunc unit
_GAP_UNITS = {
    "+1SECOND": "second", "+1MINUTE": "minute", "+1HOUR": "hour",
    "+1DAY": "day", "+7DAYS": "week", "+1WEEK": "week",
    "+1MONTH": "month", "+1YEAR": "year",
}


def _any_session(tables):
    for df in tables.values():
        return df.sparkSession
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        raise StreamExprError("tuple()/echo() need a registered table or an active session")
    return s


#: boolean/arithmetic evaluator names (io.eval.* — the subset the
#: HavingStream doc examples use; raw field names and numbers pass
#: through)
_EVAL_BOOL = {
    "eq": lambda a, b: a == b, "gt": lambda a, b: a > b,
    "lt": lambda a, b: a < b, "gteq": lambda a, b: a >= b,
    "lteq": lambda a, b: a <= b,
}
_EVAL_ARITH = {
    "add": lambda a, b: a + b, "sub": lambda a, b: a - b,
    "mult": lambda a, b: a * b, "div": lambda a, b: a / b,
    "mod": lambda a, b: a % b, "pow": lambda a, b: a ** b,
}
_EVAL_UNARY = {
    "abs": F.abs, "round": F.round, "ceil": F.ceil, "floor": F.floor,
    "sqrt": F.sqrt, "log": F.log, "ln": F.log, "log10": F.log10,
    # trig/hyperbolic tranche (Lang.java registers the commons-math
    # wrappers Sin/Cos/.../TanhEvaluator; scalar form — the reference
    # also maps them over lists, which here is transform(arr, sin))
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "cbrt": F.cbrt,
    # RecipEvaluator: commons-math Inverse, 1/x
    "recip": lambda c: _jdiv(F.lit(1.0), c.cast("double")),
}
#: string evaluators (Lang.java:130-373 registry: UpperEvaluator,
#: LowerEvaluator, TrimEvaluator, SplitEvaluator, ReplaceOperator...)
_EVAL_STR_UNARY = {
    "upper": F.upper, "lower": F.lower, "trim": F.trim,
    "ltrim": F.ltrim, "rtrim": F.rtrim,
}
#: temporal evaluators (TemporalEvaluatorYear & friends; Solr returns
#: Integer parts and epoch MILLISECONDS)
_EVAL_TEMPORAL = {
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "dayOfYear": F.dayofyear, "hour": F.hour, "minute": F.minute,
    "second": F.second, "week": F.weekofyear, "quarter": F.quarter,
    # Instant.toEpochMilli — true milliseconds, not seconds*1000
    "epoch": F.unix_millis,
}


# ---- math/array evaluators (tranche 5) ----
#
# The reference's math-expression layer (Lang.java:130-373 registers the
# io.eval.* classes: ArrayEvaluator, SequenceEvaluator, MeanEvaluator,
# VarianceEvaluator, PercentileEvaluator, DotProductEvaluator,
# CosineSimilarityEvaluator, EuclideanDistanceEvaluator, ScalarAdd/.../
# EbeAdd/..., NormalizeEvaluator, MovingAverageEvaluator,
# CorrelationEvaluator, CovarianceEvaluator, RankEvaluator, ...) runs
# single-node on the client JVM over materialized tuples. Here each
# evaluator compiles to a Spark HIGHER-ORDER-FUNCTION Column over array
# fields — transform/zip_with/aggregate/slice stay inside codegen, so
# "client-side math" becomes distributed per-row math with no Python in
# the data path. All numeric array ops compute in double, like the
# reference's double[] pipelines.

def _as_d(c: Column) -> Column:
    return c.cast("double")


def _arr_d(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def _asum(a: Column) -> Column:
    """Left-to-right double sum of an array (Kahan-free, matching the
    reference's sequential loop — and the documented arithmetic order the
    DuckDB oracle twins mirror)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def _amean(a: Column) -> Column:
    return _jdiv(_asum(a), F.size(a).cast("double"))


def _avariance(a: Column) -> Column:
    """Sample variance, commons-math Variance (bias-corrected):
    (Σx² − n·mean²) / (n−1)."""
    n = F.size(a).cast("double")
    m = _amean(a)
    sumsq = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    # commons-math Variance: a single value has zero variance (not NaN)
    return F.when(F.size(a) == 1, F.lit(0.0)).otherwise(
        _jdiv(sumsq - n * m * m, n - F.lit(1.0))
    )


def _apercentile(a: Column, p: Column) -> Column:
    """commons-math Percentile LEGACY estimation (what the reference's
    PercentileEvaluator news up): pos = p·(n+1)/100 over the sorted
    values; pos<1 → min, pos≥n → max, else linear interpolation between
    the two straddled order statistics."""
    s = F.array_sort(_arr_d(a))
    n = F.size(a).cast("double")
    pos = p.cast("double") * (n + F.lit(1.0)) / F.lit(100.0)
    k = F.floor(pos).cast("int")
    d = pos - F.floor(pos)
    lower = F.element_at(s, k)
    upper = F.element_at(s, k + F.lit(1))
    return (
        F.when(pos < 1.0, F.element_at(s, 1))
        .when(pos >= n, F.element_at(s, F.size(a)))
        .otherwise(lower + d * (upper - lower))
    )


def _adot(a: Column, b: Column) -> Column:
    return _asum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def _jdiv(num: Column, den: Column) -> Column:
    """Java-double division semantics for the evaluator layer: x/0 is
    ±Infinity (NaN for 0/0), matching the reference's double[] math —
    Spark's ANSI mode would otherwise abort the whole job on one
    degenerate row (e.g. corr() against a constant array)."""
    import math

    return (
        F.when(
            den == 0.0,
            F.when(num > 0, F.lit(math.inf))
            .when(num < 0, F.lit(-math.inf))
            .otherwise(F.lit(math.nan)),
        )
        .otherwise(num / F.when(den == 0.0, F.lit(1.0)).otherwise(den))
    )


def _al2(a: Column) -> Column:
    return F.sqrt(_adot(a, a))


def _math_eval(name: str, node) -> Column | None:
    """Array/statistical evaluator dispatch; None = not a math name."""
    A = lambda i: _bool_eval(node.args[i])  # noqa: E731

    # construction
    if name == "array":
        return F.array(*[_bool_eval(a) for a in node.args])
    if name == "sequence":
        # sequence(length, start, stride) — SequenceEvaluator arg order
        ln, st, sd = A(0).cast("long"), A(1).cast("long"), A(2).cast("long")
        return F.transform(
            F.sequence(F.lit(0).cast("long"), ln - 1), lambda i: st + i * sd
        )
    if name == "zeros":
        return F.array_repeat(F.lit(0.0), A(0).cast("int"))
    if name == "ones":
        return F.array_repeat(F.lit(1.0), A(0).cast("int"))
    if name == "natural":
        return F.transform(
            F.sequence(F.lit(0), A(0).cast("int") - 1),
            lambda i: i.cast("double"),
        )
    if name == "addAll":
        return F.concat(*[_bool_eval(a) for a in node.args])
    if name == "copyOfRange":
        # copyOfRange(arr, start, end) — 0-based [start, end)
        start, end = A(1).cast("int"), A(2).cast("int")
        return F.slice(A(0), start + 1, end - start)
    if name == "rev":
        return F.reverse(A(0))
    if name == "asc":
        return F.array_sort(A(0))
    if name == "desc":
        return F.reverse(F.array_sort(A(0)))
    if name == "length":
        return F.size(A(0))

    # element-wise (scalar op array / array op array)
    if name in ("scalarAdd", "scalarSubtract", "scalarMultiply", "scalarDivide"):
        k = _as_d(A(0))  # scalarAdd(value, array) arg order
        op = {
            "scalarAdd": lambda x: x + k,
            "scalarSubtract": lambda x: x - k,
            "scalarMultiply": lambda x: x * k,
            "scalarDivide": lambda x: _jdiv(x, k),
        }[name]
        return F.transform(A(1), lambda x: op(x.cast("double")))
    if name in ("ebeAdd", "ebeSubtract", "ebeMultiply", "ebeDivide"):
        op = {
            "ebeAdd": lambda x, y: x + y,
            "ebeSubtract": lambda x, y: x - y,
            "ebeMultiply": lambda x, y: x * y,
            "ebeDivide": lambda x, y: _jdiv(x, y),
        }[name]
        return F.zip_with(
            A(0), A(1), lambda x, y: op(x.cast("double"), y.cast("double"))
        )
    if name == "unitize":
        a = A(0)
        nrm = _al2(a)
        return F.transform(a, lambda x: _jdiv(x.cast("double"), nrm))
    if name == "zscores":
        a = A(0)
        m, sd = _amean(a), F.sqrt(_avariance(a))
        return F.transform(a, lambda x: _jdiv(x.cast("double") - m, sd))
    if name == "rank":
        # commons-math NaturalRanking, ties averaged: mean of the first
        # and last 1-based positions the value would occupy
        a = A(0)
        return F.transform(
            a,
            lambda x: (
                F.size(F.filter(a, lambda y: _as_d(y) < _as_d(x)))
                + F.lit(1)
                + F.size(F.filter(a, lambda y: _as_d(y) <= _as_d(x)))
            ).cast("double")
            / F.lit(2.0),
        )
    if name == "movingAvg":
        # movingAvg(arr, window) -> length n-w+1
        a, w = A(0), A(1).cast("int")
        return F.transform(
            F.sequence(F.lit(1), F.size(a) - w + 1),
            lambda i: _jdiv(_asum(F.slice(a, i, w)), w.cast("double")),
        )
    if name == "diff":
        # diff(arr[, lag]) — lagged differencing, length n-lag
        a = A(0)
        lag = A(1).cast("int") if len(node.args) > 1 else F.lit(1)
        n = F.size(a)
        return F.zip_with(
            F.slice(a, lag + 1, n - lag),
            F.slice(a, 1, n - lag),
            lambda x, y: x.cast("double") - y.cast("double"),
        )

    # reductions
    if name == "mean":
        return _amean(A(0))
    if name in ("var", "variance"):
        return _avariance(A(0))
    if name == "stddev":
        return F.sqrt(_avariance(A(0)))
    if name == "geometricMean":
        a = A(0)
        return F.exp(
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + F.log(_as_d(x)))
            / F.size(a)
        )
    if name == "harmonicMean":
        a = A(0)
        return _jdiv(
            F.size(a).cast("double"),
            F.aggregate(
                a, F.lit(0.0), lambda acc, x: acc + _jdiv(F.lit(1.0), _as_d(x))
            ),
        )
    if name == "median":
        return _apercentile(A(0), F.lit(50.0))
    if name == "percentile":
        return _apercentile(A(0), A(1))
    if name == "l1norm":
        return F.aggregate(
            A(0), F.lit(0.0), lambda acc, x: acc + F.abs(_as_d(x))
        )
    if name == "norm":
        return _al2(A(0))
    if name == "dotProduct":
        return _adot(A(0), A(1))
    if name == "cosineSimilarity":
        a, b = A(0), A(1)
        return _jdiv(_adot(a, b), _al2(a) * _al2(b))
    if name == "euclideanDistance":
        return F.sqrt(
            _asum(
                F.zip_with(
                    A(0), A(1),
                    lambda x, y: (_as_d(x) - _as_d(y)) * (_as_d(x) - _as_d(y)),
                )
            )
        )
    if name == "manhattanDistance":
        return _asum(
            F.zip_with(A(0), A(1), lambda x, y: F.abs(_as_d(x) - _as_d(y)))
        )
    if name == "corr":
        a, b = _arr_d(A(0)), _arr_d(A(1))
        n = F.size(a).cast("double")
        ma, mb = _amean(a), _amean(b)
        sxy = _adot(a, b) - n * ma * mb
        return _jdiv(
            sxy,
            F.sqrt(_adot(a, a) - n * ma * ma)
            * F.sqrt(_adot(b, b) - n * mb * mb),
        )
    if name == "cov":
        a, b = _arr_d(A(0)), _arr_d(A(1))
        n = F.size(a).cast("double")
        return _jdiv(_adot(a, b) - n * _amean(a) * _amean(b), n - F.lit(1.0))

    # ---- tranche 7 (round 5): scalers / windows / matrix / distances
    if name == "factorial":
        # FactorialEvaluator returns a double (commons
        # CombinatoricsUtils.factorialDouble)
        return F.factorial(A(0).cast("int")).cast("double")
    if name == "copyOf":
        # CopyOfEvaluator == Arrays.copyOf: truncates or ZERO-pads
        a = A(0)
        if len(node.args) == 1:
            return a
        ln = A(1).cast("int")
        return F.concat(
            F.slice(_arr_d(a), 1, F.least(ln, F.size(a))),
            F.array_repeat(
                F.lit(0.0), F.greatest(F.lit(0), ln - F.size(a))
            ),
        )
    if name == "primes":
        # PrimesEvaluator(count, start): literal args, computed at
        # compile time — first `count` primes >= start
        count, start = int(_unlit(node.args[0])), int(_unlit(node.args[1]))
        out, v = [], max(2, start)
        while len(out) < count:
            if all(v % p for p in range(2, int(v**0.5) + 1)):
                out.append(v)
            v += 1
        return F.array(*[F.lit(float(p)) for p in out])
    if name == "dateTime":
        # DateEvaluator: dateTime(field, template) — Java
        # SimpleDateFormat templates map onto Spark datetime patterns
        return F.date_format(
            F.to_timestamp(A(0)), str(_unlit(node.args[1]))
        )
    if name == "convert":
        # ConversionEvaluator: length-unit conversion via the meters
        # table (MILES/YARDS/FEET/INCHES/MILLIMETERS/CENTIMETERS/
        # METERS/KILOMETERS)
        meters = {
            "miles": 1609.344, "yards": 0.9144, "feet": 0.3048,
            "inches": 0.0254, "millimeters": 0.001, "centimeters": 0.01,
            "meters": 1.0, "kilometers": 1000.0,
        }
        frm = str(_unlit(node.args[0])).lower()
        to = str(_unlit(node.args[1])).lower()
        if frm not in meters or to not in meters:
            raise StreamExprError(f"convert: unknown units {frm!r}/{to!r}")
        return _as_d(A(2)) * (meters[frm] / meters[to])
    if name in ("getValue", "getAttribute"):
        # tuple/model field access (GetValueEvaluator / the
        # VectorFunction context getAttribute)
        return A(0)[str(_unlit(node.args[1]))]
    if name == "setValue":
        return A(0).withField(str(_unlit(node.args[1])), _bool_eval(node.args[2]))
    if name == "trunc":
        # TruncEvaluator: substring [0, n) of the string form
        return F.substring(A(0).cast("string"), 1, int(_unlit(node.args[1])))
    if name == "matches":
        # MatchesEvaluator: boolean regex containment
        return A(0).rlike(str(_unlit(node.args[1])))
    if name == "coalesce":
        return F.coalesce(*[_bool_eval(a) for a in node.args])
    if name == "null" and not node.args:
        # literal null in evaluator position (the stream null() is
        # dispatched earlier, by arity: it wraps a stream argument)
        return F.lit(None)
    if name == "uuid":
        return F.expr("uuid()")
    if name == "repeat":
        # RepeatEvaluator: repeat(6.5, 5) -> [6.5 x5]
        return F.array_repeat(A(0), A(1).cast("int"))
    if name == "distinct":
        # stream().distinct() keeps first-occurrence order, as does Spark
        return F.array_distinct(A(0))
    if name == "countDist":
        return F.size(F.array_distinct(A(0)))
    if name == "indexOf":
        # IndexOfEvaluator: string-compares elements, 0-based, -1 absent
        return (
            F.array_position(
                F.transform(A(0), lambda x: x.cast("string")),
                A(1).cast("string"),
            ).cast("int")
            - 1
        )
    if name == "binomialCoefficient":
        # C(n,k) = prod_{i=1..k} (n-k+i)/i — exact in double for the
        # ranges commons-math returns without overflow
        n, k = A(0).cast("double"), A(1).cast("int")
        return F.round(
            F.aggregate(
                F.sequence(F.lit(1), k),
                F.lit(1.0),
                lambda acc, i: acc * (n - k.cast("double") + i.cast("double"))
                / i.cast("double"),
            )
        ).cast("double")
    if name == "mode":
        # ModeEvaluator -> StatUtils.mode: ALL most-frequent values,
        # ascending
        a = A(0)
        d = F.array_distinct(a)
        cnt = lambda x: F.size(F.filter(a, lambda y: _as_d(y) == _as_d(x)))  # noqa: E731
        mx = F.array_max(F.transform(d, cnt))
        return F.array_sort(
            F.transform(F.filter(d, lambda x: cnt(x) == mx), _as_d)
        )
    if name == "scale":
        # ScaleEvaluator: scale(number, array) — commons MathArrays.scale
        k = _as_d(A(0))
        return F.transform(A(1), lambda x: x.cast("double") * k)
    if name == "sumSq":
        return F.aggregate(
            A(0), F.lit(0.0), lambda acc, x: acc + _as_d(x) * _as_d(x)
        )
    if name == "l2norm":
        return _al2(A(0))
    if name == "linfnorm":
        return F.array_max(F.transform(A(0), lambda x: F.abs(_as_d(x))))
    if name == "normalizeSum":
        # probability-normalize: x / sum(x)
        a = A(0)
        s = _asum(a)
        return F.transform(a, lambda x: _jdiv(_as_d(x), s))
    if name == "standardize":
        # NormalizeEvaluator/standardize == zscores
        a = A(0)
        m, sd = _amean(a), F.sqrt(_avariance(a))
        return F.transform(a, lambda x: _jdiv(_as_d(x) - m, sd))
    if name == "minMaxScale":
        a = A(0)
        lo = _as_d(A(1)) if len(node.args) > 1 else F.lit(0.0)
        hi = _as_d(A(2)) if len(node.args) > 2 else F.lit(1.0)
        mn = F.array_min(_arr_d(a))
        mx = F.array_max(_arr_d(a))
        return F.transform(
            a, lambda x: _jdiv(_as_d(x) - mn, mx - mn) * (hi - lo) + lo
        )
    if name == "meanDifference":
        return _amean(F.zip_with(A(0), A(1), lambda x, y: _as_d(x) - _as_d(y)))
    if name == "sumDifference":
        return _asum(F.zip_with(A(0), A(1), lambda x, y: _as_d(x) - _as_d(y)))
    if name in ("cosine",):
        a, b = A(0), A(1)
        return _jdiv(_adot(a, b), _al2(a) * _al2(b))
    if name in ("euclidean", "manhattan", "canberra", "chebyshev",
                "earthMovers", "distance"):
        # DistanceEvaluator + the measure factories. The reference's
        # distance(a, b, measure()) passes a commons-math
        # DistanceMeasure; here the measure name itself is callable with
        # two arrays, and distance(a, b[, measure(...)]) dispatches
        # (default euclidean, like DistanceEvaluator).
        if name == "distance":
            a, b = A(0), A(1)
            measure = (
                node.args[2].name
                if len(node.args) > 2 and isinstance(node.args[2], Call)
                else "euclidean"
            )
        else:
            a, b, measure = A(0), A(1), name
        diff = lambda f: F.zip_with(a, b, lambda x, y: f(_as_d(x), _as_d(y)))  # noqa: E731
        if measure == "euclidean":
            return F.sqrt(_asum(diff(lambda x, y: (x - y) * (x - y))))
        if measure == "manhattan":
            return _asum(diff(lambda x, y: F.abs(x - y)))
        if measure == "canberra":
            # commons-math Canberra: 0/0 terms contribute 0
            return _asum(
                diff(
                    lambda x, y: F.when(
                        (x == 0.0) & (y == 0.0), F.lit(0.0)
                    ).otherwise(F.abs(x - y) / (F.abs(x) + F.abs(y)))
                )
            )
        if measure == "chebyshev":
            return F.array_max(diff(lambda x, y: F.abs(x - y)))
        if measure == "cosine":
            return _jdiv(_adot(a, b), _al2(a) * _al2(b))
        if measure == "earthMovers":
            # commons EarthMoversDistance: emd_{i+1} = x_i + emd_i - y_i,
            # result = sum |emd_i| — a running-sum fold
            return F.get(
                F.aggregate(
                    F.zip_with(a, b, lambda x, y: _as_d(x) - _as_d(y)),
                    F.array(F.lit(0.0), F.lit(0.0)),  # [emd, total]
                    lambda acc, d: F.array(
                        F.get(acc, 0) + d,
                        F.get(acc, 1) + F.abs(F.get(acc, 0) + d),
                    ),
                ),
                1,
            )
        raise StreamExprError(f"unknown distance measure {measure!r}")
    if name == "expMovingAvg":
        # ExponentialMovingAverageEvaluator: seed = mean of the first
        # window, then ema' = ema + alpha*(v - ema) for values past the
        # window; alpha defaults to 2/(window+1). Length n-w+1.
        a, w = _arr_d(A(0)), A(1).cast("int")
        alpha = (
            _as_d(A(2))
            if len(node.args) > 2
            else F.lit(2.0) / (w.cast("double") + 1.0)
        )
        seed = F.array(_amean(F.slice(a, 1, w)))
        return F.aggregate(
            F.slice(a, w + 1, F.size(a) - w),
            seed,
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.element_at(acc, -1) + alpha * (x - F.element_at(acc, -1))
                ),
            ),
        )
    if name == "movingMedian":
        a, w = A(0), A(1).cast("int")
        return F.transform(
            F.sequence(F.lit(1), F.size(a) - w + 1),
            lambda i: _apercentile(F.slice(a, i, w), F.lit(50.0)),
        )
    if name == "movingMAD":
        # MovingMADEvaluator: mean |x - window mean| per window
        a, w = A(0), A(1).cast("int")

        def _mad(i):
            win = _arr_d(F.slice(a, i, w))
            m = _amean(win)
            return _jdiv(
                _asum(F.transform(win, lambda x: F.abs(x - m))),
                w.cast("double"),
            )

        return F.transform(F.sequence(F.lit(1), F.size(a) - w + 1), _mad)
    if name == "pairSort":
        # PairSortEvaluator: sorts (x,y) pairs by x then y; returns the
        # 2-row matrix [sorted x, paired y]
        pairs = F.array_sort(
            F.zip_with(
                A(0), A(1), lambda x, y: F.struct(_as_d(x).alias("x"),
                                                  _as_d(y).alias("y"))
            )
        )
        return F.array(
            F.transform(pairs, lambda p: p["x"]),
            F.transform(pairs, lambda p: p["y"]),
        )
    # matrix algebra (MatrixEvaluator family) — a matrix is
    # array<array<double>>, row-major like the reference's double[][]
    if name == "matrix":
        return F.array(*[_arr_d(_bool_eval(a)) for a in node.args])
    if name == "transpose":
        m = A(0)
        return F.transform(
            F.sequence(F.lit(1), F.size(F.get(m, 0))),
            lambda j: F.transform(m, lambda row: F.element_at(row, j)),
        )
    if name == "rowAt":
        return F.get(A(0), A(1).cast("int"))
    if name == "colAt":
        m, j = A(0), A(1).cast("int")
        return F.transform(m, lambda row: F.get(row, j))
    if name == "rowCount":
        return F.size(A(0))
    if name == "columnCount":
        return F.size(F.get(A(0), 0))
    if name == "sumRows":
        return F.transform(A(0), _asum)
    if name == "sumColumns":
        m = A(0)
        return F.transform(
            F.sequence(F.lit(1), F.size(F.get(m, 0))),
            lambda j: _asum(F.transform(m, lambda row: F.element_at(row, j))),
        )
    if name == "grandSum":
        return _asum(F.transform(A(0), _asum))
    if name == "matrixMult":
        # C[i][j] = rowA_i . colB_j via transpose(B); nested transforms
        # stay in codegen — fine for evaluator-sized matrices
        a, b = A(0), A(1)
        bt = F.transform(
            F.sequence(F.lit(1), F.size(F.get(b, 0))),
            lambda j: F.transform(b, lambda row: F.element_at(row, j)),
        )
        return F.transform(
            a, lambda row: F.transform(bt, lambda col: _adot(row, col))
        )
    if name == "describe":
        # DescribeEvaluator -> DescriptiveStatistics summary tuple
        a = _arr_d(A(0))
        return F.struct(
            F.size(a).cast("long").alias("N"),
            F.array_min(a).alias("min"),
            F.array_max(a).alias("max"),
            _amean(a).alias("mean"),
            _asum(a).alias("sum"),
            F.sqrt(_avariance(a)).alias("stdev"),
            _avariance(a).alias("var"),
        )
    if name == "freqTable":
        # FrequencyTableEvaluator: per distinct value (ascending) the
        # count, percent, cumulative frequency and cumulative percent
        a = _arr_d(A(0))
        d = F.array_sort(F.array_distinct(a))
        n = F.size(a).cast("double")
        cnt = lambda x: F.size(F.filter(a, lambda y: y == x))  # noqa: E731
        cum = lambda x: F.size(F.filter(a, lambda y: y <= x))  # noqa: E731
        return F.transform(
            d,
            lambda x: F.struct(
                x.alias("value"),
                cnt(x).cast("long").alias("count"),
                (cnt(x).cast("double") / n * 100.0).alias("pct"),
                cum(x).cast("long").alias("cumFreq"),
                (cum(x).cast("double") / n * 100.0).alias("cumPct"),
            ),
        )
    if name == "hist":
        # HistogramEvaluator: equal-width bins over [min, max]; per bin
        # N/min/max/mean/sum like the commons EmpiricalDistribution
        # summaries the reference serializes
        a, nb = _arr_d(A(0)), A(1).cast("int")
        mn, mx = F.array_min(a), F.array_max(a)
        width = _jdiv(mx - mn, nb.cast("double"))

        def _bin(i):
            lo = mn + (i.cast("double") - 1.0) * width
            hi = mn + i.cast("double") * width
            inb = F.filter(
                a,
                lambda x: (x >= lo)
                & (F.when(i == nb, x <= hi).otherwise(x < hi)),
            )
            return F.struct(
                F.size(inb).cast("long").alias("N"),
                lo.alias("binStart"),
                hi.alias("binEnd"),
                F.when(F.size(inb) > 0, _amean(inb)).alias("mean"),
                F.when(F.size(inb) > 0, _asum(inb)).alias("sum"),
            )

        return F.transform(F.sequence(F.lit(1), nb), _bin)
    if name == "regress":
        # RegressionEvaluator: commons SimpleRegression over (x, y) —
        # closed-form OLS compiled to arithmetic; the result tuple
        # carries the fields predict()/residuals consume
        x, y = _arr_d(A(0)), _arr_d(A(1))
        n = F.size(x).cast("double")
        mx_, my_ = _amean(x), _amean(y)
        sxx = _adot(x, x) - n * mx_ * mx_
        sxy = _adot(x, y) - n * mx_ * my_
        syy = _adot(y, y) - n * my_ * my_
        slope = _jdiv(sxy, sxx)
        return F.struct(
            slope.alias("slope"),
            (my_ - slope * mx_).alias("intercept"),
            _jdiv(sxy, F.sqrt(sxx * syy)).alias("R"),
            _jdiv(sxy * sxy, sxx * syy).alias("RSquared"),
            F.lit("regress").alias("type"),
        )
    if name == "predict":
        # PredictEvaluator: dispatches on the model's compile-time shape
        # — regress() tuples evaluate as Column arithmetic; function
        # values (lerp/spline/akima/loess/oscillate/gaussfit/harmfit,
        # and their derivative() rewrites) evaluate via the numpy layer;
        # knnRegress averages the k nearest neighbours' y
        _FN_NAMES = {
            "lerp", "spline", "akima", "loess", "oscillate", "gaussfit",
            "harmfit", "harmonicFit", "derivative",
        }
        m_ast = node.args[0]
        if isinstance(m_ast, Call) and m_ast.name in _FN_NAMES:
            from solr_spark.functions import statseval as _SE

            model = _bool_eval(m_ast)
            fn = lambda t, x, y, p, v: _SE.fn_predict(  # noqa: E731
                t,
                None if x is None else list(x),
                None if y is None else list(y),
                None if p is None else list(p),
                v,
            )
            vcall = _pd_rows(fn, "double")
            xn = node.args[1]
            if isinstance(xn, Call):
                # array argument: map over its elements
                xv = _bool_eval(xn)
                return _pd_rows(
                    lambda t, x, y, p, arr: [
                        fn(t, x, y, p, float(v)) for v in arr
                    ],
                    "array<double>",
                )(model["ftype"], model["x"], model["y"], model["params"], xv)
            return vcall(
                model["ftype"], model["x"], model["y"], model["params"],
                _as_d(_bool_eval(xn)),
            )
        if isinstance(m_ast, Call) and m_ast.name == "knnRegress":
            from solr_spark.functions import statseval as _SE

            model = _bool_eval(m_ast)
            fn = lambda pts, yv, k, q: _SE.knn_regress_predict(  # noqa: E731
                [list(r) for r in pts], list(yv), int(k), list(q)
            )
            return _pd_rows(fn, "double")(
                model["points"], model["y"], model["k"], A(1)
            )
        model = A(0)
        xv = A(1)
        pred = lambda v: model["intercept"] + model["slope"] * _as_d(v)  # noqa: E731
        # the reference dispatches on runtime type (Number vs List); a
        # Column's type isn't known at compile time, so dispatch on the
        # AST shape: array-producing evaluator calls map element-wise
        arr_names = {
            "array", "sequence", "zeros", "ones", "natural", "addAll",
            "copyOfRange", "rev", "asc", "desc", "colAt", "rowAt",
            "scale", "scalarAdd", "scalarSubtract", "scalarMultiply",
            "scalarDivide", "ebeAdd", "ebeSubtract", "ebeMultiply",
            "ebeDivide", "unitize", "zscores", "standardize",
            "normalizeSum", "minMaxScale", "movingAvg", "movingMedian",
            "diff", "split", "distinct", "repeat",
        }
        if isinstance(node.args[1], Call) and node.args[1].name in arr_names:
            return F.transform(xv, pred)
        return pred(xv)
    if name == "residuals":
        model, x, y = A(0), A(1), A(2)
        return F.zip_with(
            x, y,
            lambda xi, yi: _as_d(yi)
            - (model["intercept"] + model["slope"] * _as_d(xi)),
        )
    # conditionals / null handling
    if name == "if":
        return F.when(_bool_eval(node.args[0]), A(1)).otherwise(A(2))
    if name == "eor":
        x, y = _bool_eval(node.args[0]), _bool_eval(node.args[1])
        return x != y
    if name == "isNull":
        return A(0).isNull()
    if name == "notNull":
        return A(0).isNotNull()
    if name == "precision":
        # precision(x, digits) — PrecisionEvaluator rounds to N decimals
        return F.round(A(0), int(_unlit(node.args[1])))
    return None


# ---- statistical evaluators (tranche 7b, round 5) ----
#
# Distributions, hypothesis tests, clustering and curve fitting — the
# reference backs these with commons-math on the client JVM
# (io/eval/*DistributionEvaluator, TTest/MannWhitneyU/KolmogorovSmirnov/
# ChiSquareDataSet/GTestDataSet/AnovaEvaluator, Kmeans/MultiKmeans/
# Dbscan/KnnEvaluator, PolyFit/OlsRegress/Convolution/FFTEvaluator).
# Here a distribution value is a struct Column (dtype, p1, p2, data) and
# every special-function consumer is an Arrow-batched pandas UDF over
# solr_spark.functions.statseval — one Python call per batch, not per
# row. Sampling takes a seed kwarg (default 0) for reproducibility; the
# reference's unseeded Well19937c is the documented divergence.

#: distribution constructor -> (dtype tag, arity) — arg order follows
#: the commons-math constructors the reference evaluators call
_DIST_CTORS = {
    "normalDistribution": ("normal", 2),
    "uniformDistribution": ("uniform", 2),
    "uniformIntegerDistribution": ("uniformInt", 2),
    "binomialDistribution": ("binomial", 2),
    "poissonDistribution": ("poisson", 1),
    "gammaDistribution": ("gamma", 2),
    "betaDistribution": ("beta", 2),
    "weibullDistribution": ("weibull", 2),
    "logNormalDistribution": ("logNormal", 2),
    "constantDistribution": ("constant", 1),
    "geometricDistribution": ("geometric", 1),
    "zipFDistribution": ("zipf", 2),
    "triangularDistribution": ("triangular", 3),
    "empiricalDistribution": ("empirical", 0),
    "enumeratedDistribution": ("enumerated", 0),
}

_DIST_SCHEMA = (
    "dtype string, p1 double, p2 double, data array<double>"
)


def _dist_struct(dtype: str, args: list[Column]) -> Column:
    nil = F.lit(None).cast("double")
    if dtype in ("empirical", "enumerated"):
        return F.struct(
            F.lit(dtype).alias("dtype"),
            nil.alias("p1"),
            nil.alias("p2"),
            _arr_d(args[0]).alias("data"),
        )
    if dtype == "triangular":
        # (low, mode) in p1/p2, high rides in data[0]
        return F.struct(
            F.lit(dtype).alias("dtype"),
            _as_d(args[0]).alias("p1"),
            _as_d(args[1]).alias("p2"),
            F.array(_as_d(args[2])).alias("data"),
        )
    p2 = _as_d(args[1]) if len(args) > 1 else F.lit(0.0)
    return F.struct(
        F.lit(dtype).alias("dtype"),
        _as_d(args[0]).alias("p1"),
        p2.alias("p2"),
        F.lit(None).cast("array<double>").alias("data"),
    )


def _pd_rows(fn, ret: str):
    """Arrow-batched pandas UDF over row-aligned columns. The argument
    columns are packed into ONE struct so the UDF has a fixed signature;
    `fn` maps one row's python values to the return value. Arrow moves
    the whole batch per call — one Python invocation per batch, not per
    row of Spark-side dispatch."""
    import pandas as pd

    struct_ret = ret.strip().lower().startswith("struct")

    def _udf(packed):
        rows = [fn(*packed.iloc[i]) for i in range(len(packed))]
        return pd.DataFrame(rows) if struct_ret else pd.Series(rows)

    # assign real annotation objects: this module uses
    # `from __future__ import annotations`, which would hand pyspark's
    # type-hint inference unresolvable strings
    _udf.__annotations__ = {
        "packed": pd.DataFrame,
        "return": pd.DataFrame if struct_ret else pd.Series,
    }
    _udf = F.pandas_udf(ret)(_udf)

    def _call(*cols: Column) -> Column:
        return _udf(F.struct(*[c.alias(f"_c{i}") for i, c in enumerate(cols)]))

    return _call


def _dist_args(c: Column) -> tuple:
    return (c["dtype"], c["p1"], c["p2"], c["data"])


def _stat_eval(name: str, node) -> Column | None:
    from solr_spark.functions import statseval as SE

    A = lambda i: _bool_eval(node.args[i])  # noqa: E731

    if name in _DIST_CTORS:
        dtype, _ = _DIST_CTORS[name]
        return _dist_struct(dtype, [_bool_eval(a) for a in node.args])

    if name == "cumulativeProbability":
        fn = lambda t, p1, p2, d, x: SE.dist_cdf(t, p1, p2, d, x)  # noqa: E731
        return _pd_rows(fn, "double")(*_dist_args(A(0)), _as_d(A(1)))
    if name == "density":
        fn = lambda t, p1, p2, d, x: SE.dist_density(t, p1, p2, d, x)  # noqa: E731
        return _pd_rows(fn, "double")(*_dist_args(A(0)), _as_d(A(1)))
    if name == "probability":
        if len(node.args) > 2:
            # continuous range form: P(lo <= X <= hi) = cdf(hi)-cdf(lo)
            fn = lambda t, p1, p2, d, lo, hi: (  # noqa: E731
                SE.dist_cdf(t, p1, p2, d, hi) - SE.dist_cdf(t, p1, p2, d, lo)
            )
            return _pd_rows(fn, "double")(
                *_dist_args(A(0)), _as_d(A(1)), _as_d(A(2))
            )
        fn = lambda t, p1, p2, d, x: SE.dist_pmf(t, p1, p2, d, x)  # noqa: E731
        return _pd_rows(fn, "double")(*_dist_args(A(0)), _as_d(A(1)))
    if name == "sample":
        n = _as_d(A(1)).cast("int") if len(node.args) > 1 else F.lit(1)
        seed = int(_unlit(node.kwargs["seed"])) if "seed" in node.kwargs else 0
        if isinstance(node.args[0], Call) and node.args[0].name == "markovChain":
            chain = A(0)
            fn = lambda tr, k: [  # noqa: E731
                float(s)
                for s in SE.markov_sample(
                    [list(r) for r in tr], int(k), seed=seed
                )
            ]
            return _pd_rows(fn, "array<double>")(chain["transition"], n)
        if (
            isinstance(node.args[0], Call)
            and node.args[0].name == "multiVariateNormalDistribution"
        ):
            mv = A(0)

            def _mvs(mean, cov, k):
                import numpy as np

                rng = np.random.default_rng(seed)
                draws = rng.multivariate_normal(
                    list(mean), [list(r) for r in cov], int(k)
                )
                return [[float(v) for v in d] for d in draws]

            return _pd_rows(_mvs, "array<array<double>>")(
                mv["mean"], mv["cov"], n
            )
        fn = lambda t, p1, p2, d, k: [  # noqa: E731
            float(v) for v in SE.dist_sample(t, p1, p2, d, int(k), seed)
        ]
        return _pd_rows(fn, "array<double>")(*_dist_args(A(0)), n)

    if name == "ttest":
        ret = "struct<`t-statistic` double, `p-value` double>"
        one_sample = isinstance(node.args[0], tuple) and node.args[0][0] != "ident"

        def _t(a, b):
            t, p = (
                SE.ttest_onesample(float(a), list(b))
                if one_sample
                else SE.ttest(list(a), list(b))
            )
            return {"t-statistic": t, "p-value": p}

        return _pd_rows(_t, ret)(A(0), A(1))
    if name == "pairedTtest":
        ret = "struct<`t-statistic` double, `p-value` double>"
        fn = lambda a, b: dict(  # noqa: E731
            zip(("t-statistic", "p-value"), SE.paired_ttest(list(a), list(b)))
        )
        return _pd_rows(fn, ret)(A(0), A(1))
    if name == "mannWhitney":
        ret = "struct<`u-statistic` double, `p-value` double>"
        fn = lambda a, b: dict(  # noqa: E731
            zip(("u-statistic", "p-value"), SE.mann_whitney(list(a), list(b)))
        )
        return _pd_rows(fn, ret)(A(0), A(1))
    if name == "chiSquareDataSet":
        ret = "struct<`chisquare-statistic` double, `p-value` double>"
        fn = lambda a, b: dict(  # noqa: E731
            zip(
                ("chisquare-statistic", "p-value"),
                SE.chi_square_dataset(list(a), list(b)),
            )
        )
        return _pd_rows(fn, ret)(A(0), A(1))
    if name == "gtestDataSet":
        ret = "struct<`G-statistic` double, `p-value` double>"
        fn = lambda a, b: dict(  # noqa: E731
            zip(("G-statistic", "p-value"), SE.gtest_dataset(list(a), list(b)))
        )
        return _pd_rows(fn, ret)(A(0), A(1))
    if name == "anova":
        ret = "struct<`f-ratio` double, `p-value` double>"

        def _anova(*groups):
            f, p = SE.anova([list(g) for g in groups])
            return {"f-ratio": f, "p-value": p}

        return _pd_rows(_anova, ret)(*[_bool_eval(a) for a in node.args])
    if name in ("ks", "kolmogorovSmirnov"):
        first_is_dist = (
            isinstance(node.args[0], Call) and node.args[0].name in _DIST_CTORS
        )
        if first_is_dist:
            ret = "struct<`d-statistic` double, `p-value` double>"

            def _ks1(t, p1, p2, d, sample):
                import numpy as np

                xs = np.sort(np.asarray(list(sample), float))
                cdf = [SE.dist_cdf(t, p1, p2, d, v) for v in xs]
                dstat, p = SE.ks_dist(cdf, xs)
                return {"d-statistic": dstat, "p-value": p}

            return _pd_rows(_ks1, ret)(*_dist_args(A(0)), A(1))
        # two-sample form: the reference stores the P-VALUE under
        # "d-statistic" (KolmogorovSmirnovEvaluator.java:60 quirk) —
        # mirrored for parity
        ret = "struct<`d-statistic` double>"
        fn = lambda a, b: {"d-statistic": SE.ks_2samp(list(a), list(b))}  # noqa: E731
        return _pd_rows(fn, ret)(A(0), A(1))

    if name in ("kmeans", "multiKmeans"):
        k = int(_unlit(node.args[1]))
        trials = int(_unlit(node.args[2])) if name == "multiKmeans" else 1
        max_iter = int(_unlit(node.kwargs.get("maxIterations", 50)))
        _LABELED = {"termVectors", "pivot", "latlonVectors", "featureSelect"}
        matrix_col = A(0)
        if isinstance(node.args[0], Call) and node.args[0].name in _LABELED:
            matrix_col = matrix_col["matrix"]
        ret = (
            "struct<centroids array<array<double>>, clusters array<int>,"
            " points array<array<double>>>"
        )

        def _km(m):
            cent, assign = SE.kmeans(
                [list(r) for r in m], k, max_iter=max_iter, trials=trials
            )
            return {
                "centroids": [[float(v) for v in c] for c in cent],
                "clusters": [int(c) for c in assign],
                "points": [[float(v) for v in r] for r in m],
            }

        return _pd_rows(_km, ret)(matrix_col)
    if name == "dbscan":
        eps = float(_unlit(node.args[1]))
        min_pts = int(_unlit(node.args[2]))
        ret = (
            "struct<centroids array<array<double>>, clusters array<int>,"
            " points array<array<double>>>"
        )

        def _db(m):
            import numpy as np

            x = [list(r) for r in m]
            labels = SE.dbscan(x, eps, min_pts)
            xs = np.asarray(x, float)
            cents = [
                xs[labels == c].mean(axis=0).tolist()
                for c in sorted(set(labels) - {-1})
            ]
            return {
                "centroids": cents,
                "clusters": [int(v) for v in labels],
                "points": x,
            }

        return _pd_rows(_db, ret)(A(0))
    if name == "getCentroids":
        return A(0)["centroids"]
    if name == "getCluster":
        model, i = A(0), _bool_eval(node.args[1]).cast("int")
        pairs = F.zip_with(
            model["points"],
            model["clusters"],
            lambda p, c: F.struct(p.alias("p"), c.alias("c")),
        )
        return F.transform(
            F.filter(pairs, lambda s: s["c"] == i), lambda s: s["p"]
        )
    if name == "knn":
        # knn(matrix, vec, k): the k matrix rows nearest to vec by
        # euclidean distance — comparator array_sort, stays in codegen
        m, v, k = A(0), A(1), _bool_eval(node.args[2]).cast("int")
        dist = lambda row: _asum(  # noqa: E731
            F.zip_with(
                row, v, lambda x, y: (_as_d(x) - _as_d(y)) * (_as_d(x) - _as_d(y))
            )
        )
        srt = F.array_sort(
            m,
            lambda l, r: F.when(dist(l) < dist(r), -1)
            .when(dist(l) > dist(r), 1)
            .otherwise(0),
        )
        return F.slice(srt, 1, k)

    # ---- function values (interpolators / fitters / simulators) ----
    # VectorFunction analogues: struct (ftype, x, y, params); predict()
    # dispatches on ftype, derivative() rewrites it to ftype#deriv
    if name in ("lerp", "spline", "akima", "loess"):
        xs, ys = _arr_d(A(0)), _arr_d(A(1))
        params = (
            F.array(_as_d(_bool_eval(node.kwargs["bandwidth"])))
            if name == "loess" and "bandwidth" in node.kwargs
            else F.lit(None).cast("array<double>")
        )
        return F.struct(
            F.lit(name).alias("ftype"), xs.alias("x"), ys.alias("y"),
            params.alias("params"),
        )
    if name == "oscillate":
        # HarmonicOscillator sampled at x = 0..127 (OscillateEvaluator)
        amp, om, ph = _as_d(A(0)), _as_d(A(1)), _as_d(A(2))
        xs = F.transform(F.sequence(F.lit(0), F.lit(127)), lambda i: i.cast("double"))
        ys = F.transform(xs, lambda x: amp * F.sin(om * x + ph))
        return F.struct(
            F.lit("oscillate").alias("ftype"), xs.alias("x"), ys.alias("y"),
            F.array(amp, om, ph).alias("params"),
        )
    if name == "gaussfit":
        ret = (
            "struct<ftype string, x array<double>, y array<double>,"
            " params array<double>>"
        )

        def _gf(x, y):
            a, b, c = SE.gauss_fit(list(x), list(y))
            import math as _m

            fitted = [
                a * _m.exp(-((v - b) ** 2) / (2 * c * c)) for v in x
            ]
            return {
                "ftype": "gaussian", "x": [float(v) for v in x],
                "y": fitted, "params": [a, b, c],
            }

        return _pd_rows(_gf, ret)(A(0), A(1))
    if name in ("harmfit", "harmonicFit"):
        ret = (
            "struct<ftype string, x array<double>, y array<double>,"
            " params array<double>>"
        )

        def _hf(x, y):
            import math as _m

            amp, om, ph = SE.harmonic_fit(list(x), list(y))
            fitted = [amp * _m.sin(om * v + ph) for v in x]
            return {
                "ftype": "oscillate", "x": [float(v) for v in x],
                "y": fitted, "params": [amp, om, ph],
            }

        return _pd_rows(_hf, ret)(A(0), A(1))
    if name == "derivative":
        m = A(0)
        return F.struct(
            F.concat(m["ftype"], F.lit("#deriv")).alias("ftype"),
            m["x"].alias("x"), m["y"].alias("y"), m["params"].alias("params"),
        )
    if name == "integral":
        fn = lambda t, x, y, p, lo, hi: SE.fn_integral(  # noqa: E731
            t,
            None if x is None else list(x),
            None if y is None else list(y),
            None if p is None else list(p),
            lo, hi,
        )
        m = A(0)
        return _pd_rows(fn, "double")(
            m["ftype"], m["x"], m["y"], m["params"], _as_d(A(1)), _as_d(A(2))
        )
    if name == "knnRegress":
        # model: points matrix + y vector + k (KnnRegressionEvaluator)
        return F.struct(
            F.lit("knnRegress").alias("ftype"),
            A(0).alias("points"), _arr_d(A(1)).alias("y"),
            _bool_eval(node.args[2]).cast("int").alias("k"),
        )
    if name == "markovChain":
        # row-stochastic transition matrix; sample() walks it seeded
        return F.struct(
            F.lit("markov").alias("ftype"), A(0).alias("transition")
        )
    if name == "fuzzyKmeans":
        k = int(_unlit(node.args[1]))
        fuzz = float(_unlit(node.kwargs.get("fuzziness", 2.0)))
        ret = (
            "struct<centroids array<array<double>>, clusters array<int>,"
            " points array<array<double>>,"
            " membership array<array<double>>>"
        )

        def _fkm(m):
            pts = [list(r) for r in m]
            cent, u, assign = SE.fuzzy_kmeans(pts, k, fuzziness=fuzz)
            return {
                "centroids": [[float(v) for v in c] for c in cent],
                "clusters": [int(c) for c in assign],
                "points": pts,
                "membership": [[float(v) for v in r] for r in u],
            }

        return _pd_rows(_fkm, ret)(A(0))
    if name == "getMembershipMatrix":
        return A(0)["membership"]
    if name == "outliers":
        # outliers(dist, vec, lowCdf, hiCdf) -> the values whose CDF
        # falls outside [low, hi], with their cumulative probabilities
        ret = (
            "array<struct<idx int, value double,"
            " cumulativeProbability double>>"
        )

        def _out(t, p1, p2, d, vec, lo, hi):
            res = []
            for i, v in enumerate(vec):
                c = SE.dist_cdf(t, p1, p2, d, v)
                if c < lo or c > hi:
                    res.append(
                        {"idx": i, "value": float(v),
                         "cumulativeProbability": c}
                    )
            return res

        return _pd_rows(_out, ret)(
            *_dist_args(A(0)), A(1), _as_d(A(2)), _as_d(A(3))
        )

    # ---- computational geometry (commons-geometry analogues) ----
    if name == "convexHull":
        ret = (
            "struct<vertices array<array<double>>, area double,"
            " boundarySize double, baryCenter array<double>>"
        )

        def _ch(m):
            h = SE.convex_hull([list(r) for r in m])
            return {
                "vertices": [[float(v) for v in p] for p in h],
                "area": SE.hull_area(h) if len(h) >= 3 else 0.0,
                "boundarySize": SE.hull_perimeter(h) if len(h) >= 2 else 0.0,
                "baryCenter": [float(v) for v in SE.hull_barycenter(h)],
            }

        return _pd_rows(_ch, ret)(A(0))
    if name == "getVertices":
        return A(0)["vertices"]
    if name == "getArea":
        return A(0)["area"]
    if name == "getBoundarySize":
        return A(0)["boundarySize"]
    if name == "getBaryCenter":
        return A(0)["baryCenter"]
    if name == "enclosingDisk":
        ret = (
            "struct<center array<double>, radius double,"
            " supportPoints array<array<double>>>"
        )

        def _ed(m):
            c, r, sup = SE.enclosing_disk([list(row) for row in m])
            return {
                "center": [float(v) for v in c],
                "radius": r,
                "supportPoints": [[float(v) for v in p] for p in sup],
            }

        return _pd_rows(_ed, ret)(A(0))
    if name == "getCenter":
        return A(0)["center"]
    if name == "getRadius":
        return A(0)["radius"]
    if name == "getSupportPoints":
        return A(0)["supportPoints"]
    if name == "projectToBorder":
        # project points onto the disk's circle: c + (p−c)·r/|p−c|.
        # Catalyst can't nest a Python-UDF column (the disk) inside a
        # higher-order lambda, so the projection runs in the same numpy
        # layer that built the disk.
        disk = A(0)

        def _proj(c, r, pts):
            import numpy as np

            cv = np.asarray(list(c), float)
            out = []
            for p in pts:
                pv = np.asarray(list(p), float)
                d = np.linalg.norm(pv - cv) or 1.0
                out.append([float(v) for v in cv + (pv - cv) * r / d])
            return out

        return _pd_rows(_proj, "array<array<double>>")(
            disk["center"], disk["radius"], A(1)
        )

    if name in ("getAmplitude", "getAngularFrequency", "getPhase"):
        idx = {"getAmplitude": 1, "getAngularFrequency": 2, "getPhase": 3}[name]
        return F.get(A(0)["params"], idx - 1)
    if name == "getAttributes":
        return A(0)
    if name == "multiVariateNormalDistribution":
        # multiVariateNormalDistribution(meanVector, covMatrix) — only
        # sample() consumes it (seeded rng.multivariate_normal)
        return F.struct(
            F.lit("mvnormal").alias("dtype"),
            _arr_d(A(0)).alias("mean"),
            A(1).alias("cov"),
        )

    # ---- labeled-matrix text features (TermVectors/TopFeatures/
    # FeatureSelect/Pivot/LatLonVectors + label accessors) ----
    if name == "termVectors":
        # sqrt(tf) · (ln((n+1)/(df+1)) + 1) over doc tuples carrying
        # (id, terms); df-fraction band + min term length filters as in
        # TermVectorsEvaluator (defaults 3 / 0.05 / 0.5)
        min_len = int(_unlit(node.kwargs.get("minTermLength", 3)))
        min_df = float(_unlit(node.kwargs.get("minDocFreq", 0.05)))
        max_df = float(_unlit(node.kwargs.get("maxDocFreq", 0.5)))
        ret = (
            "struct<matrix array<array<double>>, rowLabels array<string>,"
            " colLabels array<string>>"
        )

        def _tv(tuples):
            import math as _m

            docs = [
                (
                    str(t["id"]),
                    []
                    if t["terms"] is None
                    else [str(w) for w in t["terms"]],
                )
                for t in tuples
            ]
            n = len(docs)
            dfreq: dict = {}
            for _, terms in docs:
                for w in {w for w in terms if len(w) >= min_len}:
                    dfreq[w] = dfreq.get(w, 0) + 1
            lo, hi = int(n * min_df), int(n * max_df)
            feats = sorted(w for w, c in dfreq.items() if lo <= c <= hi)
            rows = []
            for _, terms in docs:
                tf: dict = {}
                for w in terms:
                    if w in dfreq and lo <= dfreq[w] <= hi:
                        tf[w] = tf.get(w, 0) + 1
                rows.append(
                    [
                        _m.sqrt(tf.get(w, 0))
                        * (_m.log((n + 1) / (dfreq[w] + 1.0)) + 1.0)
                        for w in feats
                    ]
                )
            return {
                "matrix": rows,
                "rowLabels": [d[0] for d in docs],
                "colLabels": feats,
            }

        return _pd_rows(_tv, ret)(A(0))
    if name == "topFeatures":
        k = int(_unlit(node.args[1]))

        def _tf(m, labels):
            out = []
            for row in m:
                idx = sorted(
                    range(len(row)), key=lambda i: (-row[i], labels[i])
                )
                out.append([labels[i] for i in idx[:k] if row[i] > 0])
            return out

        return _pd_rows(_tf, "array<array<string>>")(
            A(0)["matrix"], A(0)["colLabels"]
        )
    if name == "featureSelect":
        def _fs(m, labels, keep):
            keepset = [i for i, lb in enumerate(labels) if lb in set(keep)]
            return {
                "matrix": [[float(row[i]) for i in keepset] for row in m],
                "colLabels": [labels[i] for i in keepset],
            }

        sel = _pd_rows(
            _fs,
            "struct<matrix array<array<double>>, colLabels array<string>>",
        )(A(0)["matrix"], A(0)["colLabels"], A(1))
        return F.struct(
            sel["matrix"].alias("matrix"),
            A(0)["rowLabels"].alias("rowLabels"),
            sel["colLabels"].alias("colLabels"),
        )
    if name == "pivot":
        xf = str(_unlit(node.args[1]))
        yf = str(_unlit(node.args[2]))
        vf = str(_unlit(node.args[3]))
        ret = (
            "struct<matrix array<array<double>>, rowLabels array<string>,"
            " colLabels array<string>>"
        )

        def _pv(tuples):
            xs = sorted({str(t[xf]) for t in tuples})
            ys = sorted({str(t[yf]) for t in tuples})
            xi = {v: i for i, v in enumerate(xs)}
            yi = {v: i for i, v in enumerate(ys)}
            m = [[0.0] * len(ys) for _ in xs]
            for t in tuples:
                m[xi[str(t[xf])]][yi[str(t[yf])]] = float(t[vf])
            return {"matrix": m, "rowLabels": xs, "colLabels": ys}

        return _pd_rows(_pv, ret)(A(0))
    if name == "latlonVectors":
        fld = str(_unlit(node.kwargs.get("field", "latlon")))
        ret = (
            "struct<matrix array<array<double>>, rowLabels array<string>,"
            " colLabels array<string>>"
        )

        def _ll(tuples):
            rows, labels = [], []
            for t in tuples:
                lat, lon = str(t[fld]).split(",")[:2]
                rows.append([float(lat), float(lon)])
                labels.append(str(t.get("id", len(labels))))
            return {
                "matrix": rows, "rowLabels": labels,
                "colLabels": ["lat", "lon"],
            }

        return _pd_rows(_ll, ret)(A(0))
    if name in ("getRowLabels", "getColumnLabels"):
        return A(0)["rowLabels" if name == "getRowLabels" else "colLabels"]
    if name in ("setRowLabels", "setColumnLabels"):
        fld = "rowLabels" if name == "setRowLabels" else "colLabels"
        return A(0).withField(fld, _bool_eval(node.args[1]))

    if name == "polyfit":
        args = node.args
        if len(args) == 1:
            cols, fn = [A(0)], lambda y: list(SE.polyfit_values(list(y)))
        elif len(args) == 2 and isinstance(args[1], tuple) and args[1][0] != "ident":
            deg = int(_unlit(args[1]))
            cols, fn = [A(0)], lambda y: list(
                SE.polyfit_values(list(y), degree=deg)
            )
        else:
            deg = int(_unlit(args[2])) if len(args) > 2 else 3
            cols, fn = [A(0), A(1)], lambda x, y: list(
                SE.polyfit_values(list(y), list(x), degree=deg)
            )
        return _pd_rows(fn, "array<double>")(*cols)
    if name == "olsRegress":
        ret = (
            "struct<regressionParameters array<double>, intercept double,"
            " RSquared double, residuals array<double>>"
        )
        fn = lambda m, y: SE.ols_regress([list(r) for r in m], list(y))  # noqa: E731
        return _pd_rows(fn, ret)(A(0), A(1))
    if name == "conv":
        fn = lambda a, b: [float(v) for v in SE.conv(list(a), list(b))]  # noqa: E731
        return _pd_rows(fn, "array<double>")(A(0), A(1))
    if name == "fft":
        fn = lambda a: [  # noqa: E731
            [float(v) for v in part] for part in SE.fft_pair(list(a))
        ]
        return _pd_rows(fn, "array<array<double>>")(A(0))
    if name == "ifft":
        fn = lambda m: [float(v) for v in SE.ifft_real(list(m[0]), list(m[1]))]  # noqa: E731
        return _pd_rows(fn, "array<double>")(A(0))
    if name == "finddelay":
        fn = lambda a, b: SE.find_delay(list(a), list(b))  # noqa: E731
        return _pd_rows(fn, "int")(A(0), A(1))
    return None


def _bool_eval(node) -> Column:
    if isinstance(node, tuple):
        if node[0] == "ident":
            return F.col(node[1])
        return F.lit(node[1])
    name = node.name
    if name in _EVAL_BOOL:
        return _EVAL_BOOL[name](_bool_eval(node.args[0]), _bool_eval(node.args[1]))
    if name in _EVAL_ARITH:
        return _EVAL_ARITH[name](_bool_eval(node.args[0]), _bool_eval(node.args[1]))
    if name in _EVAL_UNARY:
        return _EVAL_UNARY[name](_bool_eval(node.args[0]))
    if name in _EVAL_STR_UNARY:
        return _EVAL_STR_UNARY[name](_bool_eval(node.args[0]))
    if name in _EVAL_TEMPORAL:
        # accepts timestamp columns and ISO strings alike
        return _EVAL_TEMPORAL[name](F.to_timestamp(_bool_eval(node.args[0])))
    if name == "concat":
        # ConcatOperator: concat(a, b, ..., delim="-") joins with the
        # delimiter; without one the parts concatenate directly
        parts = [_bool_eval(a) for a in node.args]
        if "delim" in node.kwargs:
            return F.concat_ws(str(_unlit(node.kwargs["delim"])), *parts)
        return F.concat(*parts)
    if name == "split":
        # SplitEvaluator: split(field, delim) -> string array
        return F.split(
            _bool_eval(node.args[0]), str(_unlit(node.args[1]))
        )
    if name == "replace":
        # ReplaceOperator (literal find/replace form)
        return F.replace(
            _bool_eval(node.args[0]),
            _bool_eval(node.args[1]),
            _bool_eval(node.args[2]),
        )
    if name == "valueAt":
        # ValueAtEvaluator: 0-based index into an array field
        return F.get(
            _bool_eval(node.args[0]), _bool_eval(node.args[1])
        )
    if name == "and":
        out = _bool_eval(node.args[0])
        for a in node.args[1:]:
            out = out & _bool_eval(a)
        return out
    if name == "or":
        out = _bool_eval(node.args[0])
        for a in node.args[1:]:
            out = out | _bool_eval(a)
        return out
    if name == "not":
        return ~_bool_eval(node.args[0])
    m = _math_eval(name, node)
    if m is not None:
        return m
    m = _stat_eval(name, node)
    if m is not None:
        return m
    if name.lower() in ("count", "sum", "avg", "min", "max"):
        # metric-shaped reference inside having(): names the upstream
        # rollup/facet output column ("sum(v)", "count(*)") — Solr's
        # having-over-rollup addresses the metric by the same identifier
        arg = node.args[0][1] if node.args else "*"
        return F.col(f"{name.lower()}({arg})")
    raise StreamExprError(f"unknown evaluator {name!r}")


def priority_stream(high: DataFrame, low: DataFrame) -> DataFrame:
    """priority() — high-priority tuples drain before low
    (solrj/src/java/org/apache/solr/client/solrj/io/stream/PriorityStream.java:46
    schedules the high stream's tasks first). Batch shape: tag + stable
    order; consumers see all high rows before any low row."""
    return (
        high.withColumn("_priority", F.lit(0))
        .unionByName(low.withColumn("_priority", F.lit(1)))
        .orderBy("_priority")
    )
