"""ML-over-term-stats operators: IGain feature selection + text logistic
regression.

Re-expresses the reference's ML query family:
- IGain terms: solr/core/src/java/org/apache/solr/search/IGainTermsQParserPlugin.java
  (information gain of each term w.r.t. a binary label over the
  matching docs; the feature-selection stage of its text classifier,
  solrj/.../io/stream/FeaturesSelectionStream.java:68)
- TextLogit: solr/core/src/java/org/apache/solr/search/TextLogisticRegressionQParserPlugin.java
  (iterative LR training over term-presence vectors;
  solrj/.../io/stream/TextLogitStream.java:69 drives the iterations)

Spark-first: IGain is pure DataFrame aggregation (exactly SQL-twinnable);
training uses pyspark.ml's LogisticRegression over assembled term-presence
feature vectors instead of re-implementing SGD — Catalyst/MLlib own the
distributed iteration (SURVEY.md maps train()/model() there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h(p: Column) -> Column:
    """Binary entropy term -p*log2(p) with 0*log(0) = 0."""
    return F.when(
        (p > 0) & (p < 1), -p * F.log2(p) - (1 - p) * F.log2(1 - p)
    ).otherwise(F.lit(0.0))


def igain_terms(
    tok_df: DataFrame,
    labels: DataFrame,
    limit: int = 10,
    min_df: int = 5,
) -> DataFrame:
    """Top terms by information gain for a binary label.

    tok_df: (docid, toks); labels: (docid, label int 0/1).
    IG(t) = H(label) - [P(t) H(label|t) + P(!t) H(label|!t)], computed
    from exact corpus counts (one explode + one groupBy — single
    shuffle; the label side broadcasts).
    """
    lab = labels.select("docid", F.col("label").cast("double").alias("_y"))
    n, n_pos = lab.agg(F.count(F.lit(1)), F.sum("_y")).collect()[0]
    n_pos = n_pos or 0.0
    base = float(n_pos) / n if n else 0.0

    post = tok_df.select(
        "docid", F.explode(F.array_distinct("toks")).alias("term")
    ).join(F.broadcast(lab), "docid")
    per_term = post.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("_y").alias("pos_with"),
    )
    df_c = F.col("df").cast("double")
    pos_with = F.col("pos_with")
    p_t = df_c / F.lit(float(n))
    p1_t = pos_with / df_c                                   # P(pos | term)
    p1_not = (F.lit(float(n_pos)) - pos_with) / (F.lit(float(n)) - df_c)
    h_base = _h(F.lit(base))
    ig = h_base - (p_t * _h(p1_t) + (1 - p_t) * _h(p1_not))
    return (
        per_term.where(F.col("df") >= min_df)
        .where(F.col("df") < n)  # a term in every doc splits nothing
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.round(ig, 4).alias("igain"),
        )
        .orderBy(F.desc("igain"), F.asc("term"))
        .limit(limit)
    )


def igain_terms_sql(label_expr: str, limit: int = 10, min_df: int = 5) -> str:
    """DuckDB twin over the `documents` view; label_expr is a boolean SQL
    expression over documents columns (e.g. "lang = 'en'")."""
    from solr_spark.analysis.analyzer import tokens_sql

    h = (
        "CASE WHEN {p} > 0 AND {p} < 1 THEN "
        "-({p}) * log2({p}) - (1 - ({p})) * log2(1 - ({p})) ELSE 0.0 END"
    )
    p_t = "(df / n.n)"
    p1_t = "(pos_with / df)"
    p1_not = "((n.np - pos_with) / (n.n - df))"
    return f"""
WITH toks AS (SELECT doc_id AS docid, {tokens_sql('text')} AS toks,
                     CASE WHEN {label_expr} THEN 1.0 ELSE 0.0 END AS y
              FROM documents),
n AS (SELECT count(*)::DOUBLE AS n, sum(y) AS np FROM toks),
post AS (SELECT DISTINCT docid, unnest(toks) AS term, y FROM toks),
per_term AS (
  SELECT term, count(*)::DOUBLE AS df, sum(y) AS pos_with
  FROM post GROUP BY term
)
SELECT term, df::BIGINT AS df,
       round(({h.format(p="n.np / n.n")})
             - ({p_t} * ({h.format(p=p1_t)})
                + (1 - {p_t}) * ({h.format(p=p1_not)})), 4) AS igain
FROM per_term, n
WHERE df >= {min_df} AND df < n.n
ORDER BY igain DESC, term LIMIT {limit}
"""


def textlogit_train(
    tok_df: DataFrame,
    labels: DataFrame,
    features: list[str],
    max_iter: int = 30,
    reg: float = 0.01,
):
    """Train LogisticRegression over term-presence features.

    Returns (model, assembled_df). Features are term-presence 0/1
    columns (the reference trains over tf vectors of selected terms —
    TextLogisticRegressionQParserPlugin.java's training loop); pyspark.ml
    runs the distributed iterations. Deterministic given fixed input.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    cols = [
        F.when(F.array_contains("toks", t), 1.0).otherwise(0.0).alias(f"f_{i}")
        for i, t in enumerate(features)
    ]
    data = (
        tok_df.select("docid", *cols)
        .join(labels.select("docid", F.col("label").cast("double")), "docid")
    )
    asm = VectorAssembler(
        inputCols=[f"f_{i}" for i in range(len(features))], outputCol="fv"
    )
    assembled = asm.transform(data)
    lr = LogisticRegression(
        featuresCol="fv", labelCol="label", maxIter=max_iter, regParam=reg,
        standardization=False,
    )
    return lr.fit(assembled), assembled


def ltr_rescore(
    candidates: DataFrame,
    model,
    feature_cols: list[str],
    k: int = 10,
    id_col: str = "docid",
) -> DataFrame:
    """Model-based re-scoring of a candidate set (role of the reference's
    LTR rescorer, contrib/ltr LTRRescorer.java: first-pass retrieval
    produces top-N, a trained model re-orders them). `model` is any
    fitted pyspark.ml classifier; P(class 1) becomes the relevance
    score. Runs on the k-winners' small frame — never the corpus."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    fcol = model.getFeaturesCol() if hasattr(model, "getFeaturesCol") else "_fv"
    asm = VectorAssembler(inputCols=feature_cols, outputCol=fcol)
    scored = model.transform(asm.transform(candidates))
    s = vector_to_array(F.col("probability")).getItem(1)
    return (
        scored.select(id_col, F.round(s, 6).alias("ltr_score"))
        .orderBy(F.desc("ltr_score"), F.asc(id_col))
        .limit(k)
    )


def textlogit_classify(
    tok_df: DataFrame, labels: DataFrame, features: list[str], **kw
) -> DataFrame:
    """Train + self-classify; returns (label, prediction, cnt) confusion
    counts — an aggregate robust enough for a rows-only driver check,
    with the accuracy bound asserted in pytest."""
    model, assembled = textlogit_train(tok_df, labels, features, **kw)
    pred = model.transform(assembled)
    return (
        pred.groupBy(
            F.col("label").cast("long").alias("label"),
            F.col("prediction").cast("long").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("label", "prediction")
    )


# ---- model persistence (store/load + index-free classify) ----

def model_store(model, features: list[str], path: str, spark) -> None:
    """Persist a trained textlogit model as a tiny parquet: one
    (term, weight) row per feature plus an `__intercept__` row — the
    role of the reference's model storage (ModelStream.java:49 reads
    models that update()/train() stored in a collection; here the
    "collection" is a parquet beside the index). Anything that can read
    parquet can score with it; no pyspark.ml classes needed at load."""
    rows = [(t, float(w)) for t, w in zip(features, model.coefficients)]
    rows.append(("__intercept__", float(model.intercept)))
    (
        spark.createDataFrame(rows, "term string, weight double")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def model_load(spark, path: str) -> tuple[list[str], list[float], float]:
    """(features, weights, intercept) from a model_store parquet."""
    rows = spark.read.parquet(path).collect()
    inter = 0.0
    feats: list[tuple[str, float]] = []
    for r in rows:
        if r["term"] == "__intercept__":
            inter = float(r["weight"])
        else:
            feats.append((r["term"], float(r["weight"])))
    feats.sort()
    return [t for t, _ in feats], [w for _, w in feats], inter


def classify_stored(tok_df: DataFrame, spark, path: str) -> DataFrame:
    """classify() against a STORED model (the ClassifyStream/ModelStream
    pair: io/stream/ClassifyStream.java scores tuples with a model
    fetched by ModelStream). Loads the (term, weight) parquet and scores
    sigmoid(intercept + Σ w_t * presence(t)) as pure Column arithmetic —
    whole-stage codegen, no pyspark.ml dependency, no per-row Python.
    Returns (docid, prob, prediction)."""
    feats, ws, b = model_load(spark, path)
    z = F.lit(b)
    for t, w in zip(feats, ws):
        z = z + F.when(F.array_contains("toks", t), F.lit(w)).otherwise(F.lit(0.0))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return tok_df.select(
        "docid",
        F.round(prob, 6).alias("prob"),
        (prob > 0.5).cast("long").alias("prediction"),
    )


# ---------------------------------------------------------------------------
# Solr LTR model formats scored as pure Columns. The reference's managed
# model store holds JSON models (contrib/ltr): LinearModel.java:72
# (weights dot normalized features) and MultipleAdditiveTreesModel.java
# (weighted regression-tree ensemble; scoreNode at :285 descends LEFT
# when feature <= threshold, with a +1e-6 split slack added to every
# stored threshold, :152). Normalizers (ltr/norm/): Identity, MinMax
# ((v-min)/(max-min)), Standard ((v-avg)/std). A model trained anywhere
# and exported in the Solr JSON shape scores here with zero Python in
# the row path — the whole ensemble compiles to one nested CASE-WHEN
# expression tree under whole-stage codegen.
# ---------------------------------------------------------------------------

#: the reference adds this to every parsed threshold (NODE_SPLIT_SLACK,
#: MultipleAdditiveTreesModel.java:125) so boundary values go left
_NODE_SPLIT_SLACK = 1e-6


def _ltr_norm(c: Column, norm: dict | None) -> Column:
    if not norm:
        return c
    cls = norm.get("class", "").rsplit(".", 1)[-1]
    p = norm.get("params", {})
    if cls in ("IdentityNormalizer", ""):
        return c
    if cls == "MinMaxNormalizer":
        lo, hi = float(p["min"]), float(p["max"])
        return (c - F.lit(lo)) / F.lit(hi - lo)
    if cls == "StandardNormalizer":
        return (c - F.lit(float(p["avg"]))) / F.lit(float(p["std"]))
    raise ValueError(f"unknown LTR normalizer {cls!r}")


def _ltr_features(model: dict, df=None) -> list[tuple[str, Column]]:
    """(name, normalized Column) per model feature; a feature reads the
    like-named DataFrame column. Null values read 0.0; a column absent
    from `df` (when given) also reads 0.0 — the reference's default for
    unextracted features. Without `df` the column must exist."""
    out = []
    for f in model.get("features", []):
        name = f["name"]
        if df is not None and name not in df.columns:
            c = F.lit(0.0)
        else:
            c = F.coalesce(F.col(name).cast("double"), F.lit(0.0))
        out.append((name, _ltr_norm(c, f.get("norm"))))
    return out


def _tree_node(node: dict, feats: dict[str, Column]) -> Column:
    if "value" in node:
        return F.lit(float(node["value"]))
    fname = node["feature"]
    if fname not in feats:
        raise ValueError(f"tree references unknown feature {fname!r}")
    thr = float(node["threshold"]) + _NODE_SPLIT_SLACK
    return F.when(
        feats[fname] <= thr, _tree_node(node["left"], feats)
    ).otherwise(_tree_node(node["right"], feats))


def ltr_model_score(model: dict, df=None) -> Column:
    """Compile a Solr LTR model JSON (the managed-store document) to a
    score Column. Supports LinearModel and MultipleAdditiveTreesModel;
    apply to any candidate frame carrying the feature columns, then
    sort desc — the LTRRescorer contract. Pass `df` to let features
    absent from the frame read the 0.0 default instead of failing
    analysis."""
    cls = model.get("class", "").rsplit(".", 1)[-1]
    feats = dict(_ltr_features(model, df))
    params = model.get("params", {})
    if cls == "LinearModel":
        weights = params.get("weights", {})
        if not weights:
            raise ValueError("LinearModel without weights")
        terms = [
            feats[name] * F.lit(float(w))
            for name, w in sorted(weights.items())
            if name in feats
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    if cls == "MultipleAdditiveTreesModel":
        trees = params.get("trees", [])
        if not trees:
            raise ValueError("MultipleAdditiveTreesModel without trees")
        out = None
        for t in trees:
            contrib = F.lit(float(t.get("weight", 1.0))) * _tree_node(
                t["root"], feats
            )
            out = contrib if out is None else out + contrib
        return out
    if cls == "NeuralNetworkModel":
        # feature ORDER is the model's features list order (the NN input
        # vector), not the weights-dict order the linear path sorts by
        ordered = [c for _, c in _ltr_features(model, df)]
        return _nn_score(ordered, params.get("layers", []))
    raise ValueError(f"unknown LTR model class {cls!r}")


def _nn_act(c: Column, name: str) -> Column:
    # NeuralNetworkModel.java:158-175 activation registry
    name = (name or "identity").lower()
    if name == "identity":
        return c
    if name == "relu":
        return F.greatest(c, F.lit(0.0))
    if name == "sigmoid":
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-c))
    if name == "tanh":
        return F.tanh(c)
    if name == "leakyrelu":  # slope 0.01 (NeuralNetworkModel.java:169)
        return F.when(c < 0, F.lit(0.01) * c).otherwise(c)
    raise ValueError(f"unknown NN activation {name!r}")


def _nn_score(feats: list[Column], layers: list[dict]) -> Column:
    """NeuralNetworkModel.java:203-216 calculateOutput: per layer,
    out_i = act(bias_i + sum_j w[i][j] * in_j); the last layer must
    produce one unit. Unrolled over the LITERAL weights — each neuron
    is one codegen'd arithmetic expression, no vectors materialized."""
    vec = feats
    for li, layer in enumerate(layers):
        w, b = layer["matrix"], layer["bias"]
        if any(len(row) != len(vec) for row in w):
            raise ValueError(f"NN layer {li}: matrix cols != input dim")
        nxt = []
        for i, row in enumerate(w):
            acc = F.lit(float(b[i]))
            for j, x in enumerate(vec):
                acc = acc + F.lit(float(row[j])) * x
            nxt.append(_nn_act(acc, layer.get("activation")))
        vec = nxt
    if len(vec) != 1:
        raise ValueError("NN output layer must have exactly 1 unit")
    return vec[0]


def ltr_load_model(path: str) -> dict:
    """Load a managed-store model JSON from disk, unwrapping
    DefaultWrapperModel (model/DefaultWrapperModel.java: the stored doc
    only names a `resource` holding the real model) — the fetch-by-
    resource indirection becomes a relative-path read."""
    import json as _json
    import os as _os

    with open(path) as f:
        model = _json.load(f)
    cls = model.get("class", "").rsplit(".", 1)[-1]
    if cls == "DefaultWrapperModel":
        resource = model.get("params", {}).get("resource")
        if not resource:
            raise ValueError("DefaultWrapperModel without params.resource")
        return ltr_load_model(_os.path.join(_os.path.dirname(path), resource))
    return model


def bayes_train(tok_df: DataFrame, label_col: str = "label") -> tuple:
    """Multinomial Naive Bayes trainer over (docid, toks, <label_col>) —
    the Bayes algorithm of ClassificationUpdateProcessorFactory
    (solr/core/src/java/org/apache/solr/update/processor/
    ClassificationUpdateProcessorFactory.java; the reference delegates
    to Lucene's SimpleNaiveBayesClassifier over indexed term stats).

    Returns (term_model, class_model):
      term_model  (label, term, llik) — log((tf_tc + 1) / (tok_c + V)),
                  vocabulary×classes rows, broadcast-sized
      class_model (label, prior, miss, n_classes) — log class prior,
                  the unseen-term penalty log(1 / (tok_c + V)), both
                  shared by every doc scored against that class

    One explode + two aggregations — the corpus is shuffled once on
    (label, term); everything downstream is vocabulary-sized.
    """
    toks = tok_df.select(
        F.col(label_col).alias("label"), F.explode("toks").alias("term")
    )
    tc = toks.groupBy("label", "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = float(tc.select("term").distinct().count())
    class_tot = tc.groupBy("label").agg(F.sum("tf").alias("tok_c"))
    n_docs = tok_df.count()
    doc_c = tok_df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    term_model = (
        tc.join(class_tot, "label")
        .select(
            "label",
            "term",
            F.log(
                (F.col("tf") + 1.0) / (F.col("tok_c") + F.lit(vocab))
            ).alias("llik"),
        )
    )
    class_model = (
        doc_c.join(class_tot, "label")
        .select(
            "label",
            F.log(F.col("n") / F.lit(float(n_docs))).alias("prior"),
            F.log(1.0 / (F.col("tok_c") + F.lit(vocab))).alias("miss"),
        )
    )
    return term_model, class_model


def bayes_classify(
    tok_df: DataFrame,
    term_model: DataFrame,
    class_model: DataFrame,
    out_col: str = "class_s",
) -> DataFrame:
    """Score (docid, toks) against a bayes_train model and return
    (docid, <out_col>, score) — argmax_c [prior_c + Σ_t llik(t|c) +
    misses·miss_c]. Unseen terms take the class's smoothing penalty, so
    every class scores every token (the Lucene classifier's behavior).

    Both model frames are vocabulary/class-sized → broadcast; the corpus
    shuffles once on docid for the per-(doc, class) sum. Ties (after
    rounding to 6 decimals) break on the larger label (deterministic:
    max over the (score, label) struct).
    """
    toks = tok_df.select("docid", F.explode("toks").alias("term"))
    n_tok = tok_df.select(
        "docid", F.size("toks").cast("double").alias("n_tok")
    )
    matched = (
        toks.join(F.broadcast(term_model), "term")
        .groupBy("docid", "label")
        .agg(F.sum("llik").alias("s"), F.count(F.lit(1)).cast("double").alias("m"))
    )
    grid = n_tok.crossJoin(F.broadcast(class_model.select("label")))
    scored = (
        grid.join(matched, ["docid", "label"], "left")
        .join(F.broadcast(class_model), "label")
        .select(
            "docid",
            "label",
            (
                F.col("prior")
                + F.coalesce(F.col("s"), F.lit(0.0))
                + (F.col("n_tok") - F.coalesce(F.col("m"), F.lit(0.0)))
                * F.col("miss")
            ).alias("score"),
        )
    )
    best = (
        scored.withColumn("score", F.round("score", 6))
        .groupBy("docid")
        .agg(F.max(F.struct("score", F.col("label"))).alias("_b"))
        .select(
            "docid",
            F.col("_b.label").alias(out_col),
            F.col("_b.score").alias("score"),
        )
    )
    return best.orderBy("docid")


def classify_update_processor(
    df: DataFrame,
    train_toks: DataFrame,
    id_col: str = "docid",
    toks_col: str = "toks",
    out_col: str = "class_s",
) -> DataFrame:
    """ClassificationUpdateProcessor as a chain stage: assign a class
    field to each incoming doc from a model trained on already-indexed
    docs (train_toks: docid, toks, label). Composes with apply_chain."""
    tm, cm = bayes_train(train_toks)
    toks = df.select(F.col(id_col).alias("docid"), F.col(toks_col).alias("toks"))
    labeled = bayes_classify(toks, tm, cm, out_col=out_col)
    return df.join(
        labeled.select(F.col("docid").alias(id_col), out_col, "score"),
        id_col,
        "left",
    )


def ltr_feature_log(model: dict, df: DataFrame) -> DataFrame:
    """The [features] transformer (solr/contrib/ltr
    LTRFeatureLoggerTransformerFactory): per-doc extracted+normalized
    feature values for every feature the model declares, appended as
    `feat_<name>` columns. Pure column arithmetic on the candidate
    frame — no shuffle, whole-stage codegen."""
    out = df
    for name, col in _ltr_features(model, df):
        out = out.withColumn(f"feat_{name}", F.round(col, 6))
    return out
