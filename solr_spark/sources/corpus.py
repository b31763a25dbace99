"""Corpus sources: the north-rule input table and the harness `documents` table.

The north rule's input is an Iceberg table
(repo:string, path:string, commit:string, lang:string, content:string).
Iceberg jars are not available in this sandbox, so tables are parquet;
every write/read goes through these helpers so swapping in an Iceberg
catalog is a one-file change.

`synthesize_corpus` builds that table deterministically (seeded), fully
JVM-side (spark.range + hash-derived column expressions — no Python in
the generation path, byte-identical across runs and parallelism levels).
Content is code-like: camelCase/snake_case/digit identifiers so the
word-delimiter analysis is exercised, a Zipf-ish head so a handful of
terms appear in most documents (skew/salting stress), plus mid- and
tail-frequency identifiers. Mirrors the reference's seeded benchmark doc
generator pattern (solr/benchmark/src/java/org/apache/solr/bench/Docs.java,
SplittableRandomGenerator.java) without copying it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Vocabulary tiers. Head terms appear in >50% of docs (skew); mid terms are
# language keywords / common identifiers; tail terms are rare identifiers
# generated per-doc from hashes.
_HEAD = ["return", "import", "self", "value", "data"]
_MID = [
    "def", "class", "public", "static", "void", "int", "string", "for",
    "while", "if", "else", "try", "catch", "throw", "new", "null", "true",
    "false", "func", "let", "const", "var", "struct", "impl", "match",
    "parseInput", "writeOutput", "bufferSize", "maxRetries", "userName",
    "httpClient", "jsonParser", "utf8Parser2", "readFile", "toString",
    "hashCode", "getValue", "setValue", "indexOf", "appendChild",
]
_LANGS = ["java", "py", "js", "go", "rs", "c", "md"]
_EXT = {"java": "java", "py": "py", "js": "js", "go": "go", "rs": "rs", "c": "c", "md": "md"}


def _pick(arr: list[str], h) -> F.Column:
    lit = F.array(*[F.lit(w) for w in arr])
    return F.element_at(lit, (F.pmod(h, F.lit(len(arr))) + F.lit(1)).cast("int"))


def synthesize_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    tail_card: int | None = None,
) -> DataFrame:
    """Deterministic synthetic source-code corpus of exactly `n_docs` rows.

    (repo, path, commit) is unique by construction (path embeds the row id).

    `tail_card` is the cardinality of the numeric suffix on generated tail
    identifiers (default n_docs/10, min 50): the analyzer splits digits
    into standalone tokens, so this controls how RARE the rarest tokens
    are — a realistic Zipf tail (head terms in >50% of docs, tail tokens
    in ~0.1%) rather than an all-head vocabulary. Block-max pruning and
    idf spread are meaningless without it.
    """
    tail_card = tail_card or max(50, n_docs // 10)
    df = spark.range(0, n_docs, numPartitions=partitions or max(1, n_docs // 5000))
    i = F.col("id")

    def h(tag: int) -> F.Column:
        return F.abs(F.xxhash64(i, F.lit(seed), F.lit(tag)))

    repo = F.concat(
        F.lit("org"), F.pmod(i, F.lit(7)).cast("string"),
        F.lit("/repo"), F.pmod(i, F.lit(97)).cast("string"),
    )
    lang = _pick(_LANGS, F.pmod(h(1), F.lit(10)))  # zipf-ish: mod 10 over 7 langs
    ext = _pick([_EXT[lang] for lang in _LANGS], F.pmod(h(1), F.lit(10)))
    path = F.concat(
        F.lit("src/m"), F.pmod(h(2), F.lit(13)).cast("string"),
        F.lit("/File"), i.cast("string"), F.lit("."), ext,
    )
    commit = F.lower(F.concat(F.sha2(F.concat(repo, path, F.lit(seed)), 256)).substr(1, 40))

    # content: 30..600 tokens; each position draws head (p~.2 of slots), mid,
    # or a tail identifier derived from (doc, position) hashes.
    n_tokens = (F.pmod(h(3), F.lit(571)) + F.lit(30)).cast("int")
    idx = F.sequence(F.lit(0), n_tokens - F.lit(1))

    def token_at(j):
        hj = F.abs(F.xxhash64(i, j, F.lit(seed)))
        sel = F.pmod(hj, F.lit(10))
        tail = F.concat(
            _pick(["get", "set", "parse", "build", "read", "write"], hj),
            _pick(["Token", "Buffer", "Node", "Index", "Shard", "Query"], F.shiftright(hj, 7)),
            F.pmod(F.shiftright(hj, 13), F.lit(tail_card)).cast("string"),
        )
        return (
            F.when(sel < 2, _pick(_HEAD, F.shiftright(hj, 3)))
            .when(sel < 7, _pick(_MID, F.shiftright(hj, 5)))
            .otherwise(tail)
        )

    def sep_at(j):
        return _pick([" ", " ", " ", "(", ");\n", " = ", ".", ", "], F.abs(F.xxhash64(j, i, F.lit(seed + 1))))

    content = F.array_join(
        F.transform(idx, lambda j: F.concat(token_at(j), sep_at(j))), ""
    )
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the harness `documents` table (doc_id, text, lang, source,
    n_chars) to the engine's corpus shape. doc_id is already a dense
    deterministic id, so it becomes the docid directly."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.col("text"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("docid"),
    )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
