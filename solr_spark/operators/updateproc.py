"""Update-processor chain + copyField document construction.

Role of the reference's update request processor chain
(solr/core/src/java/org/apache/solr/update/processor/UpdateRequestProcessorChain.java:59
runs an ordered factory list over every incoming document; 71 factories
ship in update/processor/) and schema copyField fan-out
(solr/core/src/java/org/apache/solr/schema/IndexSchema.java:220
copyFields map, CopyField.java): each processor is a DataFrame -> DataFrame
column transform, a chain is their composition, and the whole pipeline
stays inside whole-stage codegen (no UDFs, no shuffles — processors are
narrow per-row maps, exactly like the reference's per-doc chain).

Factories with inherently non-deterministic output in the reference
(TimestampUpdateProcessorFactory = NOW, UUIDUpdateProcessorFactory =
random UUID) take the value/derivation explicitly so pipelines stay
replayable — at 100 TB a retried partition must produce identical rows.
"""

from __future__ import annotations

import fnmatch
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Processor = Callable[[DataFrame], DataFrame]


def copy_fields(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Apply copyField rules (source glob -> dest). Multiple sources
    landing in one dest build a multi-valued (array) column, matching
    the reference's multiValued dest semantics; a single source copies
    as a scalar. Unknown sources are skipped (schema-less leniency)."""
    dests: dict[str, list[str]] = {}
    for pattern, dest in rules:
        for c in df.columns:
            if fnmatch.fnmatchcase(c, pattern):
                dests.setdefault(dest, []).append(c)
    for dest, srcs in dests.items():
        if len(srcs) == 1 and dest not in df.columns:
            df = df.withColumn(dest, F.col(srcs[0]))
        else:
            vals = [F.col(s).cast("string") for s in srcs]
            if dest in df.columns:
                vals.insert(0, F.col(dest).cast("string"))
            df = df.withColumn(
                dest, F.filter(F.array(*vals), lambda v: v.isNotNull())
            )
    return df


# ---- processor factories (each returns a Processor) ----


def trim_fields(*cols: str) -> Processor:
    """TrimFieldUpdateProcessorFactory."""

    def run(df):
        for c in cols:
            df = df.withColumn(c, F.trim(F.col(c)))
        return df

    return run


def remove_blank(*cols: str) -> Processor:
    """RemoveBlankFieldUpdateProcessorFactory: '' -> null."""

    def run(df):
        for c in cols:
            df = df.withColumn(
                c, F.when(F.trim(F.col(c)) == "", None).otherwise(F.col(c))
            )
        return df

    return run


def regex_replace(col: str, pattern: str, replacement: str) -> Processor:
    """RegexReplaceProcessorFactory."""
    return lambda df: df.withColumn(
        col, F.regexp_replace(F.col(col), pattern, replacement)
    )


def html_strip(col: str) -> Processor:
    """HTMLStripFieldUpdateProcessorFactory (tag removal)."""
    return lambda df: df.withColumn(
        col, F.regexp_replace(F.col(col), r"<[^>]*>", "")
    )


def clone_field(src: str, dst: str) -> Processor:
    """CloneFieldUpdateProcessorFactory."""
    return lambda df: df.withColumn(dst, F.col(src))


#: ParseDateFieldUpdateProcessorFactory's stock format list, reduced to
#: the shapes Spark's Java-time patterns express directly
DEFAULT_DATE_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
)


def parse_date(
    *cols: str, formats: tuple[str, ...] = DEFAULT_DATE_FORMATS
) -> Processor:
    """ParseDateFieldUpdateProcessorFactory
    (solr/core/src/java/org/apache/solr/update/processor/
    ParseDateFieldUpdateProcessorFactory.java): parse string date fields
    into timestamps, trying each format in order — first success wins
    (try_to_timestamp returns null per format, coalesce picks the first
    parse; all JVM-side, no UDF). A value no format matches becomes
    null: a typed Spark column cannot keep Solr's leave-as-string
    fallback, so the miss is explicit instead of silently mixed-typed."""

    def run(df):
        for c in cols:
            parsed = F.coalesce(
                *[F.try_to_timestamp(F.col(c), F.lit(f)) for f in formats]
            )
            df = df.withColumn(c, parsed)
        return df

    return run


def concat_fields(dst: str, cols: list[str], sep: str = " ") -> Processor:
    """ConcatFieldUpdateProcessorFactory (dest = joined values)."""
    return lambda df: df.withColumn(
        dst, F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])
    )


def count_field_values(src: str, dst: str) -> Processor:
    """CountFieldValuesUpdateProcessorFactory (multi-valued arity)."""
    return lambda df: df.withColumn(
        dst,
        F.when(F.col(src).isNull(), 0).otherwise(F.size(F.col(src))).cast("int"),
    )


def dedupe_values(col: str) -> Processor:
    """UniqFieldsUpdateProcessorFactory: distinct values of an array field."""
    return lambda df: df.withColumn(col, F.array_distinct(F.col(col)))


def truncate_field(col: str, max_len: int) -> Processor:
    """TruncateFieldUpdateProcessorFactory."""
    return lambda df: df.withColumn(col, F.substring(F.col(col), 1, max_len))


def default_value(col: str, value) -> Processor:
    """DefaultValueUpdateProcessorFactory."""
    return lambda df: df.withColumn(col, F.coalesce(F.col(col), F.lit(value)))


def timestamp_field(col: str, value: str) -> Processor:
    """TimestampUpdateProcessorFactory — the reference stamps NOW; the
    ingest timestamp is passed in explicitly (one per batch) so retried
    partitions stay deterministic."""
    return lambda df: df.withColumn(
        col, F.coalesce(F.col(col) if col in df.columns else F.lit(None), F.lit(value)).cast("timestamp")
    )


def uuid_field(dst: str, from_cols: list[str]) -> Processor:
    """UUIDUpdateProcessorFactory — derived (content-addressed) instead
    of random: md5 of the key fields formatted as a v4-shaped UUID."""

    def run(df):
        h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in from_cols]))
        return df.withColumn(
            dst,
            F.concat_ws(
                "-",
                F.substring(h, 1, 8),
                F.substring(h, 9, 4),
                F.substring(h, 13, 4),
                F.substring(h, 17, 4),
                F.substring(h, 21, 12),
            ),
        )

    return run


def clone_field_regex(pattern: str, dest_template: str) -> Processor:
    """CloneFieldUpdateProcessorFactory with regex field matching
    (solr/core/src/java/org/apache/solr/update/processor/
    CloneFieldUpdateProcessorFactory.java: `pattern`/`dest` pair where
    dest may reference capture groups, e.g. pattern="feat(.*)s"
    dest="$1_full"): every column whose NAME fully matches `pattern`
    is cloned to the name produced by substituting the groups into
    `dest_template` ($1-style). Pure schema-level projection — no data
    movement; existing dest columns are overwritten, matching the
    reference's clone-then-chain behavior."""
    import re as _re

    rx = _re.compile(pattern)

    def run(df):
        for c in df.columns:
            m = rx.fullmatch(c)
            if m:
                dst = _re.sub(
                    r"\$(\d+)", lambda g: m.group(int(g.group(1))), dest_template
                )
                if dst != c:
                    df = df.withColumn(dst, F.col(c))
        return df

    return run


def doc_expiration(
    ttl_seconds: int,
    *,
    base_col: str = "_timestamp_",
    expire_col: str = "_expire_at_",
) -> Processor:
    """DocExpirationUpdateProcessorFactory
    (solr/core/src/java/org/apache/solr/update/processor/
    DocExpirationUpdateProcessorFactory.java): stamp an expiration
    instant = base + TTL onto every doc. The reference computes
    NOW()+TTL and runs a reaper thread; here the base instant comes
    from an existing column (replayable — a retried partition at 100 TB
    must stamp identical values) and reaping is the `expired_filter`
    predicate pushed down to the scan instead of a delete daemon."""
    def run(df):
        return df.withColumn(
            expire_col,
            F.col(base_col) + F.make_dt_interval(secs=F.lit(float(ttl_seconds))),
        )

    return run


def expired_filter(now: str, expire_col: str = "_expire_at_") -> Column:
    """Docs whose TTL has passed at instant `now` (ISO string) — the
    query-time half of DocExpiration's reaper."""
    return F.col(expire_col) <= F.lit(now).cast("timestamp")


def uuid_v3_field(dst: str, namespace: str, from_cols: list[str]) -> Processor:
    """UUIDUpdateProcessorFactory, name-based strategy: RFC 4122
    version-3-shaped UUID from md5(namespace || unit-sep-joined key
    fields) with the version nibble forced to 3 and the variant bits
    to 10xx. Unlike the reference's random UUIDs this is
    content-addressed (same doc -> same id on replay); the bit
    surgery is plain string ops so the DuckDB oracle can mirror it."""

    def run(df):
        h = F.md5(
            F.concat_ws(
                "\x1f", F.lit(namespace), *[F.col(c).cast("string") for c in from_cols]
            )
        )
        variant = F.translate(
            F.substring(h, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"
        )
        return df.withColumn(
            dst,
            F.concat_ws(
                "-",
                F.substring(h, 1, 8),
                F.substring(h, 9, 4),
                F.concat(F.lit("3"), F.substring(h, 14, 3)),
                F.concat(variant, F.substring(h, 18, 3)),
                F.substring(h, 21, 12),
            ),
        )

    return run


def uuid_v3_sql(namespace: str, from_cols: list[str]) -> str:
    """DuckDB twin of `uuid_v3_field` (same md5 + bit surgery)."""
    joined = " || chr(31) || ".join(f"({c})::VARCHAR" for c in from_cols)
    h = f"md5('{namespace}' || chr(31) || {joined})"
    return (
        f"substr({h},1,8) || '-' || substr({h},9,4) || '-3' || "
        f"substr({h},14,3) || '-' || "
        f"translate(substr({h},17,1),'0123456789abcdef','89ab89ab89ab89ab')"
        f" || substr({h},18,3) || '-' || substr({h},21,12)"
    )


def ignore_fields(pattern: str) -> Processor:
    """IgnoreFieldUpdateProcessorFactory: drop every column whose name
    fully matches `pattern` (schema-level projection, no data move)."""
    import re as _re

    rx = _re.compile(pattern)

    def run(df):
        keep = [c for c in df.columns if not rx.fullmatch(c)]
        return df.select(*keep)

    return run


def first_field_value(col: str) -> Processor:
    """FirstFieldValueUpdateProcessorFactory: collapse a multivalued
    (array) column to its first element."""
    return lambda df: df.withColumn(col, F.element_at(F.col(col), 1))


def last_field_value(col: str) -> Processor:
    """LastFieldValueUpdateProcessorFactory."""
    return lambda df: df.withColumn(col, F.element_at(F.col(col), -1))


def min_field_value(col: str) -> Processor:
    """MinFieldValueUpdateProcessorFactory: multivalued -> min element."""
    return lambda df: df.withColumn(col, F.array_min(F.col(col)))


def max_field_value(col: str) -> Processor:
    """MaxFieldValueUpdateProcessorFactory."""
    return lambda df: df.withColumn(col, F.array_max(F.col(col)))


def detect_language(src: str, dst: str = "language_s") -> Processor:
    """TikaLanguageIdentifierUpdateProcessorFactory analog
    (solr/contrib/langid): stamp the n-gram-heuristic language id of a
    text column onto the doc, reusing the pipeline's `lang_id`
    expression (pure Column, no UDF)."""
    from solr_spark.operators.textstats import lang_id_col

    return lambda df: df.withColumn(dst, lang_id_col(F.col(src)))


def parse_numeric(col: str, dtype: str = "double") -> Processor:
    """ParseDoubleFieldUpdateProcessorFactory family (unparseable -> null)."""
    return lambda df: df.withColumn(col, F.col(col).cast(dtype))


def field_length(src: str, dst: str) -> Processor:
    """FieldLengthUpdateProcessorFactory."""
    return lambda df: df.withColumn(dst, F.length(F.col(src)).cast("int"))


def min_field(col: str, floor_value) -> Processor:
    """MinFieldValueUpdateProcessorFactory-shaped clamp."""
    return lambda df: df.withColumn(col, F.greatest(F.col(col), F.lit(floor_value)))


def max_field(col: str, ceil_value) -> Processor:
    """MaxFieldValueUpdateProcessorFactory-shaped clamp."""
    return lambda df: df.withColumn(col, F.least(F.col(col), F.lit(ceil_value)))


def signature_field(
    dst: str, cols: list[str], algo: str = "md5"
) -> Processor:
    """SignatureUpdateProcessorFactory
    (solr/core/src/java/org/apache/solr/update/processor/
    SignatureUpdateProcessorFactory.java): stamp a content signature
    over the named fields for dedup. The reference ships MD5Signature
    (exact, hex) and Lookup3Signature (64-bit); here `md5` is the full
    hex digest and `lookup3` the first 16 hex chars of it (a 64-bit
    content hash with the same role — the exact Lookup3 bit pattern is
    not part of any query contract). Null fields hash as empty, joined
    with a unit separator so ("ab","c") != ("a","bc")."""
    if algo not in ("md5", "lookup3"):
        raise ValueError(f"signature_field: unknown algo {algo!r}")
    def run(df):
        src = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
        )
        sig = F.md5(src)
        if algo == "lookup3":
            sig = sig.substr(1, 16)
        return df.withColumn(dst, sig)

    return run


def template_field(dst: str, template: str) -> Processor:
    """TemplateUpdateProcessorFactory
    (update/processor/TemplateUpdateProcessorFactory.java): build a
    field from a template with {fieldName} substitutions, e.g.
    "{firstName} {lastName}". Unknown names substitute as empty (the
    reference's leniency); pure concat — whole-stage codegen."""
    import re as _re

    parts = _re.split(r"(\{[A-Za-z_][A-Za-z0-9_.]*\})", template)

    def run(df):
        cols = []
        for p in parts:
            if p.startswith("{") and p.endswith("}"):
                name = p[1:-1]
                cols.append(
                    F.coalesce(F.col(name).cast("string"), F.lit(""))
                    if name in df.columns
                    else F.lit("")
                )
            elif p:
                cols.append(F.lit(p))
        return df.withColumn(dst, F.concat(*cols) if cols else F.lit(""))

    return run


def regexp_boost(
    src: str, pattern: str, boost: float, boost_col: str = "boost_d"
) -> Processor:
    """RegexpBoostProcessor
    (update/processor/RegexpBoostProcessor.java): when `src` matches
    `pattern`, MULTIPLY the running boost field by `boost` (the
    reference reads/writes a boost field so multiple rules compose).
    Creates the boost column at 1.0 if absent."""
    def run(df):
        base = (
            F.col(boost_col).cast("double")
            if boost_col in df.columns
            else F.lit(1.0)
        )
        return df.withColumn(
            boost_col,
            F.when(F.col(src).rlike(pattern), base * F.lit(boost)).otherwise(base),
        )

    return run


def url_classify(src: str, prefix: str = "url_") -> Processor:
    """URLClassifyProcessor
    (update/processor/URLClassifyProcessor.java): derive url_length,
    url_levels (path depth), url_toplevel (registered domain's last
    label), url_landingpage (path is / or empty), and a canonical form
    (lowercased scheme+host, default ports dropped, trailing / trimmed)
    from a URL column — all JVM-side via parse_url/regexp."""
    def run(df):
        u = F.col(src)
        host = F.lower(F.parse_url(u, F.lit("HOST")))
        path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
        scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
        canonical = F.concat(
            scheme, F.lit("://"), host,
            F.regexp_replace(path, r"/$", ""),
        )
        levels = F.size(
            F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
        )
        return (
            df.withColumn(f"{prefix}length", F.length(u).cast("int"))
            .withColumn(f"{prefix}levels", levels)
            .withColumn(
                f"{prefix}toplevel",
                F.element_at(F.split(host, r"\."), -1),
            )
            .withColumn(
                f"{prefix}landingpage",
                (path == F.lit("")) | (path == F.lit("/")),
            )
            .withColumn(f"{prefix}canonical", canonical)
        )

    return run


def ignore_large_document(max_bytes: int, cols: list[str] | None = None) -> Processor:
    """IgnoreLargeDocumentProcessorFactory
    (update/processor/IgnoreLargeDocumentProcessorFactory.java): DROP
    documents whose estimated size exceeds `max_bytes` (the reference
    throws per-doc; a DataFrame chain filters — the Tolerant behavior).
    Size = sum of string lengths of `cols` (default: all string
    columns), a predicate the scan can evaluate without materializing
    the doc."""
    def run(df):
        use = cols or [
            c for c, t in df.dtypes if t == "string"
        ]
        size = None
        for c in use:
            term = F.coalesce(F.length(F.col(c)), F.lit(0)).cast("long")
            size = term if size is None else size + term
        return df.where((size if size is not None else F.lit(0)) <= max_bytes)

    return run


def skip_existing(existing: DataFrame, id_col: str) -> Processor:
    """SkipExistingDocumentsProcessorFactory
    (update/processor/SkipExistingDocumentsProcessorFactory.java):
    drop incoming docs whose id already exists — a LEFT ANTI join
    against the index's docs frame (broadcast when small, shuffle
    co-partitioned on the id otherwise; Catalyst picks)."""
    keyed = existing.select(F.col(id_col).alias("__skip_id")).distinct()

    def run(df):
        return df.join(
            keyed, df[id_col] == F.col("__skip_id"), "left_anti"
        )

    return run


def field_name_mutating(pattern: str, replacement: str) -> Processor:
    """FieldNameMutatingUpdateProcessorFactory
    (update/processor/FieldNameMutatingUpdateProcessorFactory.java):
    rename every column by regex substitution (the reference's
    pattern/replacement config). Pure projection; a rename that
    collides with an existing name raises (same as the reference's
    last-wins overwrite would silently lose data — we fail loudly)."""
    import re as _re

    rx = _re.compile(pattern)

    def run(df):
        newnames = [rx.sub(replacement, c) for c in df.columns]
        if len(set(newnames)) != len(newnames):
            raise ValueError(
                f"field_name_mutating: renames collide: {newnames}"
            )
        return df.select(
            *[F.col(c).alias(n) for c, n in zip(df.columns, newnames)]
        )

    return run


def parse_boolean(
    col: str,
    true_values: tuple[str, ...] = ("true", "t", "1", "on", "yes", "y"),
) -> Processor:
    """ParseBooleanFieldUpdateProcessorFactory
    (update/processor/ParseBooleanFieldUpdateProcessorFactory.java):
    case-insensitive membership in trueValues -> true, in the
    reference's default falseValues -> false, else null."""
    false_values = ("false", "f", "0", "off", "no", "n")
    lc = F.lower(F.trim(F.col(col).cast("string")))
    return lambda df: df.withColumn(
        col,
        F.when(lc.isin([v.lower() for v in true_values]), F.lit(True))
        .when(lc.isin(list(false_values)), F.lit(False))
        .otherwise(F.lit(None).cast("boolean")),
    )


def tolerant_split(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """TolerantUpdateProcessorFactory
    (update/processor/TolerantUpdateProcessorFactory.java): the
    reference tolerates up to maxErrors bad documents per request and
    reports each failure instead of aborting the whole update. At
    Spark scale the analogue is a QUARANTINE SPLIT: `checks` maps an
    error label to a must-hold predicate; rows failing any check route
    to the quarantine frame tagged with every failed label (`_errors_`
    array), passing rows continue down the chain. One pass over the
    data, both frames from the same scan — a 1000-executor ingest of
    dirty data must not die on row one billion.

    maxErrors-style gating is the caller's policy: count() the
    quarantine and abort if it exceeds the budget."""
    err = F.array_compact(
        F.array(
            *[
                F.when(~pred, F.lit(label))
                for label, pred in sorted(checks.items())
            ]
        )
    )
    tagged = df.withColumn("_errors_", err)
    ok = tagged.where(F.size("_errors_") == 0).drop("_errors_")
    bad = tagged.where(F.size("_errors_") > 0)
    return ok, bad


def flatten_nested(
    df: DataFrame,
    children_col: str,
    root_col: str = "_root_",
    id_col: str | None = None,
    level_col: str = "_nest_level_",
) -> DataFrame:
    """NestedUpdateProcessorFactory + the _root_ convention
    (update/processor/NestedUpdateProcessorFactory.java; the reference
    stamps _root_/_nest_path_ on child documents so block joins can
    reassemble families): explode an array-of-struct children column
    into child ROWS carrying the parent's id as `root_col`, unioned
    with the parent rows (children dropped, level 0). The output is
    exactly the explicit-root layout operators/blockjoin.py queries —
    index-time nesting becomes a flat table with lineage columns
    instead of segment-position magic."""
    pid = id_col or df.columns[0]
    parents = (
        df.drop(children_col)
        .withColumn(root_col, F.col(pid))
        .withColumn(level_col, F.lit(0))
    )
    child_struct = df.select(
        F.col(pid).alias(root_col), F.explode(children_col).alias("_c")
    )
    kids = child_struct.select(
        root_col, "_c.*"
    ).withColumn(level_col, F.lit(1))
    # align schemas: parents and children usually differ — union by
    # name with missing columns null-filled
    return parents.unionByName(kids, allowMissingColumns=True)


def apply_chain(df: DataFrame, processors: list[Processor]) -> DataFrame:
    """Run the ordered chain (UpdateRequestProcessorChain.createProcessor
    composition order)."""
    for p in processors:
        df = p(df)
    return df


# ---- atomic update ops on multivalued fields ----
# (AtomicUpdateDocumentMerger.java add/remove/removeregex beside the
# set/inc merge the gate's atomic_update_merge entry shows; each op is a
# pure Column so the merge stays one broadcast join + projection)

def arr_add(base: Column, v: Column) -> Column:
    """Solr atomic `add`: append (duplicates allowed); null update = no-op.

    A null BASE (document missing the field) creates the field with the
    added value — Solr's add on an absent field materializes it
    (AtomicUpdateDocumentMerger.doAdd); F.concat would propagate null."""
    return F.when(v.isNull(), base).otherwise(
        F.when(base.isNull(), F.array(v)).otherwise(F.concat(base, F.array(v)))
    )


def arr_add_distinct(base: Column, v: Column) -> Column:
    """Solr atomic `add-distinct` (same null-base semantics as add)."""
    return F.when(v.isNull(), base).otherwise(
        F.when(base.isNull(), F.array(v)).otherwise(F.array_union(base, F.array(v)))
    )


def arr_remove(base: Column, v: Column) -> Column:
    """Solr atomic `remove`: drop ALL occurrences of the value."""
    return F.when(v.isNull(), base).otherwise(
        F.filter(base, lambda x: ~x.eqNullSafe(v))
    )


def arr_remove_regex(base: Column, pattern: Column) -> Column:
    """Solr atomic `removeregex`: drop elements matching the regex."""
    return F.when(pattern.isNull(), base).otherwise(
        F.filter(base, lambda x: ~F.regexp_like(x, pattern))
    )


def version_constrained_merge(
    current: DataFrame,
    updates: DataFrame,
    id_col: str = "id",
    version_col: str = "_version_",
) -> DataFrame:
    """DocBasedVersionConstraintsProcessorFactory
    (solr/core/src/java/org/apache/solr/update/processor/
    DocBasedVersionConstraintsProcessorFactory.java): an update replaces
    the stored doc only when its user-version field STRICTLY exceeds the
    stored one; stale and equal-version updates are dropped. One union +
    one max_by aggregation keyed by id — no window, no per-row Python;
    ties break toward the CURRENT doc (Solr rejects <=)."""
    cols = current.columns
    cur = current.select(*cols).withColumn("_pref", F.lit(1))
    upd = updates.select(*cols).withColumn("_pref", F.lit(0))
    payload = [c for c in cols if c != id_col]
    allrows = cur.unionByName(upd)
    return (
        allrows.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(*payload),
                F.struct(F.col(version_col), F.col("_pref")),
            ).alias("_s")
        )
        .select(id_col, "_s.*")
    )


#: AddSchemaFieldsUpdateProcessorFactory's default type chain, reduced
#: to Spark-typed targets (booleans before longs would misparse nothing
#: here; Solr's order is long -> double -> date -> boolean -> text)
_SCHEMALESS_CHAIN = (
    ("bigint", "long"),
    ("double", "double"),
    ("timestamp", "date"),
    ("boolean", "boolean"),
)


def infer_schema_fields(
    df: DataFrame, cols: list[str] | None = None
) -> tuple[DataFrame, dict[str, str]]:
    """AddSchemaFieldsUpdateProcessorFactory (schemaless mode,
    solr/core/src/java/org/apache/solr/update/processor/
    AddSchemaFieldsUpdateProcessorFactory.java): infer each string
    field's type from its VALUES — the first type in the chain
    long -> double -> date -> boolean that every non-null value parses
    as wins, else the field stays text. ONE aggregate job computes
    (non-null count, per-type parse-success count) for all candidate
    columns together; the cast is then a plain projection. Returns
    (typed_df, {col: chosen_type})."""
    cand = cols or [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    if not cand:
        return df, {}
    aggs = []
    for c in cand:
        aggs.append(F.count(F.col(c)).alias(f"_n_{c}"))
        for sqlt, label in _SCHEMALESS_CHAIN:
            ok = F.col(c).try_cast(sqlt).isNotNull() | F.col(c).isNull()
            aggs.append(F.sum(F.when(ok, 0).otherwise(1)).alias(f"_bad_{label}_{c}"))
    row = df.agg(*aggs).collect()[0]
    chosen: dict[str, str] = {}
    out = df
    for c in cand:
        if row[f"_n_{c}"] == 0:
            chosen[c] = "string"  # all-null: no evidence, stay text
            continue
        for sqlt, label in _SCHEMALESS_CHAIN:
            if row[f"_bad_{label}_{c}"] == 0:
                chosen[c] = label
                out = out.withColumn(c, F.col(c).cast(sqlt))
                break
        else:
            chosen[c] = "string"
    return out, chosen


#: Solr's stock dynamic-field suffix conventions (managed-schema
#: defaults), reduced to Spark types
DEFAULT_DYNAMIC_RULES = (
    ("*_i", "int"),
    ("*_is", "array<int>"),
    ("*_l", "bigint"),
    ("*_f", "float"),
    ("*_d", "double"),
    ("*_b", "boolean"),
    ("*_dt", "timestamp"),
    ("*_s", "string"),
    ("*_ss", "array<string>"),
    ("*_t", "string"),
)


def dynamic_field_types(
    df: DataFrame,
    rules: tuple[tuple[str, str], ...] = DEFAULT_DYNAMIC_RULES,
) -> tuple[DataFrame, dict[str, str]]:
    """Dynamic-field typing (solr/core/src/java/org/apache/solr/schema/
    IndexSchema.java:136-138 dynamicFields: the FIRST matching glob
    pattern decides an unknown field's type — Solr's `*_i -> pint`
    suffix conventions). Matching columns try_cast to the rule's type
    (unparseable values -> null, the explicit-miss policy parse_date
    uses); non-matching columns pass through. Pure projection — no
    shuffle, no data pass. Returns (typed_df, {col: type})."""
    chosen: dict[str, str] = {}
    out = df
    for c in df.columns:
        for pat, t in rules:
            if fnmatch.fnmatchcase(c, pat):
                chosen[c] = t
                out = out.withColumn(c, F.col(c).try_cast(t))
                break
    return out, chosen


def time_routed_write(
    df: DataFrame,
    root: str,
    ts_col: str,
    gap: str = "month",
    category_col: str | None = None,
) -> None:
    """TimeRoutedAlias / CategoryRoutedAlias routing
    (solr/core/src/java/org/apache/solr/cloud/api/collections/
    TimeRoutedAlias.java): documents land in the collection for their
    timestamp bucket (+ optional category). Spark shape: ONE write
    partitioned by the derived `_route_` column(s) — readers filtering
    on the bucket get partition pruning, the exact benefit the alias
    machinery buys the reference (queries against a time window only
    touch that window's collections)."""
    bucket = F.date_format(
        F.date_trunc(gap, F.col(ts_col)), "yyyy-MM-dd"
    ).alias("_route_")
    out = df.withColumn("_route_", bucket)
    parts = ["_route_"]
    if category_col:
        out = out.withColumn("_route_cat_", F.col(category_col))
        parts.append("_route_cat_")
    out.write.mode("overwrite").partitionBy(*parts).parquet(root)


def time_routed_read(
    spark, root: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """Read back a time-routed table; [start, end) prune to the routed
    partitions (verify with .explain: the `_route_` filters appear as
    PartitionFilters, not data filters)."""
    df = spark.read.parquet(root)
    if start:
        df = df.where(F.col("_route_") >= start)
    if end:
        df = df.where(F.col("_route_") < end)
    return df
