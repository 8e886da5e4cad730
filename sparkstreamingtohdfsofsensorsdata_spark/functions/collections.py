"""Array / map / JSON function families (SURVEY.md §2.8).

The array family runs over ``embeddings.embedding`` (array<float>, the
LLM-pipeline vector column). Floats are widened to double BEFORE any
arithmetic on both engines: float32->float64 widening is exact and both
engines then fold the dot product in element order, so results match
bit-for-bit.

Higher-order functions (transform/filter/aggregate/zip_with) are the
idiomatic Spark way to compute per-vector math without leaving the JVM
— this is what keeps vector ops off the Python slow path at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load


@query(
    "q_fn_array",
    oracle="""
        WITH v AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        )
        SELECT vec_id, label,
               len(emb)                                              AS dim,
               round(emb[1], 6)                                      AS first_elem,
               round(emb[len(emb)], 6)                               AS last_elem,
               -- fold-with-init semantics: an EMPTY list sums to 0
               -- (Spark's aggregate starts from the 0.0 accumulator)
               -- where bare list_sum([]) is NULL; a NULL list is NULL
               -- on both. Indexing is len-relative, not a hardcoded
               -- fixture dim: out-of-range list indexes are NULL in
               -- DuckDB, and the Spark side guards with when(size>0)
               -- because ANSI element_at would raise instead.
               CASE WHEN emb IS NOT NULL THEN
                    round(coalesce(list_sum(list_transform(emb, x -> x * x)), 0.0), 6)
               END                                                   AS self_dot,
               CASE WHEN emb IS NOT NULL THEN
                    round(coalesce(list_sum(list_filter(emb, x -> x > 0)), 0.0), 6)
               END                                                   AS pos_sum,
               len(list_filter(emb, x -> x > 0))                     AS n_pos,
               round(list_sort(emb)[1], 6)                           AS min_elem,
               round(list_sort(emb)[len(emb)], 6)                    AS max_elem,
               CASE WHEN emb IS NOT NULL THEN
                    round(coalesce(list_sum(list_transform(emb[1:8], x -> x)), 0.0), 6)
               END                                                   AS head_sum
        FROM v
        WHERE vec_id % 5 = 0
    """,
    description="Array family + HOFs: size/element_at/slice/sort/filter/aggregate over vectors",
    tags=("function", "array", "llm"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    v = emb.withColumn(
        "emb", F.transform("embedding", lambda x: x.cast("double"))
    )
    pos = F.filter("emb", lambda x: x > 0)
    fsum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    # when(size > 0, ...) guards every positional access: under ANSI
    # mode (the Spark 4 default) element_at RAISES on an out-of-range
    # or zero index, where the oracle's list index is NULL — and the
    # last/max indexes are size-relative, not the fixture's dim.
    def at(arr, idx):
        return F.when(F.size(arr) > 0, F.element_at(arr, idx))

    emb = F.col("emb")
    return v.select(
        "vec_id",
        "label",
        F.size("emb").alias("dim"),
        F.round(at(emb, F.lit(1)), 6).alias("first_elem"),
        F.round(at(emb, F.size("emb")), 6).alias("last_elem"),
        F.round(fsum(F.transform("emb", lambda x: x * x)), 6).alias("self_dot"),
        F.round(fsum(pos), 6).alias("pos_sum"),
        F.size(pos).alias("n_pos"),
        F.round(at(F.array_sort("emb"), F.lit(1)), 6).alias("min_elem"),
        F.round(at(F.array_sort("emb"), F.size("emb")), 6).alias("max_elem"),
        F.round(fsum(F.slice("emb", 1, 8)), 6).alias("head_sum"),
    )


MAP_SCHEMA = T.MapType(T.StringType(), T.IntegerType())

# The one DuckDB-side spelling of "the typed INT32 field $.k, NULL for
# malformed/non-integer/overflowing input" — shared by the q_fn_json
# oracle and the JSON ingest oracle (operators/scans.py), so the
# validity domain has a single definition. Caveat it documents: DuckDB
# json_valid (yyjson) is LAXER than Spark's parser — it accepts
# trailing commas and NaN/Infinity literals Spark rejects — so
# lax-but-not-strict JSON documents are OUTSIDE the stated input
# contract (props is NULL, malformed-for-both, or strict JSON).
JSON_K_INT_SQL = """CASE WHEN coalesce(json_valid(props), false) THEN
                 CASE WHEN json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
                      THEN TRY_CAST(props->>'k' AS INTEGER) END END"""


@query(
    "q_fn_map",
    oracle="""
        -- The nested json_valid-then-json_type='OBJECT' CASEs mirror
        -- Spark's typed map parse domain: the parse returns NULL (not
        -- an empty/partial map) for anything that is not a JSON
        -- OBJECT, and the outer CASE keeps json_type() off malformed
        -- input, where it raises instead of returning NULL.
        SELECT event_id,
               CASE WHEN coalesce(json_valid(props), false) THEN
                 CASE WHEN json_type(props) = 'OBJECT'
                      THEN json_keys(props)[1] END END          AS only_key,
               CASE WHEN coalesce(json_valid(props), false) THEN
                 CASE WHEN json_type(props) = 'OBJECT'
                      THEN TRY_CAST(props->>'k' AS INTEGER) END END
                                                                AS k_value,
               CASE WHEN coalesce(json_valid(props), false) THEN
                 CASE WHEN json_type(props) = 'OBJECT'
                      THEN len(json_keys(props)) END END        AS n_keys,
               CASE WHEN coalesce(json_valid(props), false) THEN
                 CASE WHEN json_type(props) = 'OBJECT'
                      THEN TRY_CAST(props->>(json_keys(props)[1]) AS INTEGER) * 2
                 END END                                        AS k_doubled
        FROM events
        WHERE event_id % 9 = 0
    """,
    description="Map family: from_json to map, map_keys/values/element_at/map size",
    tags=("function", "map"),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input contract: ``props`` is NULL, malformed text, or a JSON
    object whose values are integers (what the events table carries) —
    a wrong-TYPED value fails Spark's whole typed map parse while the
    oracle's per-key TRY_CAST nulls just that key, so value typing is
    the declared boundary, not something this query reconciles. Within
    the contract both sides agree on every shape: NULL/malformed props
    -> all-NULL row, '{}' -> 0 keys, missing 'k' -> NULL value,
    multi-key objects -> first key in document order."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 0)
    m = ev.withColumn("pmap", F.from_json("props", MAP_SCHEMA))
    return m.select(
        "event_id",
        F.try_element_at(F.map_keys("pmap"), F.lit(1)).alias("only_key"),
        F.element_at("pmap", F.lit("k")).alias("k_value"),
        F.size("pmap").alias("n_keys"),
        (F.try_element_at(F.map_values("pmap"), F.lit(1)) * 2).alias("k_doubled"),
    )


# THE Spark-side typed-parse schema for events.props — single
# definition shared with operators/scans.py (q_scan_csv_json), the
# same way JSON_K_INT_SQL is the shared DuckDB half of the contract
# (review r6): widening k or adding a field lands everywhere at once.
PROPS_STRUCT = T.StructType([T.StructField("k", T.IntegerType())])


@query(
    "q_fn_json",
    oracle=f"""
        SELECT event_id,
               CASE WHEN coalesce(json_valid(props), false)
                    THEN props->>'k' END                        AS k_raw,
               -- typed extraction is NULL unless $.k is json-INTEGER
               -- (json_type: UBIGINT positive, BIGINT negative) —
               -- mirroring Spark's typed from_json, which nulls a
               -- wrong-typed field instead of coercing '3.7'/'"7"'.
               {JSON_K_INT_SQL}                                 AS k_typed,
               coalesce(CAST(json_valid(props) AS INTEGER), 0)  AS is_valid_json,
               -- TRY_CAST, twice: an int64-range k overflows INT32 —
               -- Spark's typed parse nulls it, a plain CAST raises.
               -- The rebuilt document exists exactly when k_typed does.
               CASE WHEN coalesce(json_valid(props), false) THEN
                 CASE WHEN json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
                       AND TRY_CAST(props->>'k' AS INTEGER) IS NOT NULL
                      THEN '{{"k":' || (props->>'k') || '}}' END END
                                                                AS rebuilt_json
        FROM events
        WHERE event_id % 9 = 4
    """,
    description="JSON family: get_json_object/from_json/to_json round-trip",
    tags=("function", "json"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity comes from ``try_parse_json`` (the real JSON-syntax
    probe), not from the typed struct parse: permissive ``from_json``
    returns an all-NULL struct for malformed input, so ``p IS NOT
    NULL`` read every malformed row as valid. The rebuilt document is
    emitted only when the typed field exists — ``to_json`` drops NULL
    fields, which would render '{}' where the oracle's string concat
    yields NULL. Input contract (see JSON_K_INT_SQL): props is NULL,
    malformed-for-both-parsers, or STRICT JSON — lax documents DuckDB's
    yyjson accepts but Spark rejects (trailing commas, NaN/Infinity
    literals) are outside it."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 4)
    parsed = ev.withColumn("p", F.from_json("props", PROPS_STRUCT))
    return parsed.select(
        "event_id",
        F.when(
            F.try_parse_json("props").isNotNull(),
            F.get_json_object("props", "$.k"),
        ).alias("k_raw"),
        F.col("p.k").alias("k_typed"),
        F.when(F.try_parse_json("props").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_valid_json"),
        F.when(F.col("p.k").isNotNull(), F.to_json("p")).alias("rebuilt_json"),
    )


@query(
    "q_fn_variant",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   CASE WHEN props IS NOT NULL AND json_valid(props)
                        THEN props END AS j
            FROM events
            WHERE event_id % 9 = 0
        )
        SELECT event_id,
               TRY_CAST(json_extract(j, '$.k') AS INTEGER)       AS k_int,
               json_extract_string(j, '$.k')                     AS k_str,
               TRY_CAST(json_extract(j, '$.missing') AS INTEGER) AS absent,
               TRY_CAST(json_extract(j, '$.k') AS INTEGER) >= 50 AS k_big
        FROM src
    """,
    description="Spark 4 VARIANT type: parse_json + typed variant_get path extraction",
    tags=("function", "variant", "json"),
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 semi-structured path: ``parse_json`` materializes the
    JSON blob ONCE into the binary VARIANT encoding, and every
    ``variant_get`` afterwards is a typed O(path) lookup into that
    encoding — versus ``get_json_object``, which re-parses the string
    per extraction. On a 100 TB events table with wide props objects
    that is the difference between one parse and k parses per row;
    VARIANT also pushes through shuffles as compact binary instead of
    raw text. An absent path, a malformed blob, or a non-castable leaf
    returns typed NULL (try_parse_json / try_variant_get — never a
    task failure), and downstream predicates consume the typed value
    directly (k_big).

    The DuckDB oracle mirrors with json_extract — semantically the
    same path algebra, which is exactly the point: VARIANT is Spark
    catching up to the native-JSON engines, and a user migrating from
    the reference's JSON accessors gets identical results.

    Scale shape: row-local, no shuffle; the modulo slice is evaluated
    in the scan stage (not parquet-pushable — only the derived
    IsNotNull reaches PushedFilters). At 100 TB you'd persist the parsed VARIANT column once
    (write-time shredding) and pay zero parse on every later read.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 0)
    # try_parse_json / try_variant_get: malformed blobs and non-castable
    # leaves become typed NULLs instead of task failures — the only
    # semantics that survives a dirty 100 TB ingest (and the hostile
    # events tier, where props includes "{bad" and {"k": "abc"}).
    v = ev.select("event_id", F.try_parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.expr("try_variant_get(v, '$.k', 'int')").alias("k_int"),
        F.expr("try_variant_get(v, '$.k', 'string')").alias("k_str"),
        F.expr("try_variant_get(v, '$.missing', 'int')").alias("absent"),
        (F.expr("try_variant_get(v, '$.k', 'int')") >= 50).alias("k_big"),
    )


@query(
    "q_fn_explode_align",
    oracle="""
        WITH e AS (
            SELECT p_partkey,
                   generate_subscripts(string_split(p_name, ' '), 1) - 1
                       AS pos,
                   unnest(string_split(p_name, ' ')) AS word
            FROM part
        )
        SELECT CAST(pos AS INT)                        AS pos,
               CAST(count(*) AS BIGINT)                AS n_rows,
               CAST(count(*) AS BIGINT)                AS n_aligned,
               CAST(count(DISTINCT word) AS BIGINT)    AS n_distinct_words,
               CAST(sum(length(word)) AS BIGINT)       AS sum_word_len
        FROM e
        GROUP BY pos
    """,
    description="Positional explode semantics pin: posexplode over arrays_zip(words, sequence) — 0-based positions, zip-field alignment proven per row (n_aligned == n_rows), per-position vocabulary stats",
    tags=("function", "array"),
)
def q_fn_explode_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explosion + parallel-array alignment (r13) — the two
    array mechanics every token-level pipeline leans on and every
    engine numbers differently: Spark's posexplode is 0-BASED while
    SQL engines' WITH ORDINALITY / generate_subscripts are 1-based
    (the oracle subtracts 1 — the off-by-one this key exists to pin),
    and arrays_zip must align parallel arrays element-by-element (here
    words zipped against sequence(0, n-1); `n_aligned` counts rows
    where the zipped index equals the exploded position, and equals
    n_rows on both engines — a structural proof, not a spot check).

    Scale shape: explode is row-local fan-out bounded by words-per-
    name (~5); the per-position rollup is one combinable aggregation
    on a tiny key. No shuffle before the agg."""
    words = F.split(F.col("p_name"), " ")
    z = F.arrays_zip(
        words.alias("w"),
        F.sequence(F.lit(0), F.size(words) - 1).alias("idx"),
    )
    e = (
        load(spark, sf_dir, "part")
        .select("p_partkey", F.posexplode(z).alias("pos", "zipped"))
        .select(
            "pos",
            F.col("zipped.w").alias("word"),
            F.col("zipped.idx").alias("idx"),
        )
    )
    return e.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("idx") == F.col("pos"), 1).otherwise(0)).alias(
            "n_aligned"
        ),
        F.countDistinct("word").alias("n_distinct_words"),
        F.sum(F.length("word")).alias("sum_word_len"),
    )


@query(
    "q_fn_from_xml",
    oracle="""
        SELECT s_suppkey AS supp_key,
               CAST(s_nationkey AS BIGINT)   AS nation_from_xml,
               round(s_acctbal, 2)           AS bal_from_xml,
               s_name                        AS name_from_xml
        FROM supplier
    """,
    description="from_xml struct parsing (Spark 4): per-row embedded XML decoded against a declared schema — identity through the XML layer vs source columns (typed long/double/string round-trip)",
    tags=("function", "xml"),
)
def q_fn_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_xml`` (r13) — the schema-full companion to q_fn_xpath's
    path extractors: where xpath pulls one value per call, from_xml
    decodes the WHOLE embedded document into a typed struct in one
    pass (the from_json of the XML world, new in Spark 4). Each row
    builds an XML envelope from its own supplier columns and decodes
    it against a DECLARED schema; the typed fields (bigint, double,
    string) must round-trip exactly, so the oracle is simply the
    source columns. acctbal is rounded at 2 dp on BOTH sides — the
    fixture values are 2-dp decimals rendered through text, and the
    pin is the decode, not double formatting.

    Scale shape: per-row JVM scalar work, scan -> project, no
    shuffle; at 100 TB this is the message-envelope decode running
    inside whole-stage codegen, never a UDF."""
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    xml = F.concat(
        F.lit("<supplier><nation>"),
        F.col("s_nationkey").cast("string"),
        F.lit("</nation><bal>"),
        F.col("s_acctbal").cast("string"),
        F.lit("</bal><name>"),
        F.col("s_name"),
        F.lit("</name></supplier>"),
    )
    d = s.withColumn("doc", xml).withColumn(
        "parsed",
        F.expr("from_xml(doc, 'nation BIGINT, bal DOUBLE, name STRING')"),
    )
    return d.select(
        F.col("s_suppkey").alias("supp_key"),
        F.col("parsed.nation").alias("nation_from_xml"),
        F.round(F.col("parsed.bal"), 2).alias("bal_from_xml"),
        F.col("parsed.name").alias("name_from_xml"),
    )


@query(
    "q_fn_variant_explode",
    oracle="""
        SELECT CAST(0 AS INTEGER)        AS pos,
               CAST(count(*) AS BIGINT)  AS n_rows,
               CAST(sum(o_orderkey) AS BIGINT) AS val_sum,
               CAST(count(*) AS BIGINT)  AS n_null_keys
        FROM orders
        UNION ALL
        SELECT 1, CAST(count(*) AS BIGINT),
               CAST(sum(o_custkey) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 2, CAST(count(*) AS BIGINT),
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM orders
    """,
    description="variant_explode TVF (Spark 4.0): LATERAL explosion of a variant ARRAY — 0-based pos, NULL key for array elements (pinned per row), typed element cast; oracle restates per-position sums relationally",
    tags=("function", "variant", "lateral"),
)
def q_fn_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``variant_explode`` — the table-valued companion of
    q_fn_variant's scalar path gets: LATERAL-explodes a VARIANT array
    into (pos, key, value) rows. Semantics pinned: pos is 0-BASED in
    array order, key is NULL for array elements (counted per exploded
    row, so a non-NULL would break the count, not just a spot check),
    and the exploded VARIANT value casts to a typed BIGINT. Each order
    encodes [orderkey, custkey, total_cents] as a JSON array; per-pos
    sums must equal the relational per-column sums the oracle states
    directly — identity through the encode -> parse -> explode -> cast
    layer.

    Scale shape: variant_explode is a Generate (same executor shape as
    explode) inside the scan stage — rows fan out 3x before one
    map-side-combined aggregate on a 3-value key; no shuffle carries
    the variant binary."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH t AS (
            SELECT to_json(array(o_orderkey, o_custkey,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)))
                   AS js
            FROM orders
        )
        SELECT v.pos,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(v.value AS BIGINT)) AS BIGINT) AS val_sum,
               CAST(sum(CASE WHEN v.key IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_null_keys
        FROM t, LATERAL variant_explode(parse_json(js)) v
        GROUP BY v.pos
        """
    )
