"""Scan / source operators (SURVEY.md §2.1).

The parquet scan is the engine's bread and butter: Catalyst pushes
sargable predicates into row-group/page filters and prunes columns at
the reader, so at 100 TB a query touching 2 of 11 columns reads ~2/11
of the bytes. ``q_scan_csv_json`` covers the reference's line-parsing
duty (sensor records arrived as delimited/JSON lines) via ``from_json``
on a real JSON column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.collections import JSON_K_INT_SQL, PROPS_STRUCT
from ..registry import query
from ..tables import load


@query(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
    description="Full-width parquet table scan",
    tags=("scan",),
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns — the no-pruning baseline the driver can
    diff bit-for-bit (l_shipdate is ms-precision, lossless in both
    engines)."""
    return load(spark, sf_dir, "lineitem")


# typed-parse schema for events.props: the single shared definition
# lives in functions/collections.py next to its DuckDB half
PROPS_SCHEMA = PROPS_STRUCT


@query(
    "q_scan_csv_json",
    oracle=f"""
        -- guard mirrors the query's declared ingest semantics
        -- ("malformed records become nulls instead of failures"):
        -- bare ->> RAISES on malformed JSON, and a wrong-typed or
        -- int32-overflowing k must null like Spark's typed parse.
        -- (JSON_K_INT_SQL is the shared single definition — see
        -- functions/collections.py.)
        SELECT event_id, event_type, prop_k
        FROM (
            SELECT event_id, event_type,
                   {JSON_K_INT_SQL} AS prop_k
            FROM events
        )
        WHERE prop_k >= 50
    """,
    description="JSON line parsing via from_json (sensor-record ingest path)",
    tags=("scan", "json"),
)
def q_scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events.props JSON payload with an explicit schema —
    the Structured-Streaming ingest idiom (schema declared, never
    inferred, so malformed records become nulls instead of failures)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json(F.col("props"), PROPS_SCHEMA))
    return (
        parsed.select(
            "event_id",
            "event_type",
            F.col("p.k").alias("prop_k"),
        )
        .filter(F.col("prop_k") >= 50)
    )


TEXT_NULL_SENTINEL = "\\N"  # classic Hive text-format null marker
TEXT_N_FIELDS = 6


def serialize_event_lines(ev: DataFrame) -> DataFrame:
    """Events -> pipe-delimited text lines (one `value` column). Every
    field passes through the ``\\N`` null sentinel so NULLs keep their
    slot — bare NULLs would be silently dropped by concat_ws, left-
    shifting every later field (round-3 ADVICE).

    Write-side guard: a free-text field that CONTAINS the delimiter or
    a line break, or IS the sentinel literal, cannot round-trip (a
    delimiter would split the field, a newline/CR would split the
    LINE — `.text()` writes it as two physical records, corrupting the
    file before any reader runs — and the sentinel would come back
    NULL), so serialization raises on such rows instead of emitting a
    lie. A deployment that needs those bytes verbatim should switch to
    an escaping SerDe; this format fails loudly rather than corrupt
    silently in either direction."""

    def sentinel(col):
        return F.coalesce(col.cast("string"), F.lit(TEXT_NULL_SENTINEL))

    def guarded_text(name: str):
        col = F.col(name)
        bad = (
            col.contains("|")
            | col.contains("\n")
            | col.contains("\r")
            | (col == TEXT_NULL_SENTINEL)
        )
        return F.when(
            bad,
            F.raise_error(
                F.concat(F.lit(f"unserializable {name} field: "), col)
            ),
        ).otherwise(sentinel(col))

    return ev.select(
        F.concat_ws(
            "|",
            sentinel(F.col("event_id")),
            sentinel(
                F.date_format(F.date_trunc("second", "ts"), "yyyy-MM-dd HH:mm:ss")
            ),
            sentinel(F.col("user_id")),
            guarded_text("event_type"),
            sentinel(F.col("value")),
            guarded_text("props"),
        ).alias("value")
    )


def parse_event_lines(lines: DataFrame) -> DataFrame:
    """Pipe-delimited text lines -> typed events columns. Re-asserts
    exactly TEXT_N_FIELDS fields per line and raises (carrying the
    offending line) on violation, so a stray delimiter fails loudly
    instead of misaligning quietly; sentinel fields come back as real
    NULLs.

    EVERY output column carries the field-count guard: a guard riding
    only one column would be column-pruned away whenever a downstream
    plan (e.g. the q_scan_text_lines aggregate, which never reads
    event_id) drops that column — leaving the malformed line to
    corrupt the surviving fields silently.

    Typed fields get the same loud-failure contract as the field count:
    a plain ``cast``/``to_timestamp`` returns NULL on garbage (non-ANSI
    semantics), which would silently drop the row from downstream sums
    and joins — indistinguishable from a legitimate sentinel NULL. A
    non-sentinel raw value that casts to NULL raises instead, carrying
    the line."""
    p = F.split(F.col("value"), "\\|", -1)

    def fld(i: int):
        return F.when(
            F.size(p) == TEXT_N_FIELDS,
            F.nullif(p.getItem(i), F.lit(TEXT_NULL_SENTINEL)),
        ).otherwise(
            F.raise_error(
                F.concat(F.lit("malformed text line: "), F.col("value"))
            )
        )

    def typed(i: int, caster):
        raw = fld(i)
        cast = caster(raw)
        return F.when(
            raw.isNotNull() & cast.isNull(),
            F.raise_error(
                F.concat(F.lit("uncastable text field: "), F.col("value"))
            ),
        ).otherwise(cast)

    return lines.select(
        typed(0, lambda c: c.cast("long")).alias("event_id"),
        typed(1, F.to_timestamp).alias("ts"),
        typed(2, lambda c: c.cast("long")).alias("user_id"),
        fld(3).alias("event_type"),
        typed(4, lambda c: c.cast("double")).alias("value"),
        fld(5).alias("props"),
    )


@query(
    "q_scan_text_lines",
    oracle="""
        SELECT event_type,
               count(*)                       AS n,
               round(sum(value), 6)           AS value_sum,
               CAST(sum(user_id) AS BIGINT)   AS user_sum,
               CAST(max(epoch_us(date_trunc('second', ts)) // 1000000 * 1000000
                    ) AS BIGINT)              AS max_sec_us
        FROM events
        GROUP BY event_type
    """,
    description="Raw delimited text-line ingest: write pipe-delimited sensor lines, split-parse back (the reference's parse map)",
    tags=("scan", "text", "ingest"),
)
def q_scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core ingest shape: sensor records as raw
    delimited TEXT lines, parsed with an explicit split + per-field
    cast (never inferSchema). Events are serialized to pipe-delimited
    lines (deterministic field formatting), written with the text
    sink, read back as one string column, and parsed into the typed
    schema — the aggregate proves the parse round-trips every field
    (doubles via Java shortest-repr round-trip; timestamps truncated
    to whole seconds, the §1.3 rule).

    Scale shape: text write/read is line-splittable, so parsing
    parallelizes per input split like any scan; the parse is pure
    row-local JVM work (split + casts), no Python.

    Format contract (round-3 ADVICE): see serialize_event_lines /
    parse_event_lines — ``\\N`` null sentinel keeps NULL slots, the
    parser raises on any line without exactly 6 fields (both paths
    unit-tested on crafted nulls/malformed lines in
    tests/test_canary.py)."""
    from ..session import scratch_dir

    out = scratch_dir("text_lines_")
    ev = load(spark, sf_dir, "events")
    serialize_event_lines(ev).write.mode("overwrite").text(out)
    parsed = parse_event_lines(spark.read.text(out))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("value_sum"),
        F.sum("user_id").alias("user_sum"),
        F.max(F.unix_micros("ts")).alias("max_sec_us"),
    )


@query(
    "q_sink_partitioned",
    oracle="""
        SELECT event_type,
               count(*)             AS n,
               round(sum(value), 6) AS value_sum
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
        GROUP BY event_type
    """,
    description="Batch partitioned parquet sink + partition-pruned read-back",
    tags=("scan", "sink", "partitioning"),
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest layout story: write events hive-partitioned by day,
    read back with a day filter, aggregate.

    The read-back plan must show PartitionFilters (directory-level
    pruning: only 3 of ~30 day directories are listed/scanned) — the
    layout that makes a 100 TB time-range query touch only its days.
    The date literals are static here, so pruning happens at planning
    time; a join against a date dimension would use DPP the same way.
    """
    from ..session import scratch_dir

    out = scratch_dir("part_sink_")
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    # Sort within partitions by the partition column before the write so
    # each task writes at most a handful of day-files (avoids the
    # task-count x partition-count small-file explosion at scale;
    # the heavier alternative is repartition(day) — a full shuffle).
    ev.sortWithinPartitions("event_date").write.mode("overwrite").partitionBy(
        "event_date"
    ).parquet(out)

    back = spark.read.parquet(out)
    return (
        back.filter(
            F.col("event_date").between("2024-01-05", "2024-01-07")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


def write_fragmented_events(spark: SparkSession, sf_dir: str, out: str, n_frags: int = 16) -> None:
    """Simulate a streaming sink's small-file problem: every micro-batch
    task writes its own file into each day partition."""
    ev = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    ev.repartition(n_frags).write.mode("overwrite").partitionBy("event_date").parquet(out)


def compact_partitions(spark: SparkSession, frag_dir: str, out: str) -> None:
    """The OPTIMIZE/compaction maintenance op: rewrite a partitioned
    dataset so each partition holds one right-sized file. Hash
    repartition on the partition column sends each day to exactly one
    task, so each day directory compacts to a single file; at real
    scale add ``maxRecordsPerFile`` so huge days split into N
    target-size files instead of one giant one."""
    back = spark.read.parquet(frag_dir)
    (
        back.repartition("event_date")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 50_000_000)
        .partitionBy("event_date")
        .parquet(out)
    )


@query(
    "q_sink_compact",
    oracle="""
        SELECT event_type,
               count(*)             AS n,
               round(sum(value), 6) AS value_sum,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
        FROM events
        GROUP BY event_type
    """,
    description="Small-file compaction (OPTIMIZE): fragmented partitioned sink rewritten to one file per partition, lossless",
    tags=("scan", "sink", "compaction"),
)
def q_sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files maintenance for streaming sinks: a micro-batched
    writer leaves task-count x day-count files (here 16 per day);
    compaction rewrites each day to a single right-sized file. Readers
    of the compacted layout pay one file open per day instead of 16 —
    at 100 TB the difference between a listing-bound and a scan-bound
    query. The round-trip aggregate proves losslessness against the
    source-of-truth oracle; tests/test_plans gates the file counts."""
    from ..session import scratch_dir

    base = scratch_dir("compact_")
    frag, packed = f"{base}/frag", f"{base}/packed"
    write_fragmented_events(spark, sf_dir, frag)
    compact_partitions(spark, frag, packed)
    back = spark.read.parquet(packed)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("value_sum"),
        F.countDistinct("event_date").alias("n_days"),
    )


@query(
    "q_join_dpp",
    oracle="""
        SELECT event_type,
               count(*)             AS n,
               round(sum(value), 6) AS value_sum
        FROM events
        WHERE dayofweek(CAST(ts AS DATE)) IN (0, 6)
        GROUP BY event_type
    """,
    description="Dynamic partition pruning: dim-side predicate prunes fact partitions at runtime (plan-gated)",
    tags=("join", "partitioning", "dpp"),
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, the star-schema scale feature: the
    fact side is date-partitioned, the date dimension carries a
    weekend flag the fact side cannot know statically, and Catalyst
    injects the dim's surviving keys as a runtime PartitionFilter
    (``dynamicpruningexpression`` + SubqueryAdaptiveBroadcast) — so a
    100 TB fact scan opens only the partitions the filtered dimension
    admits, with zero literal dates in the query. Weekend numbering:
    Spark ``dayofweek`` is 1=Sunday..7=Saturday, DuckDB's is
    0=Sunday..6=Saturday — the oracle mirrors (1,7) as (0,6).
    tests/test_plans gates the dynamic filter's presence."""
    from ..session import scratch_dir

    out = scratch_dir("dpp_sink_")
    ev = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    ev.sortWithinPartitions("event_date").write.mode("overwrite").partitionBy(
        "event_date"
    ).parquet(out)
    fact = spark.read.parquet(out)
    date_dim = (
        ev.select("event_date")
        .distinct()
        .withColumn("is_peak", F.dayofweek("event_date").isin(1, 7))
    )
    return (
        fact.join(date_dim.filter(F.col("is_peak")), "event_date")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


@query(
    "q_scan_orc",
    oracle="""
        SELECT l_returnflag,
               count(*)                                       AS n,
               round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    description="ORC format round-trip: columnar write + read-back aggregation",
    tags=("scan", "sink", "orc"),
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar format next to parquet: ORC write + scan, same
    pushdown/pruning machinery (Spark ships the ORC reader built in).
    The aggregate equals the source-table aggregate iff the round-trip
    is lossless."""
    from ..session import scratch_dir

    out = scratch_dir("orc_sink_")
    (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .write.mode("overwrite")
        .orc(out)
    )
    return (
        spark.read.orc(out)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_scan_csv_file",
    oracle="""
        SELECT event_type,
               count(*)         AS n,
               min(event_id)    AS min_id,
               max(event_id)    AS max_id
        FROM events
        GROUP BY event_type
    """,
    description="CSV file round-trip: header write + explicit-schema read-back aggregation",
    tags=("scan", "sink", "csv"),
)
def q_scan_csv_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real delimited-file ingest (the reference's sensor-record form):
    write a CSV extract, read it back with a DECLARED schema (never
    inferSchema at scale — it double-scans), aggregate. Integer columns
    round-trip exactly; float columns would need care with text
    formatting, which is exactly why parquet is the at-rest format."""
    from pyspark.sql import types as T

    from ..session import scratch_dir

    out = scratch_dir("csv_sink_")
    (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .write.mode("overwrite")
        .option("header", "true")
        .csv(out)
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .csv(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


SORTED_BLOCK_BYTES = 256 * 1024  # small row groups stand in for the
# thousands a 100 TB table has naturally


@query(
    "q_sink_sorted",
    oracle="""
        SELECT user_id,
               count(*)                                 AS n,
               round(CAST(sum(value) AS DOUBLE), 2)     AS value_sum
        FROM events
        WHERE user_id BETWEEN 3 AND 4
        GROUP BY user_id
    """,
    description="Sort-on-write data skipping: ts/user-sorted parquet + selective read-back (row-group pruning measured in tests)",
    tags=("scan", "sink", "layout"),
)
def q_sink_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout IS an index at parquet scale: sorting on the filter
    column before writing makes every row group's min/max stats tight,
    so a selective predicate skips whole row groups instead of scanning
    and discarding. test_plans measures it: the sorted scan outputs
    ~the matching rows; an unsorted copy outputs the whole table.

    At 100 TB this is the difference between a point query touching a
    few hundred MB and touching everything — same files, same query,
    only the write-time ORDER BY differs (Z-order generalizes this to
    multiple columns). The small block size stands in for the thousands
    of row groups a real table has."""
    from ..session import scratch_dir

    out = scratch_dir("sorted_sink_")
    (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy("user_id", "event_id")
        .coalesce(4)
        .write.mode("overwrite")
        .option("parquet.block.size", SORTED_BLOCK_BYTES)
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id").between(3, 4))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


@query(
    "q_scan_json_corrupt",
    oracle="""
        SELECT source                 AS bucket,
               count(*)               AS n,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM documents
        WHERE doc_id % 7 <> 0
        GROUP BY source
        UNION ALL
        SELECT '_corrupt'             AS bucket,
               count(*)               AS n,
               CAST(NULL AS BIGINT)   AS id_sum
        FROM documents
        WHERE doc_id % 7 = 0
    """,
    description="Corrupt-record JSON ingest: PERMISSIVE parse quarantines malformed lines instead of failing the job",
    tags=("scan", "json", "robustness"),
)
def q_scan_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real feeds contain garbage; a 100 TB ingest cannot die on line
    3 billion. PERMISSIVE mode parses what it can and routes broken
    lines to `_corrupt_record` (nulls elsewhere), so the pipeline
    quarantines + counts them instead of failing (FAILFAST) or
    silently dropping them (DROPMALFORMED). Corruption is injected
    deterministically (every 7th line truncated mid-token) so the
    oracle derives both buckets arithmetically without parsing JSON."""
    from pyspark.sql import types as T

    from ..session import scratch_dir

    out = scratch_dir("json_corrupt_")
    docs = load(spark, sf_dir, "documents")
    lines = docs.select(
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string"), F.lit(" OOPS")),
        )
        .otherwise(
            F.to_json(F.struct("doc_id", "source", "n_chars"))
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return parsed.groupBy(
        F.coalesce("source", F.lit("_corrupt")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("id_sum"),
    )


ZORDER_BITS = 8  # per-dimension resolution after rank normalization

# Interleave the low ZORDER_BITS bits of normalized dims ua8/vb8:
# bit i of ua8 -> z bit 2i, bit i of vb8 -> z bit 2i+1.
ZORDER_EXPR = (
    f"aggregate(sequence(0, {ZORDER_BITS - 1}), 0L, (acc, i) -> acc"
    " + shiftleft(CAST(shiftright(ua8, i) & 1 AS BIGINT), 2 * i)"
    " + shiftleft(CAST(shiftright(vb8, i) & 1 AS BIGINT), 2 * i + 1))"
)


@query(
    "q_sink_zorder",
    oracle="""
        SELECT 'by_user'                              AS probe,
               CAST(count(*) AS BIGINT)               AS n,
               round(CAST(sum(value) AS DOUBLE), 2)   AS value_sum
        FROM events WHERE user_id BETWEEN 3 AND 4
        UNION ALL
        SELECT 'by_value'                             AS probe,
               CAST(count(*) AS BIGINT)               AS n,
               round(CAST(sum(value) AS DOUBLE), 2)   AS value_sum
        FROM events WHERE value >= 150
    """,
    description="Z-order layout: normalized bit-interleaved sort key gives row-group skipping on BOTH filter dimensions",
    tags=("scan", "sink", "layout"),
)
def q_sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data skipping: a single-column sort
    (q_sink_sorted) only tightens row-group stats for ONE dimension;
    interleaving the bits of two dimensions into a Z-value and sorting
    on that makes each row group a rectangle in (user_id, value)
    space, so selective filters on EITHER column prune row groups.
    This is the lakehouse OPTIMIZE ZORDER BY primitive from plain
    expressions, and it keeps the real recipe's two steps: each
    dimension is first rank-normalized onto [0, 2^8) via its min/max
    (a 1-row lazy aggregate, crossJoin-broadcast like q_agg_histogram
    — skewed raw scales would otherwise let one dimension's high bits
    dominate the curve), then the interleave is an 8-step HOF fold of
    shift/mask ops, entirely JVM-side.

    Correctness oracle checks content preservation through the layout
    round-trip (both probes); the both-dimension pruning win is
    measured against a single-sorted layout in test_plans.
    """
    from ..session import scratch_dir

    out = scratch_dir("zorder_sink_")
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    bounds = ev.agg(
        F.min("user_id").alias("u0"),
        F.max("user_id").alias("u1"),
        F.min("value").alias("v0"),
        F.max("value").alias("v1"),
    )
    lim = (1 << ZORDER_BITS) - 1
    norm = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "user_id",
        "value",
        F.least(
            F.floor(
                (F.col("user_id") - F.col("u0"))
                / (F.col("u1") - F.col("u0") + 1)
                * (1 << ZORDER_BITS)
            ).cast("int"),
            F.lit(lim),
        ).alias("ua8"),
        # try_divide + coalesce(0): an all-equal value column has a
        # zero range, which raised DIVIDE_BY_ZERO under ANSI instead of
        # degrading to a single bin (review r6; same degenerate class
        # q_agg_histogram guards with v1 > v0 — the user_id dimension
        # dodges it structurally via the +1).
        F.least(
            F.coalesce(
                F.floor(
                    F.expr(
                        "try_divide(value - v0, v1 - v0)"
                    )
                    * (1 << ZORDER_BITS)
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(lim),
        ).alias("vb8"),
    )
    (
        norm.withColumn("z", F.expr(ZORDER_EXPR))
        .orderBy("z", "event_id")
        .drop("z", "ua8", "vb8")
        .coalesce(4)
        .write.mode("overwrite")
        .option("parquet.block.size", SORTED_BLOCK_BYTES)
        .parquet(out)
    )
    back = spark.read.parquet(out)
    by_user = (
        back.filter(F.col("user_id").between(3, 4))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(F.lit("by_user").alias("probe"), "n", "value_sum")
    )
    by_value = (
        back.filter(F.col("value") >= 150)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(F.lit("by_value").alias("probe"), "n", "value_sum")
    )
    return by_user.unionAll(by_value)


@query(
    "q_scan_schema_evolution",
    oracle="""
        WITH unioned AS (
            SELECT event_id, user_id, value, NULL AS event_type
            FROM events WHERE event_id % 2 = 0
            UNION ALL
            SELECT event_id, user_id, value, event_type
            FROM events WHERE event_id % 2 = 1
        )
        SELECT coalesce(event_type, '_legacy') AS event_type,
               count(*)                        AS n,
               CAST(sum(user_id) AS BIGINT)    AS user_sum,
               round(sum(value), 2)            AS value_sum
        FROM unioned
        GROUP BY 1
    """,
    description="Schema evolution on a parquet dataset: old files lack a column, mergeSchema read nulls it, aggregate spans both vintages",
    tags=("scan", "sink", "schema-evolution"),
)
def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift is a fact of life for a 100 TB dataset written over
    years: old files lack columns added later. Write two parquet
    vintages of the events table — batch 1 WITHOUT event_type, batch 2
    with it — into one dataset directory, read back with
    ``mergeSchema`` (schema reconciliation at scan time; old files'
    missing column reads as NULL, no rewrite of petabytes of history),
    and aggregate across both vintages with legacy rows grouped under
    a '_legacy' marker.

    mergeSchema costs a footer read per file at planning time — on a
    real lake you set the authoritative schema in the catalog/metastore
    instead and get the same NULL-fill semantics without the
    planning-time footer sweep; the READ semantics verified here are
    identical either way."""
    from ..session import scratch_dir

    ev = load(spark, sf_dir, "events")
    base = scratch_dir("schema_evo_")
    old = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "value"
    )
    new = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "value", "event_type"
    )
    old.write.mode("overwrite").parquet(f"{base}/vintage=1")
    new.write.mode("overwrite").parquet(f"{base}/vintage=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/vintage=1", f"{base}/vintage=2"
    )
    return (
        back.select(
            F.coalesce("event_type", F.lit("_legacy")).alias("event_type"),
            "user_id",
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("user_sum"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


BINARY_SLICE = 11


def _binary_corpus_dir(spark: SparkSession, sf_dir: str) -> str:
    """One tiny file per sliced document at a DETERMINISTIC memoized
    path (the memo_replay_dir pattern, via the shared factory helpers):
    built once per fixture via a distributed partitionBy-text write —
    never a driver-side loop. The marker stamps the source fingerprint
    AND the slice constant, so changing BINARY_SLICE rebuilds instead
    of silently serving the old layout (make_replay_dir's n_chunks
    lesson, review s3)."""
    from ..sources.factory import (
        deterministic_memo_base,
        memo_marker_valid,
        write_memo_marker,
    )
    from ..tables import _dir_fingerprint

    out = deterministic_memo_base("bincorpus", sf_dir)
    stamp = repr((_dir_fingerprint(sf_dir), BINARY_SLICE))
    if memo_marker_valid(out, stamp):
        return out
    docs = (
        load(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % BINARY_SLICE == 0) & F.col("text").isNotNull()
        )
        .select("doc_id", "text")
    )
    docs.write.mode("overwrite").partitionBy("doc_id").text(out)
    write_memo_marker(out, stamp)
    return out


@query(
    "q_scan_binary",
    oracle=f"""
        SELECT doc_id,
               CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
               md5(text || chr(10))             AS h
        FROM documents
        WHERE doc_id % {BINARY_SLICE} = 0 AND text IS NOT NULL
    """,
    description="binaryFile source: opaque-blob ingest (the image/audio path), content round-trip checked",
    tags=("scan", "source", "binary", "multimodal"),
)
def q_scan_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal ingest front door: ``spark.read.format
    ("binaryFile")`` — how image/audio/video corpora actually enter
    Spark (one opaque blob per file + path/length metadata), feeding
    the q_llm_multimodal* decode plumbing downstream. The fixture
    corpus is one tiny file per sliced document (distributed
    partitionBy-text write, memoized per fixture), so the oracle can
    verify the CONTENT round-trip relationally: byte length and md5 of
    each blob must equal the source row's utf-8 bytes (+ the text
    sink's trailing newline), with the doc identity recovered from the
    hive path.

    Scale shape: binaryFile is a real FileFormat — distributed
    listing, per-file tasks, pathGlobFilter pushdown at the LISTING
    level (directories are pruned before any byte is read), and
    binary content never crosses a shuffle here (md5/length reduce it
    row-locally). The small-file problem this fixture embodies on
    purpose (one doc = one file) is the real corpus layout problem;
    production packs blobs into parquet binary columns exactly like
    q_llm_multimodal's table — this key is the BEFORE, that one the
    AFTER.
    """
    src = _binary_corpus_dir(spark, sf_dir)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .load(os.path.join(src, "doc_id=*"))
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_id=(-?\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("h"),
    )


@query(
    "q_sink_csv_roundtrip",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT)       AS n,
               round(sum(l_extendedprice), 2) AS sum_price,
               min(l_shipdate) IS NOT NULL AS has_dates
        FROM lineitem
        WHERE l_orderkey % 13 = 0
        GROUP BY l_returnflag
    """,
    description="CSV sink round-trip: typed write + schema-enforced read-back preserves the aggregate",
    tags=("scan", "sink", "csv"),
)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interchange sink: write a lineitem slice as CSV (header,
    pipe delimiter, explicit date format — every option a real
    export contract pins; raw NTZ timestamps deliberately do NOT ride
    along: they take the timestampNTZFormat option, not
    timestampFormat, and the mismatch silently nulls the column on
    read-back — dates have one text form) and read it back under an EXPLICIT schema
    (schema-on-read, never inferSchema: inference is a full extra pass
    at 100 TB and type-unstable between runs). The oracle checks the
    aggregate over the round-tripped data against the source — the
    contract that matters for an export: no row, value, or type drift
    through the text encoding, including doubles surviving via
    Spark's shortest-roundtrip float formatting.

    Scale shape: the write is one distributed pass (no repartition —
    export file count = upstream parallelism is the right default);
    the read-back scans with the explicit schema and pushes the
    aggregate map-side. CSV is quarantine-tier for analytics (no
    pushdown, no pruning, row-parse cost) — this key exists because
    pipelines still must EXPORT to it, not as a recommended store; the
    parquet scans next door are the real path.
    """
    from ..session import scratch_dir

    out = scratch_dir("csv_sink_")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 13 == 0)
        .select(
            "l_orderkey",
            "l_returnflag",
            "l_extendedprice",
            # export DATE, not raw timestamp: the fixture's ns-precision
            # NTZ timestamps take the timestampNTZFormat option (not
            # timestampFormat), an asymmetry that silently nulls every
            # value on read-back — a date column has ONE text form.
            F.to_date("l_shipdate").alias("l_shipdate"),
        )
    )
    (
        li.write.mode("overwrite")
        .option("header", "true")
        .option("sep", "|")
        .option("dateFormat", "yyyy-MM-dd")
        .csv(out)
    )
    back = (
        spark.read.schema(
            "l_orderkey long, l_returnflag string, "
            "l_extendedprice double, l_shipdate date"
        )
        .option("header", "true")
        .option("sep", "|")
        .option("dateFormat", "yyyy-MM-dd")
        .csv(out)
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.min("l_shipdate").isNotNull().alias("has_dates"),
    )


@query(
    "q_scan_csv_malformed",
    oracle="""
        SELECT o_orderstatus          AS bucket,
               count(*)               AS n,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM orders
        WHERE o_orderkey % 5 <> 0 AND o_orderkey % 2 = 0
        GROUP BY o_orderstatus
        UNION ALL
        SELECT '_malformed'           AS bucket,
               count(*)               AS n,
               CAST(NULL AS BIGINT)   AS key_sum
        FROM orders
        WHERE o_orderkey % 5 = 0 AND o_orderkey % 2 = 0
    """,
    description="Malformed-CSV ingest: PERMISSIVE typed parse quarantines rows whose cells break the schema, counted vs clean buckets",
    tags=("scan", "csv", "robustness"),
)
def q_scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV twin of q_scan_json_corrupt: a typed (non-inferred)
    CSV read in PERMISSIVE mode routes rows whose cells violate the
    schema (here: a deterministic slice whose numeric key cell is
    replaced by garbage text) into `_corrupt_record` instead of
    killing the job (FAILFAST) or silently vanishing (DROPMALFORMED).
    The corruption is injected on every (orderkey % 5 == 0) row of an
    even-key slice, so the oracle derives both buckets arithmetically
    from the source table without touching CSV at all.

    Note the CSV-specific trap this pins: unlike JSON, a PERMISSIVE
    CSV parse only quarantines when a CELL fails its declared TYPE —
    schema-width mismatches alone backfill nulls — so the injected
    garbage lands in the LONG column specifically."""
    from pyspark.sql import types as T

    from ..session import scratch_dir

    out = scratch_dir("csv_malformed_")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 2 == 0)
    lines = orders.select(
        F.concat_ws(
            ",",
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("garbage"))
            .otherwise(F.col("o_orderkey").cast("string")),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    return parsed.groupBy(
        F.when(F.col("_corrupt_record").isNotNull(), "_malformed")
        .otherwise(F.col("o_orderstatus"))
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("o_orderkey"))
        ).alias("key_sum"),
    )


@query(
    "q_scan_multi_source",
    oracle="""
        WITH unified AS (
            SELECT o_orderkey                         AS rec_id,
                   o_orderdate                        AS ts,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                                      AS amount_cents,
                   'orders'                           AS src
            FROM orders
            UNION ALL
            SELECT l_orderkey, l_shipdate,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                   'lineitem'
            FROM lineitem
        )
        SELECT src,
               CAST(date_part('year', ts) AS BIGINT)  AS yr,
               CAST(count(*) AS BIGINT)               AS n,
               CAST(sum(amount_cents) AS BIGINT)      AS amount_cents,
               CAST(count(DISTINCT rec_id) AS BIGINT) AS n_ids
        FROM unified
        GROUP BY 1, 2
    """,
    description="Multi-source unified ingest: heterogeneous tables mapped to a common schema with lineage column, rolled up per (source, year)",
    tags=("scan", "union", "aggregate"),
)
def q_scan_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated-ingest shape: two differently-shaped sources (order
    headers, line items) mapped into ONE unified schema (id, ts,
    amount, lineage tag) by unionByName, then audited per (source,
    year) — the pattern every lakehouse bronze layer runs, where the
    lineage column is what makes downstream debugging and per-source
    quality gates possible.

    Scale shape: UNION ALL is free (no shuffle — partitions
    concatenate); each branch's projection pushes down to its own
    scan so only 3 columns leave each file; the rollup is one
    map-side-combined groupBy. Per-source distinct-id partials are
    bounded per group. Amounts are exact integer cents."""
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("rec_id"),
        F.col("o_orderdate").alias("ts"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("amount_cents"),
        F.lit("orders").alias("src"),
    )
    items = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("rec_id"),
        F.col("l_shipdate").alias("ts"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("amount_cents"),
        F.lit("lineitem").alias("src"),
    )
    return (
        orders.unionByName(items)
        .groupBy("src", F.year("ts").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount_cents").alias("amount_cents"),
            F.count_distinct("rec_id").alias("n_ids"),
        )
    )


BACKFILL_HIST_END = "2024-01-26"  # history covers [corpus start, here)
BACKFILL_TAIL_START = "2024-01-20"  # re-delivered tail covers [here, end]


@query(
    "q_scan_backfill_union",
    oracle=f"""
        WITH unified AS (
            SELECT CAST(ts AS DATE) AS event_date,
                   event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT)
                   + CASE WHEN ts >= TIMESTAMP '{BACKFILL_TAIL_START}'
                          THEN 1 ELSE 0 END        AS value_cents,
                   CASE WHEN ts >= TIMESTAMP '{BACKFILL_TAIL_START}'
                        THEN 2 ELSE 1 END          AS priority
            FROM events
        )
        SELECT event_date,
               CAST(count(*) AS BIGINT)            AS n,
               CAST(sum(value_cents) AS BIGINT)    AS value_cents,
               CAST(sum(CASE WHEN priority = 2 THEN 1 ELSE 0 END)
                    AS BIGINT)                     AS n_from_tail
        FROM unified
        GROUP BY event_date
    """,
    description="Backfill union: date-partitioned history + re-delivered correction tail, priority dedup by event id (the lambda-architecture merge)",
    tags=("scan", "union", "dedup"),
)
def q_scan_backfill_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda-architecture merge every batch+streaming deployment
    eventually needs: a date-partitioned HISTORY table and a
    re-delivered CORRECTION TAIL overlap for several days (the tail
    carries corrected values — here a deterministic +1 cent marker);
    the serving query unions both and deduplicates per event id with
    SOURCE PRIORITY (tail beats history), so corrections win without
    rewriting history partitions. Both layouts are materialized for
    real in this key (history written partitioned by date, tail as a
    flat re-delivery) and read back — the dedup runs against actual
    files, not a simulated union.

    Scale shape: the union is partition concatenation (no shuffle);
    the priority dedup is ONE map-side-combined max_by per event id;
    date-partitioned history means the serving query's date filters
    prune files. The overlap window is the tail retention knob — the
    exact tombstone-retention tradeoff q_stream_cdc_apply documents,
    seen from the batch side."""
    from ..session import scratch_dir

    base = scratch_dir("backfill_")
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("date").alias("event_date"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "ts",
    )
    hist_end = F.lit(BACKFILL_HIST_END).cast("timestamp")
    tail_start = F.lit(BACKFILL_TAIL_START).cast("timestamp")
    ev.filter(F.col("ts") < hist_end).select(
        "event_id", "event_date", F.col("cents").alias("value_cents")
    ).write.mode("overwrite").partitionBy("event_date").parquet(f"{base}/history")
    ev.filter(F.col("ts") >= tail_start).select(
        "event_id", "event_date", (F.col("cents") + 1).alias("value_cents")
    ).write.mode("overwrite").parquet(f"{base}/tail")

    hist = spark.read.parquet(f"{base}/history").withColumn(
        "priority", F.lit(1)
    )
    tail = spark.read.parquet(f"{base}/tail").withColumn("priority", F.lit(2))
    winners = (
        hist.unionByName(tail)
        .groupBy("event_id")
        .agg(
            F.max_by("event_date", "priority").alias("event_date"),
            F.max_by("value_cents", "priority").alias("value_cents"),
            F.max("priority").alias("priority"),
        )
    )
    return winners.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_cents").alias("value_cents"),
        F.sum(F.when(F.col("priority") == 2, 1).otherwise(0)).alias(
            "n_from_tail"
        ),
    )


@query(
    "q_scan_python_ds",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT)                AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT)                         AS sum_value_micros,
               CAST(min(event_id) AS BIGINT)           AS min_event_id,
               CAST(max(event_id) AS BIGINT)           AS max_event_id
        FROM events
        GROUP BY event_type
    """,
    description="Spark 4 Python DataSource connector (spark.dataSource.register): events read through a pure-Python Arrow-batch parquet reader with row-group/slice partition planning, aggregated per event type",
    tags=("scan", "source", "python-ds"),
)
def q_scan_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python DataSource API (Spark 4, SURVEY §2.1 — VERDICT r12
    item 4): the events table mounted through a PURE-PYTHON connector
    (sources/python_ds.EventsPyDataSource) instead of the built-in
    parquet source, then one map-side-combined aggregation per event
    type. Proves the full third-party-connector path end to end:
    driver-side partition planning (one InputPartition per parquet row
    group; decode-slice round-robin when the file is one monolithic
    group), executor-side pyarrow decode yielding Arrow RECORD BATCHES
    (never per-row Python tuples), and the Arrow channel into the JVM.

    Value sums are per-row floor(value*1e6+0.5) BIGINT micros — exact
    integer accumulation on both engines (q_agg_group contract).

    Scale shape: each InputPartition decodes only its row group — the
    same split unit the native reader uses, so a 100 TB table fans out
    to row-group-sized tasks; the aggregation is one shuffle on the
    5-value event_type key. The Python decode path costs Arrow batch
    transfer, which is the price of a connector the JVM lacks — the
    point of the API."""
    from ..sources.python_ds import events_pyds

    df = events_pyds(spark, sf_dir)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.expr("cast(floor(value * 1000000 + 0.5) as bigint)")
        ).alias("sum_value_micros"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


XML_ROW_TAG = "order"


@query(
    "q_scan_xml",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)          AS revenue_cents,
               CAST(min(o_orderkey) AS BIGINT) AS min_orderkey,
               CAST(max(o_orderkey) AS BIGINT) AS max_orderkey
        FROM orders
        GROUP BY o_orderstatus
    """,
    description="Built-in XML format round-trip (Spark 4): orders written as <order> rows (one column as an XML ATTRIBUTE) and read back with a DECLARED schema — never inferSchema at scale; agg equality vs the source table",
    tags=("scan", "format", "xml"),
)
def q_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XML format surface (r13) — spark-xml graduated into Spark 4
    core, making XML the last built-in file format this repo had not
    keyed (parquet/ORC/CSV/JSON/text/binary all have keys). The
    round-trip pins the three things XML ingestion gets wrong at
    scale: the rowTag contract (one <order> element per row), the
    element-vs-ATTRIBUTE distinction (o_orderstatus rides as an
    attribute, read back via the '_' attributePrefix), and the
    declared-schema read (inferSchema over 100 TB of XML is a full
    extra pass; production reads declare, exactly like the CSV key).
    Values fold to BIGINT cents before the aggregate (q_agg_group
    contract).

    Scale shape: the write is one narrow projection; XML read
    parallelizes per file split like any text source; the final agg is
    one map-side-combined groupBy on the 3-value status key."""
    from ..session import scratch_dir

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("_status"),  # '_' -> XML attribute
        "o_totalprice",
    )
    out = scratch_dir("xml_roundtrip_") + "/orders_xml"
    (
        orders.repartition(4)
        .write.format("xml")
        .option("rowTag", XML_ROW_TAG)
        .mode("overwrite")
        .save(out)
    )
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("_status", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", XML_ROW_TAG)
        .schema(schema)
        .load(out)
    )
    return back.groupBy(F.col("_status").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
        ).alias("revenue_cents"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


@query(
    "q_sink_python_ds",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT)           AS cents,
               TRUE                     AS manifest_ok
        FROM orders
        WHERE o_orderkey % 7 = 0
        GROUP BY o_orderstatus
    """,
    description="Python DataSource WRITER (Spark 4.0): per-task JSONL parts + fsync-rename + driver manifest commit; manifest-listed read-back preserves the aggregate and the row-count total",
    tags=("scan", "sink", "python-datasource"),
)
def q_sink_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of the Spark 4 Python DataSource API (r15;
    q_scan_python_ds covers batch+stream reads): an orders slice is
    written through ``jsonl_pyds`` — each task streams its partition
    to a temp file and fsync-renames on success, then the driver's
    ``commit(messages)`` writes ``_MANIFEST.json`` naming exactly the
    committed parts (the two-phase contract; an orphaned part from a
    retried task is invisible because read-back loads ONLY
    manifest-listed files). The round-trip aggregate must equal the
    direct aggregation, and ``manifest_ok`` pins the commit-protocol
    accounting: the manifest's row-count total equals the read-back
    total (computed with an unpartitioned window over the 3-row
    aggregate, not a second scan).

    Scale shape: the write is one distributed pass (part count =
    upstream parallelism), commit is O(tasks) driver work on
    kilobyte messages — the same asymptotics as a real DSv2 commit
    coordinator; JSONL is interchange-tier like the CSV sink next
    door, not a recommended analytical store."""
    import json as _json
    import os

    from pyspark.sql import Window

    from ..session import scratch_dir
    from ..sources.python_ds import register_jsonl_sink

    register_jsonl_sink(spark)
    out = scratch_dir("pyds_sink_")
    sliced = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    sliced.write.format("jsonl_pyds").option("path", out).mode("append").save()
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = _json.load(fh)
    parts = [os.path.join(out, p) for p in sorted(manifest)]
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, cents long"
    ).json(parts)
    agg = back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents"),
    )
    total = F.sum("n").over(Window.partitionBy())
    return agg.select(
        "o_orderstatus",
        "n",
        "cents",
        (total == F.lit(int(sum(manifest.values())))).alias("manifest_ok"),
    )
