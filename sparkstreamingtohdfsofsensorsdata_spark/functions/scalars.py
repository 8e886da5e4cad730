"""Scalar function families: string / date / math / conditional
(SURVEY.md §2.8). One composite query per family.

Everything here is a built-in ``pyspark.sql.functions`` call — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Cross-dialect traps
handled per expression:

- DuckDB ``regexp_replace`` replaces the first match unless the ``'g'``
  flag is passed; Spark always replaces all.
- DuckDB ``CAST(double AS INTEGER)`` rounds; Spark truncates -> use an
  explicit trunc/floor on both sides.
- Spark ``dayofweek`` is 1=Sunday..7; DuckDB ``dayofweek`` is
  0=Sunday..6 -> oracle adds 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_fn_string",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                                    AS name_upper,
               lower(p_brand)                                   AS brand_lower,
               trim(p_type)                                     AS type_trim,
               length(p_name)                                   AS name_len,
               substring(p_name, 1, 8)                          AS name_prefix,
               concat_ws('|', p_brand, p_type)                  AS brand_type,
               lpad(CAST(p_size AS VARCHAR), 4, '0')            AS size_padded,
               strpos(p_name, 'a')                              AS first_a,
               regexp_extract(p_name, '([a-z]+)', 1)            AS first_word,
               regexp_replace(p_name, '[aeiou]', '_', 'g')      AS devoweled,
               CASE WHEN regexp_matches(p_name, '^[a-z]{4}')
                    THEN 1 ELSE 0 END                           AS starts_4alpha
        FROM part
        WHERE p_partkey % 7 = 0
    """,
    description="String family: case/trim/substring/pad/search/regex",
    tags=("function", "string"),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_name", "a").alias("first_a"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_name").rlike("^[a-z]{4}"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("starts_4alpha"),
    )


@query(
    "q_fn_date",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                                  AS yr,
               month(o_orderdate)                                 AS mo,
               day(o_orderdate)                                   AS dom,
               quarter(o_orderdate)                               AS qtr,
               dayofweek(o_orderdate) + 1                         AS dow,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)  AS month_end,
               date_diff('day', DATE '1995-01-01',
                         CAST(o_orderdate AS DATE))               AS days_since_95,
               CAST(o_orderdate AS DATE) + 30                     AS due_date,
               CAST(o_orderdate AS DATE)                          AS order_day,
               epoch(o_orderdate)::BIGINT                         AS epoch_sec
        FROM orders
        WHERE o_orderkey % 11 = 0
    """,
    description="Date/time family: extract/trunc/diff/add/epoch",
    tags=("function", "date"),
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.to_date("o_orderdate").alias("order_day"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@query(
    "q_fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 0)                      AS price_round0,
               floor(l_extendedprice)                         AS price_floor,
               ceil(l_extendedprice)                          AS price_ceil,
               abs(l_discount - 0.05)                         AS disc_dev_raw,
               round(pow(l_quantity, 2), 6)                   AS qty_sq,
               CASE WHEN l_quantity >= 0
                    THEN round(sqrt(l_quantity), 6) END       AS qty_sqrt,
               round(exp(l_discount), 6)                      AS disc_exp,
               CASE WHEN l_extendedprice > 0
                    THEN round(ln(l_extendedprice), 6) END    AS price_ln,
               CASE WHEN l_extendedprice > 0
                    THEN round(log10(l_extendedprice), 6) END AS price_log10,
               CAST(sign(l_discount - 0.05) AS BIGINT)        AS disc_sign,
               CAST(l_orderkey % 13 AS BIGINT)                AS key_mod,
               round(greatest(l_quantity, l_discount * 100), 6) AS biggest,
               round(least(l_quantity, l_discount * 100), 6)    AS smallest
        FROM lineitem
        WHERE l_orderkey % 17 = 0
    """,
    description="Math family: rounding/powers/logs/sign/mod/greatest-least",
    tags=("function", "math"),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 17 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round0"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev_raw"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        # Out-of-domain inputs (negative quantity, non-positive price)
        # are NULL by explicit guard on BOTH sides: Spark alone would
        # return NULL/NaN while DuckDB raises an Out of Range error, so
        # the unguarded expressions only AGREED on positive-domain data.
        F.when(F.col("l_quantity") >= 0, F.round(F.sqrt("l_quantity"), 6)).alias(
            "qty_sqrt"
        ),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.when(
            F.col("l_extendedprice") > 0, F.round(F.log("l_extendedprice"), 6)
        ).alias("price_ln"),
        F.when(
            F.col("l_extendedprice") > 0, F.round(F.log10("l_extendedprice"), 6)
        ).alias("price_log10"),
        # sign(): double in Spark, integer in DuckDB -> long on both sides
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
        (F.col("l_orderkey") % 13).alias("key_mod"),
        F.round(F.greatest("l_quantity", F.col("l_discount") * 100), 6).alias("biggest"),
        F.round(F.least("l_quantity", F.col("l_discount") * 100), 6).alias("smallest"),
    )


@query(
    "q_fn_cond",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END                             AS price_tier,
               coalesce(nullif(o_orderstatus, 'O'), 'open')    AS status_label,
               nullif(o_orderpriority, '1-URGENT')             AS non_urgent_prio,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final,
               CAST(trunc(o_totalprice / 1000) AS BIGINT)      AS price_k,
               CAST(o_orderkey AS VARCHAR)                     AS key_str
        FROM orders
        WHERE o_orderkey % 13 = 0
    """,
    description="Conditional family: CASE/coalesce/nullif/if/casts",
    tags=("function", "conditional"),
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("non_urgent_prio"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias(
            "is_final"
        ),
        # DuckDB CAST(double AS INT) rounds, Spark truncates -> trunc on
        # both sides for identical semantics.
        (F.col("o_totalprice") / 1000).cast("long").alias("price_k"),
        F.col("o_orderkey").cast("string").alias("key_str"),
    )


@query(
    "q_fn_regexp",
    oracle=r"""
        SELECT c_custkey,
               -- TRY_CAST: a name without the pattern extracts '' and
               -- plain CAST('' AS BIGINT) RAISES in DuckDB where Spark's
               -- (ANSI-off) cast yields NULL — TRY_CAST is the matching
               -- null-on-failure semantics.
               TRY_CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT)
                                                                AS parsed_id,
               regexp_replace(c_name, '0+', '_', 'g')           AS squeezed,
               CASE WHEN regexp_matches(c_name, '[13579]$')
                    THEN 1 ELSE 0 END                           AS odd_tail,
               regexp_extract(c_name, '(\d{2})$', 1)            AS last_two
        FROM customer
        WHERE regexp_matches(c_name, '\d\d$') AND c_custkey % 7 = 0
    """,
    description="Regexp family: extract (group), replace (global), rlike filter/flag",
    tags=("function", "string", "regexp"),
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Java regex on the Spark side, RE2-ish on DuckDB — patterns kept
    to the common subset. Note DuckDB regexp_replace is first-match by
    default; the 'g' flag matches Spark's replace-all semantics."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_name").rlike(r"\d\d$") & (F.col("c_custkey") % 7 == 0)
    )
    return c.select(
        "c_custkey",
        # try_cast, not cast: a pattern-less name extracts '' and under
        # ANSI mode (the Spark 4 default) a plain cast of '' to BIGINT
        # THROWS — mirroring the oracle's TRY_CAST gives null-on-failure
        # on both engines for any input.
        F.regexp_extract("c_name", r"Customer#(\d+)", 1)
        .try_cast("long")
        .alias("parsed_id"),
        F.regexp_replace("c_name", "0+", "_").alias("squeezed"),
        F.when(F.col("c_name").rlike("[13579]$"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("odd_tail"),
        F.regexp_extract("c_name", r"(\d{2})$", 1).alias("last_two"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255                        AS low_byte,
               o_orderkey | 4096                       AS with_flag,
               xor(o_orderkey, 21845)                  AS xored,
               CASE WHEN o_orderkey BETWEEN 0 AND 2305843009213693951
                    THEN o_orderkey << 2 END           AS shl2,
               o_orderkey >> 3                         AS shr3,
               bit_count(o_orderkey)                   AS popcount
        FROM orders
        WHERE o_orderkey % 11 = 0
    """,
    description="Bitwise family: and/or/xor, shifts, popcount",
    tags=("function", "bitwise"),
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit manipulation on 64-bit keys — the substrate for bloom/LSH
    style hashing (the simhash family builds on exactly these). DuckDB
    spells xor as a function, Spark as `^`; everything else is the
    shared operator set. &/|/xor/>> agree on negatives in both engines
    (two's complement, arithmetic right shift), but << does not: Spark
    wraps Java-style while DuckDB raises on a negative or overflowing
    operand — so shl2 carries an explicit in-domain guard (0 <= k <
    2^61) on BOTH sides and is NULL outside it."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.when(k.between(0, (1 << 61) - 1), F.shiftleft(k, 2)).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "q_fn_struct",
    oracle="""
        SELECT o_orderkey,
               struct_pack(status := o_orderstatus,
                           priority := o_orderpriority).status    AS s_status,
               struct_pack(total := round(CAST(o_totalprice AS DOUBLE), 2),
                           yr := CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
                          ).total                                  AS s_total,
               struct_pack(total := round(CAST(o_totalprice AS DOUBLE), 2),
                           yr := CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
                          ).yr                                     AS s_year
        FROM orders
        WHERE o_totalprice > 450000
    """,
    description="Struct pack/unpack: nested record construction + field access",
    tags=("function", "struct"),
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested records are first-class columns: `struct(...)` packs,
    `.field` projects — and Catalyst prunes unaccessed fields out of
    the struct entirely (nestedSchemaPruning), so packing costs nothing
    you don't read. Output is flattened scalars so the oracle compares
    values, not engine-specific struct rendering."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    meta = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    fin = F.struct(
        F.round("o_totalprice", 2).alias("total"),
        F.year("o_orderdate").cast("int").alias("yr"),
    )
    return o.select(
        "o_orderkey",
        meta.getField("status").alias("s_status"),
        fin.getField("total").alias("s_total"),
        fin.getField("yr").alias("s_year"),
    )


# INT64 max, the try_add/try_multiply overflow boundary.
_I64_MAX = 9223372036854775807
# A base large enough that adding a small key overflows for some rows:
# overflow iff l_orderkey > 7.
_NEAR_MAX = _I64_MAX - 7


@query(
    "q_fn_try_arith",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN CAST({_NEAR_MAX} AS HUGEINT) + l_orderkey
                         > {_I64_MAX} THEN NULL
                    ELSE CAST(CAST({_NEAR_MAX} AS HUGEINT) + l_orderkey
                              AS BIGINT) END                    AS add_overflow,
               CASE WHEN CAST(l_orderkey AS HUGEINT)
                         * {_NEAR_MAX} > {_I64_MAX} THEN NULL
                    ELSE CAST(CAST(l_orderkey AS HUGEINT) * {_NEAR_MAX}
                              AS BIGINT) END                    AS mul_overflow,
               round(l_extendedprice
                     / nullif(CAST(l_quantity AS BIGINT) % 5, 0),
                     6)                                         AS div_maybe_zero,
               CASE WHEN CAST(l_quantity AS BIGINT) % 5 = 0 THEN NULL
                    ELSE CAST(l_orderkey
                              % nullif(CAST(l_quantity AS BIGINT) % 5, 0)
                              AS BIGINT) END                    AS mod_maybe_zero,
               TRY_CAST(l_returnflag AS BIGINT)                 AS cast_flag,
               TRY_CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT)  AS cast_key,
               TRY_CAST(l_returnflag AS TIMESTAMP) IS NOT NULL  AS ts_parsed,
               [l_orderkey, CAST(l_linenumber AS BIGINT)][4]    AS elem_oob
        FROM lineitem
        WHERE l_orderkey % 19 = 0
    """,
    description="ANSI-safe try_* family: overflow/zero-div/malformed-cast return NULL, never a runtime error",
    tags=("function", "ansi"),
)
def q_fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode safety valves: `try_add`/`try_multiply` NULL on
    int64 overflow, `try_divide`/`try_mod` NULL on zero divisors,
    `try_cast`/`try_to_timestamp` NULL on malformed input,
    `try_element_at` NULL out of bounds — where the plain operators
    under `spark.sql.ansi.enabled` raise and kill the job. A 100 TB
    pipeline cannot afford a task retry storm because one row of a
    trillion has a zero denominator; the try_* family localizes the
    poison row as a NULL that flows to a quarantine filter.

    The DuckDB oracle cannot spell try_add (no such function), so it
    mirrors the SEMANTICS: the overflow branches compute in HUGEINT
    and NULL outside the int64 range, the divisors go through
    nullif — which is precisely the rewrite the try_* functions
    compile to, so both engines state the same contract."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 19 == 0)
    near_max = F.lit(_NEAR_MAX)
    denom = F.nullif(F.col("l_quantity").cast("long") % 5, F.lit(0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_add(near_max, F.col("l_orderkey")).alias("add_overflow"),
        F.try_multiply(F.col("l_orderkey"), near_max).alias("mul_overflow"),
        F.round(
            F.try_divide(F.col("l_extendedprice"), denom), 6
        ).alias("div_maybe_zero"),
        F.try_mod(F.col("l_orderkey"), denom).alias("mod_maybe_zero"),
        F.col("l_returnflag").try_cast("long").alias("cast_flag"),
        F.col("l_orderkey").cast("string").try_cast("long").alias("cast_key"),
        F.try_to_timestamp(F.col("l_returnflag")).isNotNull().alias("ts_parsed"),
        F.try_element_at(
            F.array(F.col("l_orderkey"), F.col("l_linenumber").cast("long")),
            F.lit(4),
        ).alias("elem_oob"),
    )


@query(
    "q_fn_url_parse",
    oracle="""
        WITH u AS (
            SELECT c_custkey,
                   'https://' || lower(c_mktsegment) || '.example.com/acct/'
                   || c_custkey || '?nation=' || c_nationkey
                   || '&seg=' || lower(c_mktsegment) AS url
            FROM customer WHERE c_custkey % 11 = 0
        )
        SELECT c_custkey,
               regexp_extract(url, '^([a-z]+)://', 1)            AS proto,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)     AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?(.*)$', 1)                AS query,
               regexp_extract(url, '[?&]nation=([^&#]*)', 1)     AS nation_param
        FROM u
    """,
    description="URL decomposition: protocol/host/path/query + single-parameter extraction (parse_url family)",
    tags=("function", "string", "url"),
)
def q_fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's JVM `parse_url` (protocol, host, path, query, and keyed
    query-parameter extraction) over deterministic synthetic URLs —
    the front half of every weblog/corpus-domain pipeline
    (q_llm_url_normalize and q_llm_domain_stats consume exactly these
    pieces). The DuckDB oracle mirrors each part with anchored
    regexp_extract, exact on well-formed URLs; parse_url's extra
    value over the regex is its RFC edge handling (userinfo, ports,
    fragments), which the generator deliberately does not emit so the
    two specifications coincide. Row-local, codegen-friendly, zero
    shuffles beyond the scan."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 11 == 0)
    url = F.concat(
        F.lit("https://"),
        F.lower("c_mktsegment"),
        F.lit(".example.com/acct/"),
        F.col("c_custkey").cast("string"),
        F.lit("?nation="),
        F.col("c_nationkey").cast("string"),
        F.lit("&seg="),
        F.lower("c_mktsegment"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("nation")).alias(
            "nation_param"
        ),
    )


@query(
    "q_fn_hash",
    oracle="""
        SELECT p_partkey,
               md5(p_name)                                   AS h_md5,
               sha256(p_name)                                AS h_sha256,
               length(md5(p_name || '|' || p_brand))         AS h_comp_len,
               md5(p_name) = md5(p_name)                     AS stable,
               CAST(('0x' || substring(md5(p_name), 1, 8))::BIGINT
                    % 1024 AS BIGINT)                        AS h_bucket
        FROM part WHERE p_partkey % 13 = 0
    """,
    description="Content-hash family: md5 / sha2-256 / composite-key hash / hash bucketing (the dedup + split + shard primitives)",
    tags=("function", "hash"),
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing primitives every other pipeline stage builds on:
    md5 / sha2-256 content digests (exact dedup, split assignment),
    composite-key hashing (multi-column identity), determinism
    (hash(x) = hash(x) — trivially true, pinned so an engine swap that
    salts per-session would fail loudly), and hex-prefix bucketing
    (shard assignment). xxhash64/crc32 exist Spark-side and power the
    internal salting/banding paths, but DuckDB has no mirror, so this
    contract key pins the portable md5/sha256 subset; bucketing goes
    through the md5 prefix (the q_llm_split_assign idiom) for the
    same reason. Row-local, codegen, zero shuffles."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 13 == 0)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2(F.col("p_name"), 256).alias("h_sha256"),
        F.length(
            F.md5(F.concat_ws("|", "p_name", "p_brand"))
        ).alias("h_comp_len"),
        (F.md5("p_name") == F.md5("p_name")).alias("stable"),
        (
            F.conv(F.substring(F.md5("p_name"), 1, 8), 16, 10).cast("long")
            % 1024
        ).alias("h_bucket"),
    )


@query(
    "q_fn_try_datetime",
    oracle="""
        WITH messy AS (
            SELECT o_orderkey % 4 AS fmt_id,
                   CASE o_orderkey % 4
                        WHEN 0 THEN strftime(o_orderdate, '%Y/%m/%d %H:%M')
                        WHEN 1 THEN strftime(o_orderdate, '%d-%m-%Y')
                        WHEN 2 THEN strftime(o_orderdate, '%Y%m%d')
                        ELSE '#' || CAST(o_orderkey AS VARCHAR)
                   END AS raw
            FROM orders
        ),
        parsed AS (
            SELECT fmt_id,
                   coalesce(try_strptime(raw, '%Y/%m/%d %H:%M'),
                            try_strptime(raw, '%d-%m-%Y'),
                            try_strptime(raw, '%Y%m%d')) AS ts
            FROM messy
        )
        SELECT CAST(fmt_id AS BIGINT)                     AS fmt_id,
               CAST(count(*) AS BIGINT)                   AS n,
               CAST(count(ts) AS BIGINT)                  AS n_parsed,
               CAST(min(ts) AS TIMESTAMP)                 AS min_ts,
               CAST(max(ts) AS TIMESTAMP)                 AS max_ts
        FROM parsed
        GROUP BY fmt_id
    """,
    description="Robust multi-format timestamp ingestion: try_to_timestamp coalesce chain over messy strings, NULL (never an error) on garbage",
    tags=("fn", "date", "try"),
)
def q_fn_try_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The messy-feed timestamp parser every ingestion pipeline
    carries: raw strings arrive in several formats plus garbage, and a
    ``try_to_timestamp`` COALESCE chain parses the first format that
    fits — NULL, never a job-killing error, on the rest (the ANSI
    try_* posture of q_fn_try_arith applied to datetime ingestion).
    The messy feed is synthesized deterministically from order dates
    (three real formats + a garbage arm keyed by orderkey), so the
    parse-back is oracle-exact: both engines must agree on every
    format's round-trip AND on rejecting impossible dates (2024-02-30
    parses on neither — validated at authoring time).

    Spark format tokens (yyyy/MM/dd) and DuckDB strptime tokens
    (%Y/%m/%d) differ in SYNTAX but are pinned to identical SEMANTICS
    by the hash compare over all four arms.

    Scale shape: row-local format + parse expressions, all JVM-side,
    one map-side-combined rollup on the 4-key format id. At 100 TB
    this is scan-speed work; the production variant adds a quarantine
    column for the NULL arm exactly like q_scan_csv_malformed."""
    orders = load(spark, sf_dir, "orders")
    fmt_id = (F.col("o_orderkey") % 4).cast("long")
    raw = (
        F.when(fmt_id == 0, F.date_format("o_orderdate", "yyyy/MM/dd HH:mm"))
        .when(fmt_id == 1, F.date_format("o_orderdate", "dd-MM-yyyy"))
        .when(fmt_id == 2, F.date_format("o_orderdate", "yyyyMMdd"))
        .otherwise(F.concat(F.lit("#"), F.col("o_orderkey").cast("string")))
    )
    messy = orders.select(fmt_id.alias("fmt_id"), raw.alias("raw"))
    ts = F.coalesce(
        F.try_to_timestamp("raw", F.lit("yyyy/MM/dd HH:mm")),
        F.try_to_timestamp("raw", F.lit("dd-MM-yyyy")),
        F.try_to_timestamp("raw", F.lit("yyyyMMdd")),
    )
    return (
        messy.select("fmt_id", ts.alias("ts"))
        .groupBy("fmt_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("ts").alias("n_parsed"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
    )


@query(
    "q_fn_month_arith",
    oracle="""
        SELECT CAST(date_trunc('month',
                    CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH)
                    AS DATE)                                 AS billing_month,
               CAST(count(*) AS BIGINT)                      AS n_orders,
               CAST(sum(CASE WHEN day(CAST(o_orderdate AS DATE)
                                      + INTERVAL 1 MONTH)
                                  < day(CAST(o_orderdate AS DATE))
                             THEN 1 ELSE 0 END) AS BIGINT)   AS n_clamped,
               CAST(min(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH)
                    AS DATE)                                 AS first_billing,
               CAST(max(last_day(CAST(o_orderdate AS DATE)))
                    AS DATE)                                 AS last_eom
        FROM orders
        GROUP BY 1
    """,
    description="Calendar month arithmetic semantics pin: +1 month with end-of-month clamping (Jan 31 -> Feb 29), clamp counting, and last_day() — the billing-cycle date math both engines must agree on",
    tags=("function", "date"),
)
def q_fn_month_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month arithmetic is where date libraries silently disagree:
    adding a month to Jan 31 can clamp (Feb 28/29), overflow (Mar 2/3)
    or error depending on the engine. Spark's add_months and DuckDB's
    + INTERVAL 1 MONTH both CLAMP — this key pins that equivalence on
    real data (billing date = order date + 1 month), counts how many
    orders actually hit the clamp (day-of-month shrank), and pins
    last_day() parity alongside. q_fn_date covers extraction/trunc;
    this is the mutation semantics its docstring defers.

    Scale shape: single scan, map-side-combined monthly rollup; every
    expression is JVM-side date math. No join, no window, no
    Python."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("od")
    )
    b = o.select(
        "od",
        F.add_months("od", 1).alias("bd"),
    )
    return b.groupBy(
        F.date_trunc("month", "bd").cast("date").alias("billing_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.when(F.dayofmonth("bd") < F.dayofmonth("od"), 1).otherwise(0)
        ).alias("n_clamped"),
        F.min("bd").alias("first_billing"),
        F.max(F.last_day("od")).alias("last_eom"),
    )


@query(
    "q_fn_collation",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents
            WHERE text IS NOT NULL
        ),
        a AS (
            SELECT source, tok FROM toks
            WHERE regexp_matches(tok, '^[A-Za-z]+$')
        )
        SELECT source,
               CAST(count(*) AS BIGINT)                    AS n_tokens,
               CAST(count(DISTINCT tok) AS BIGINT)         AS n_cs,
               CAST(count(DISTINCT lower(tok)) AS BIGINT)  AS n_ci,
               CAST(count(DISTINCT tok) - count(DISTINCT lower(tok))
                    AS BIGINT)                             AS n_case_merged
        FROM a
        GROUP BY source
    """,
    description="Collation-aware distinct counting: case-sensitive vs UTF8_LCASE-collated token vocabulary per source (Spark 4 collate() surface; oracle mirrors with lower()) over an ASCII-pinned token set",
    tags=("function", "string", "collation"),
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's collation surface: COUNT(DISTINCT collate(tok,
    'UTF8_LCASE')) — grouping/equality under a case-insensitive
    collation WITHOUT rewriting the data to lower() first, which is
    how warehouses express CI dedup post-SQL:2023. The oracle mirrors
    with lower() — equivalent on the ASCII-only token set this key
    pins with a regex (non-ASCII case folding is where engine
    collations genuinely diverge, so the contract stays inside the
    common subset; the Spark side uses the collation machinery
    itself).

    Scale shape: explode to (source, token), two distinct-counts per
    group — Spark plans multi-distinct via expand (2x the token rows,
    map-side-combined); the regex filter prunes before the expand. No
    Python."""
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .filter(F.col("tok").rlike("^[A-Za-z]+$"))
    )
    return toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_cs"),
        F.expr("count(distinct collate(tok, 'UTF8_LCASE'))").alias("n_ci"),
        F.expr(
            "count(distinct tok)"
            " - count(distinct collate(tok, 'UTF8_LCASE'))"
        ).alias("n_case_merged"),
    )


@query(
    "q_fn_make_datetime",
    oracle="""
        WITH parts AS (
            SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT)  AS y,
                   CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
                   CAST(day(CAST(o_orderdate AS DATE)) AS INT)   AS d,
                   CAST(o_orderdate AS DATE)                     AS od
            FROM orders
        )
        SELECT y AS yr,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN make_date(y, m, d) = od
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
               CAST(min(make_timestamp(y, m, d, 12, 34, 56.789))
                    AS TIMESTAMP)                          AS first_ts,
               CAST(max(make_timestamp(y, m, d, 12, 34, 56.789))
                    AS TIMESTAMP)                          AS last_ts
        FROM parts
        GROUP BY y
    """,
    description="Datetime constructor parity (r13): make_date / make_timestamp rebuilt from integer field columns — the ETL path for sources that ship y/m/d as separate ints; full round-trip audit per year",
    tags=("function", "date"),
)
def q_fn_make_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datetime CONSTRUCTORS (r13) — the inverse of q_fn_date's
    extractors: sources regularly deliver year/month/day (and h/m/s)
    as separate integer columns, and the load path must rebuild real
    DATE/TIMESTAMP values without string formatting round-trips.
    make_date(y,m,d) must reproduce the exact source date for every
    row (n_roundtrip == n_orders — the audit an ingest pipeline
    asserts), and make_timestamp with a fractional-seconds literal
    pins sub-second construction parity (.789 is exactly the same
    microsecond value in both engines).

    Only VALID field combinations are constructed (fields extracted
    from real dates): Spark's non-ANSI make_date turns invalid input
    into NULL while DuckDB raises — a semantics fork this key stays
    out of by construction (documented here so nobody "extends" it
    with raw untrusted ints; use try-variants for those).

    Scale shape: pure per-row JVM scalar work + one combinable
    groupBy on year — no shuffle beyond the 7-key agg."""
    parts = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.col("o_orderdate").alias("od"),
    )
    ts = F.expr("make_timestamp(y, m, d, 12, 34, 56.789)")
    return parts.groupBy(F.col("y").alias("yr")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.when(F.expr("make_date(y, m, d)") == F.col("od"), 1).otherwise(
                0
            )
        ).alias("n_roundtrip"),
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
    )


@query(
    "q_fn_xpath",
    oracle="""
        SELECT n_nationkey AS nation_key,
               CAST(n_regionkey AS BIGINT)       AS region_from_xpath,
               CAST(length(n_name) AS BIGINT)    AS name_len_from_xpath,
               n_name                            AS name_from_xpath
        FROM nation
    """,
    description="xpath_* scalar family over per-row XML documents (xpath_long, xpath_string, xpath count form) — values re-derived through XML must equal the source columns exactly",
    tags=("function", "xml"),
)
def q_fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The xpath_* scalar functions (r13) — the per-row XML extractors
    used when XML arrives EMBEDDED in a column (message envelopes,
    config blobs) rather than as files (q_scan_xml's territory). Each
    row builds a small XML document from its own columns, then
    xpath_long / xpath_string / xpath() pull the values back out —
    identity through the XML layer, so the oracle is simply the source
    columns. Node text, attribute access (@k), and the
    sequence-of-nodes form (xpath(...)[1]) are all pinned. DuckDB has
    no xpath, so the oracle derives from the original columns — the
    same agg-equality pattern as every format round-trip key.

    Scale shape: pure per-row JVM scalar work (the XML never exceeds
    the row); no shuffle at all — the plan is scan -> project."""
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    xml = F.concat(
        F.lit('<nation region="'),
        F.col("n_regionkey").cast("string"),
        F.lit('"><name>'),
        F.col("n_name"),
        F.lit("</name></nation>"),
    )
    d = n.withColumn("doc", xml)
    return d.select(
        F.col("n_nationkey").alias("nation_key"),
        F.expr("xpath_long(doc, '/nation/@region')").alias(
            "region_from_xpath"
        ),
        F.expr("xpath_long(doc, 'string-length(/nation/name)')").alias(
            "name_len_from_xpath"
        ),
        F.expr("xpath(doc, '/nation/name/text()')[0]").alias(
            "name_from_xpath"
        ),
    )


@query(
    "q_fn_str_to_map",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT)         AS n_customers,
               CAST(sum(c_nationkey) AS BIGINT) AS nation_sum_from_map,
               CAST(sum(length(c_mktsegment)) AS BIGINT)
                                                AS seg_len_sum_from_map
        FROM customer
        GROUP BY c_mktsegment
    """,
    description="str_to_map k=v;k=v tag-string parsing: per-row typed extraction from a serialized map column — identity through the encode/parse layer vs source columns",
    tags=("function", "string", "map"),
)
def q_fn_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``str_to_map`` (r13) — the parser for the `k=v;k=v` tag strings
    that telemetry, log lines, and legacy exports ship instead of real
    maps (q_fn_map covers map construction; this is the INGEST side).
    Each row serializes two of its own columns into a tag string,
    parses it back with str_to_map, and the aggregate over the
    extracted values must equal the aggregate over the originals —
    identity through the encode/parse layer, including the cast back
    from the map's string values to BIGINT.

    Scale shape: per-row JVM string work inside codegen, then one
    map-side-combined groupBy on the 5-value segment key. The
    anti-pattern this key documents by contrast: parsing tag strings
    with a Python UDF (100x the cost) or exploding every map to rows
    before filtering (shuffles the whole payload)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    d = c.withColumn(
        "tags",
        F.concat(
            F.lit("nation="),
            F.col("c_nationkey").cast("string"),
            F.lit(";segment="),
            F.col("c_mktsegment"),
        ),
    ).withColumn("m", F.expr("str_to_map(tags, ';', '=')"))
    return d.groupBy(
        F.col("m")["segment"].alias("c_mktsegment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("m")["nation"].cast("bigint")).alias(
            "nation_sum_from_map"
        ),
        F.sum(F.length(F.col("m")["segment"])).alias(
            "seg_len_sum_from_map"
        ),
    )
