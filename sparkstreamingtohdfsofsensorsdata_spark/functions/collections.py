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
               round(emb[64], 6)                                     AS last_elem,
               round(list_sum(list_transform(emb, x -> x * x)), 6)   AS self_dot,
               round(list_sum(list_filter(emb, x -> x > 0)), 6)      AS pos_sum,
               len(list_filter(emb, x -> x > 0))                     AS n_pos,
               round(list_sort(emb)[1], 6)                           AS min_elem,
               round(list_sort(emb)[64], 6)                          AS max_elem,
               round(list_sum(list_transform(emb[1:8], x -> x)), 6)  AS head_sum
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
    return v.select(
        "vec_id",
        "label",
        F.size("emb").alias("dim"),
        F.round(F.element_at("emb", 1), 6).alias("first_elem"),
        F.round(F.element_at("emb", 64), 6).alias("last_elem"),
        F.round(fsum(F.transform("emb", lambda x: x * x)), 6).alias("self_dot"),
        F.round(fsum(pos), 6).alias("pos_sum"),
        F.size(pos).alias("n_pos"),
        F.round(F.element_at(F.array_sort("emb"), 1), 6).alias("min_elem"),
        F.round(F.element_at(F.array_sort("emb"), 64), 6).alias("max_elem"),
        F.round(fsum(F.slice("emb", 1, 8)), 6).alias("head_sum"),
    )


MAP_SCHEMA = T.MapType(T.StringType(), T.IntegerType())


@query(
    "q_fn_map",
    oracle="""
        SELECT event_id,
               'k'                                  AS only_key,
               CAST(props->>'k' AS INTEGER)         AS k_value,
               1                                    AS n_keys,
               CAST(props->>'k' AS INTEGER) * 2     AS k_doubled
        FROM events
        WHERE event_id % 9 = 0
    """,
    description="Map family: from_json to map, map_keys/values/element_at/map size",
    tags=("function", "map"),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props is always {"k": int} (measured), so map-function results are
    oracle-expressible as constants + json extraction."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 0)
    m = ev.withColumn("pmap", F.from_json("props", MAP_SCHEMA))
    return m.select(
        "event_id",
        F.element_at(F.map_keys("pmap"), 1).alias("only_key"),
        F.element_at("pmap", F.lit("k")).alias("k_value"),
        F.size("pmap").alias("n_keys"),
        (F.element_at(F.map_values("pmap"), 1) * 2).alias("k_doubled"),
    )


PROPS_STRUCT = T.StructType([T.StructField("k", T.IntegerType())])


@query(
    "q_fn_json",
    oracle="""
        SELECT event_id,
               props->>'k'                          AS k_raw,
               CAST(props->>'k' AS INTEGER)         AS k_typed,
               CAST(json_valid(props) AS INTEGER)   AS is_valid_json,
               '{"k":' || (props->>'k') || '}'      AS rebuilt_json
        FROM events
        WHERE event_id % 9 = 4
    """,
    description="JSON family: get_json_object/from_json/to_json round-trip",
    tags=("function", "json"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 4)
    parsed = ev.withColumn("p", F.from_json("props", PROPS_STRUCT))
    return parsed.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_raw"),
        F.col("p.k").alias("k_typed"),
        F.when(F.col("p").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_valid_json"
        ),
        F.to_json("p").alias("rebuilt_json"),
    )
