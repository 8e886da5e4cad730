"""Distributed ranking without single-partition sorts.

``row_number() OVER (ORDER BY ...)`` — and its per-segment cousin with
a handful of huge segments — moves every row through ONE sort
partition: the few-huge-partitions trap that q_agg_gini, q_agg_pareto,
q_events_rfm, and q_llm_vocab_growth's prefix sums all hit. The fix is
the same every time (a TWO-LEVEL computation), so it lives here once:

1. rows get a CHUNK key that is a monotone coarsening of the rank
   order (equal-chunk rows are contiguous in the global order);
2. a window partitioned by (partition, chunk) computes bounded-size
   local row_numbers;
3. the exclusive count-prefix over the AGGREGATED (partition, chunk)
   table — small by construction — broadcasts back as each chunk's
   rank offset.

Chunk-key recipes by metric shape:

- near-continuous metric (money cents): ``floor(value / width)`` —
  each value-range chunk holds a bounded slice of rows;
- low-cardinality metric with a unique tiebreak (counts, day ages):
  ``(value, floor(tiebreak / width))`` — ties split across tiebreak
  ranges, and the composite still sorts consistently with
  ``(value, tiebreak)``.

The caller owns the monotonicity contract; a violated contract
produces wrong ranks, so each call site documents its recipe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunked_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    chunk_cols: Sequence[Column | str],
    part_cols: Sequence[str] = (),
    rank_name: str = "rank",
    prefix_sums: dict[str, str] | None = None,
) -> DataFrame:
    """Add ``rank_name`` = row_number over ``part_cols`` ordered by
    ``order_cols``, computed as a two-level rank (see module doc).

    ``chunk_cols`` may be Column expressions; they are materialized as
    ``_chunk0.._chunkN`` and dropped from the result. ``prefix_sums``
    maps value-column -> output-column for running sums that must ride
    the same two-level structure (q_agg_pareto's cumulative cents).

    REQUIREMENT (caller-owned): the chunk tuple must be a monotone
    coarsening of ``order_cols`` within each partition.
    """
    prefix_sums = dict(prefix_sums or {})
    chunk_names = [f"_chunk{i}" for i in range(len(chunk_cols))]
    with_chunks = df
    for name, col in zip(chunk_names, chunk_cols):
        with_chunks = with_chunks.withColumn(
            name, F.col(col) if isinstance(col, str) else col
        )

    w_local = (
        Window.partitionBy(*part_cols, *chunk_names)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_chunks.withColumn("_loc_n", F.count(F.lit(1)).over(w_local))
    for src, _out in prefix_sums.items():
        local = local.withColumn(f"_loc_{src}", F.sum(src).over(w_local))

    agg_exprs = [F.count(F.lit(1)).alias("_c_n")] + [
        F.sum(src).alias(f"_c_{src}") for src in prefix_sums
    ]
    chunk_tot = with_chunks.groupBy(*part_cols, *chunk_names).agg(*agg_exprs)
    w_chunks = (
        Window.partitionBy(*part_cols)
        .orderBy(*chunk_names)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_exprs = [
        F.coalesce(F.sum("_c_n").over(w_chunks), F.lit(0)).alias("_off_n")
    ] + [
        F.coalesce(F.sum(f"_c_{src}").over(w_chunks), F.lit(0)).alias(
            f"_off_{src}"
        )
        for src in prefix_sums
    ]
    offsets = chunk_tot.select(*part_cols, *chunk_names, *off_exprs)

    out = local.join(F.broadcast(offsets), [*part_cols, *chunk_names])
    out = out.withColumn(rank_name, F.col("_off_n") + F.col("_loc_n"))
    drop = chunk_names + ["_loc_n", "_off_n"]
    for src, dest in prefix_sums.items():
        out = out.withColumn(dest, F.col(f"_off_{src}") + F.col(f"_loc_{src}"))
        drop += [f"_loc_{src}", f"_off_{src}"]
    return out.drop(*drop)
