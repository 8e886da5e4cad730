"""Physical-plan inspection (SURVEY.md §4): the "is this the plan I
would want at 100 TB" checks, as code instead of eyeballing.

Each predicate takes a DataFrame, forces analysis/planning (not
execution), and greps the executed-plan string. They power the
test_plans suite; use them interactively too:

    from sparkstreamingtohdfsofsensorsdata_spark.plans import inspect
    inspect.report(df)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame) -> str:
    """Final physical plan (after AQE re-planning if it already ran)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if some parquet scan pushes a filter mentioning every fragment."""
    for line in plan_str(df).splitlines():
        if "PushedFilters: [" in line and "PushedFilters: []" not in line:
            if all(f in line for f in fragments):
                return True
    return False


def _split_top_level(body: str) -> list[str]:
    """Split a struct body on top-level commas only: nested structs
    (nestedSchemaPruning is on session-wide) would otherwise leak their
    inner fields as phantom top-level columns."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return [p for p in parts if p]


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    out = []
    for line in plan_str(df).splitlines():
        if "ReadSchema: struct<" in line:
            inner = line.split("ReadSchema: struct<", 1)[1].rsplit(">", 1)[0]
            cols = [
                c.split(":")[0].strip()
                for c in _split_top_level(inner)
                if ":" in c
            ]
            out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    text = plan_str(df)
    return "BroadcastHashJoin" in text or "BroadcastExchange" in text

def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    """Global top-k compiled to TakeOrderedAndProject (no full sort)."""
    return "TakeOrderedAndProject" in plan_str(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (partial_ function calls)."""
    return "partial_" in plan_str(df)


def codegen_stage_count(df: DataFrame, text: str | None = None) -> int:
    """Distinct whole-stage-codegen stages. Tree strings mark fused
    operators with a ``*(n)`` prefix (and some render the long form).
    Pass ``text`` when the caller already rendered the plan — each
    render is a full JVM toString crossing the Py4J boundary."""
    import re

    if text is None:
        text = plan_str(df)
    stages = set(re.findall(r"\*\((\d+)\)", text))
    return max(len(stages), text.count("WholeStageCodegen"))


def has_partition_filters(df: DataFrame, fragment: str) -> bool:
    for line in plan_str(df).splitlines():
        if "PartitionFilters: [" in line and fragment in line:
            return True
    return False


def report(df: DataFrame) -> dict[str, object]:
    """One-call summary of the scale-relevant plan properties."""
    text = plan_str(df)
    return {
        "broadcast_join": "BroadcastHashJoin" in text,
        "sort_merge_join": "SortMergeJoin" in text,
        "take_ordered_top_k": "TakeOrderedAndProject" in text,
        "partial_aggregation": "partial_" in text,
        "whole_stage_codegen_stages": codegen_stage_count(df, text),
        "pushed_filters": [
            line.strip() for line in text.splitlines() if "PushedFilters: [" in line
        ],
        "read_schemas": [
            line.strip() for line in text.splitlines() if "ReadSchema:" in line
        ],
    }


def scan_output_rows(df: DataFrame) -> list[int]:
    """numOutputRows of each scan node AFTER execution — the measurable
    effect of row-group/page skipping (min-max stats), which the plan
    string alone cannot show. Call on a DataFrame you have collected."""
    root = df._jdf.queryExecution().executedPlan()

    def walk(node):
        out = []
        name = node.nodeName()
        if "Scan" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    out.append(int(kv._2().value()))
        for i in range(node.children().size()):
            out += walk(node.children().apply(i))
        # AQE wrappers are LeafExecNodes: AdaptiveSparkPlanExec hides
        # its tree behind executedPlan(), QueryStageExec behind plan().
        # Without descending through them, every post-shuffle plan
        # would silently report ZERO scans.
        for accessor in ("executedPlan", "plan"):
            try:
                out += walk(getattr(node, accessor)())
            except Exception:
                pass
        return out

    return walk(root)
