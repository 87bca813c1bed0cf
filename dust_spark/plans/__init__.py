"""Plan inspection & verification helpers.

The 100 TB story lives in the physical plan: filters must reach the
parquet scan (PushedFilters), projections must prune the read schema,
small dimensions must broadcast, and Python must stay out of the hot
path. These helpers turn those properties into assertions so tests and
reviews can enforce them (SURVEY.md §4.2), instead of eyeballing
``.explain()`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """The filters that reached the parquet reader."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)]


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    filters = pushed_filters(df)
    assert any(column in f for f in filters), (
        f"no pushed filter mentions '{column}'; PushedFilters={filters}"
    )


def assert_columns_pruned(df: DataFrame, must_not_read: list[str]) -> None:
    schemas = read_schemas(df)
    for col in must_not_read:
        assert all(col not in s for s in schemas), (
            f"column '{col}' is read but should be pruned; ReadSchema={schemas}"
        )


def joins_used(df: DataFrame) -> list[str]:
    """Physical join operators in the plan (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    plan = formatted_plan(df)
    return re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin|CartesianProduct)\w*)", plan)


def assert_broadcast_join(df: DataFrame) -> None:
    js = joins_used(df)
    assert any("Broadcast" in j for j in js), f"expected a broadcast join, got {js}"


def count_shuffles(df: DataFrame) -> int:
    """Exchange operators in the physical plan — the shuffle budget.
    Counts the detail entries '(n) Exchange' so the tree header doesn't
    double-count; AQE wrappers are excluded."""
    return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))


def python_in_hot_path(df: DataFrame) -> bool:
    """True if the plan contains row-at-a-time Python evaluation
    (BatchEvalPython). Arrow-batched pandas UDFs (ArrowEvalPython /
    MapInPandas) are the sanctioned slow path and not flagged."""
    return "BatchEvalPython" in formatted_plan(df)


def explain_summary(df: DataFrame) -> dict:
    """One-glance plan audit for notebooks / reviews."""
    plan = formatted_plan(df)
    return {
        "shuffles": len(re.findall(r"\(\d+\) Exchange", plan)),
        "joins": joins_used(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "codegen_stages": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "python_row_udfs": "BatchEvalPython" in plan,
        "arrow_python_stages": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
    }
