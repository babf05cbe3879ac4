"""Physical-plan audits: assert the plans we designed for actually happen.

Scale guarantees live in the PLAN, not just the results — a filter that
doesn't reach the Parquet scan or a dim join that doesn't broadcast is a
100x regression waiting for 100x data. These helpers parse
``explain("formatted")`` output so tests can pin the physical strategy
(SURVEY.md §4 discipline: pushdown, pruning, broadcast, codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str):
    """The filter must reach the Parquet scan (PushedFilters), not run
    post-scan on full rows."""
    plan = formatted_plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any(fragment in l for l in pushed), (
        f"filter {fragment!r} not pushed to scan:\n" + "\n".join(pushed or [plan[:800]])
    )


def assert_read_schema_only(df: DataFrame, columns: set[str]):
    """Column pruning: the scan must read exactly `columns` (the 'pay only
    for what you touch' property — SURVEY.md §3.3)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema_part = line.split("ReadSchema:")[1]
            body = schema_part.strip().removeprefix("struct<").rstrip(">")
            # depth-aware top-level split: nested struct/array/map/decimal
            # types contain commas that a naive split would misparse
            fields, depth, start = [], 0, 0
            for i, ch in enumerate(body):
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif ch == "," and depth == 0:
                    fields.append(body[start:i])
                    start = i + 1
            if body[start:].strip():
                fields.append(body[start:])
            read = {c.split(":")[0].strip() for c in fields if c.strip()}
            assert read == columns, f"scan reads {read}, wanted {columns}"
            return
    raise AssertionError("no ReadSchema in plan")


def assert_broadcast_join(df: DataFrame):
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join:\n" + plan[:1200]
    )


def assert_no_cartesian(df: DataFrame):
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, "plan contains a cartesian product"


def count_shuffles(df: DataFrame) -> int:
    """Count SHUFFLE exchanges only — 'Exchange' as a substring also
    matches BroadcastExchange and ReusedExchange nodes, which are not
    shuffles."""
    import re

    return len(
        re.findall(r"\bExchange (hash|range|Single|RoundRobin|rebalance)", plan_of(df))
    )


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # AQE prints an unexpanded AdaptiveSparkPlan in toString(); the codegen
    # explain mode shows the compiled subtrees regardless
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    return "WholeStageCodegen subtree" in plan or "WholeStageCodegen" in plan_of(df)