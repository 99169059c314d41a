"""Physical-plan inspection: the feedback loop behind every operator
here ('.explain until it's the plan you'd want, not the first one that
passed'). tests/test_plans.py pins the properties; scripts/plan_report
regenerates PLANS.md as reviewable evidence."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

# substrings that signal scale problems when they appear unexpectedly
RED_FLAGS = {
    "CartesianProduct": "unbounded cross product (no join keys at all)",
    "InMemoryTableScan": "unexpected cache dependency",
}


def formatted_plan(df: DataFrame) -> str:
    """Full formatted physical plan (executedPlan().toString truncates
    filter lists and schemas)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def plan_report(df: DataFrame) -> dict[str, object]:
    """Summarize the scale-relevant facts of a plan."""
    plan = formatted_plan(df)
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "codegen_stages": len({
            line.split("codegen id :")[1].split("]")[0].strip()
            for line in plan.splitlines()
            if "codegen id :" in line
        }),
        "pushed_filters": "PushedFilters: [I" in plan
        or "PushedFilters: [G" in plan,
        "red_flags": [k for k in RED_FLAGS if k in plan],
    }
