"""Physical-plan inspection helpers — the ".explain and iterate" loop.

Used by perf tests to assert the plans we designed for actually hold:
filters and projections reach the parquet scan, aggregates keep their
partial (map-side) phase, small dimensions broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "executed_plan",
    "count_exchanges",
    "count_hash_aggregates",
    "read_schema",
    "pushed_filters",
    "has_broadcast_join",
    "lint_plan",
    "PlanFinding",
]


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (each is a full network
    round of the data below it — the unit of scale cost)."""
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(
        df
    ).count("Exchange rangepartitioning")


def count_hash_aggregates(df: DataFrame) -> int:
    return executed_plan(df).count("HashAggregate")


def read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        cols.extend(
            fld.split(":")[0].strip() for fld in m.group(1).split(",") if fld
        )
    return cols


def pushed_filters(df: DataFrame) -> str:
    m = re.search(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
    return m.group(1) if m else ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


class PlanFinding:
    """One scale red flag found in a physical plan."""

    __slots__ = ("code", "severity", "detail")

    def __init__(self, code: str, severity: str, detail: str):
        self.code = code
        self.severity = severity  # "error" | "warn" | "info"
        self.detail = detail

    def __repr__(self) -> str:  # readable in test failures / REPL
        return f"PlanFinding({self.code}, {self.severity}: {self.detail})"


def lint_plan(df: DataFrame) -> list[PlanFinding]:
    """Static scale review of a DataFrame's physical plan.

    Machine-checks the SCALING.md checklist: the patterns that are
    invisible at test scale factors but serialize or explode at 100 TB.
    Returns findings sorted errors-first; an empty list means none of
    the known red flags appear.  Intended use: assert in tests that
    production pipelines stay clean (`[f for f in lint_plan(df) if
    f.severity == "error"] == []`) and as a REPL aid while iterating
    on `.explain()` output.
    """
    plan = executed_plan(df)
    findings: list[PlanFinding] = []

    n_single = plan.count("Exchange SinglePartition")
    if n_single:
        findings.append(
            PlanFinding(
                "single-partition-exchange",
                "error",
                f"{n_single} Exchange SinglePartition node(s): every row "
                "funnels through ONE task (global window/sort/limit "
                "without partitioning?). Use a shard-offset two-pass "
                "pattern (operators/prefix.py) or partition the window.",
            )
        )

    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if node in plan:
            findings.append(
                PlanFinding(
                    "non-equi-join",
                    "error",
                    f"{node}: O(|L|x|R|) pairs (or a full broadcast of one "
                    "side per task). Rewrite as an equi-join on a derived "
                    "key (banding/bucketing) if at all possible.",
                )
            )

    if "BatchEvalPython" in plan:
        findings.append(
            PlanFinding(
                "row-python-udf",
                "error",
                "BatchEvalPython: row-at-a-time Python UDF in the plan — "
                "10-100x slower than builtins/pandas_udf. Use JVM Column "
                "expressions, or an Arrow-batched pandas_udf if Python is "
                "unavoidable.",
            )
        )

    # a Filter directly above a FileScan whose PushedFilters is empty:
    # the scan reads every row group even though a predicate exists
    for scan in re.finditer(r"FileScan parquet [^\n]*", plan):
        if "PushedFilters: []" in scan.group(0):
            # only complain when some filter exists in the plan at all
            if "Filter " in plan:
                findings.append(
                    PlanFinding(
                        "filter-not-pushed",
                        "warn",
                        "parquet scan with empty PushedFilters while the "
                        "plan contains Filter nodes — predicate may be "
                        "non-pushable (UDF/complex expr over the scan "
                        "column); check row-group pruning is not lost.",
                    )
                )
                break

    wide_scans = [
        m.group(1)
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)
        if m.group(1).count(",") + 1 > 24
    ]
    if wide_scans:
        findings.append(
            PlanFinding(
                "wide-scan",
                "info",
                f"{len(wide_scans)} scan(s) read >24 columns — confirm "
                "column pruning: project only what downstream needs "
                "before wide tables hit a shuffle.",
            )
        )

    if "ArrowEvalPython" in plan:
        findings.append(
            PlanFinding(
                "pandas-udf",
                "info",
                "ArrowEvalPython: vectorized Python stage present — fine "
                "where builtins cannot express the op, but it caps "
                "whole-stage codegen around it.",
            )
        )

    order = {"error": 0, "warn": 1, "info": 2}
    findings.sort(key=lambda f: order[f.severity])
    return findings
