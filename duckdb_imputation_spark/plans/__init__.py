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
    "strip_cached_subtrees",
    "static_plan_section",
    "plan_shape",
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


def strip_cached_subtrees(plan: str) -> str:
    """Drop the cached-plan subtree printed under every
    ``InMemoryRelation`` node (the node line itself stays).

    Spark's plan text re-prints a cached relation's ENTIRE child plan
    at every reference — a frame persisted once but probed k times
    shows its build exchanges k times in the string, so naive
    ``plan.count("Exchange ...")`` over-counts by (k−1)× the build
    cost.  The cached plan executes ONCE at materialization; live-plan
    metrics (the plan-shape ratchet, count_exchanges) should count only
    the live tree."""
    out: list[str] = []
    skip_depth: int | None = None
    for ln in plan.split("\n"):
        # tree depth = where the node text starts after the branch
        # glyphs; strictly larger for every descendant, including the
        # cached plan's ROOT line (which carries no "+-" marker)
        depth = len(ln) - len(ln.lstrip(" :+-"))
        if skip_depth is not None:
            if ln.strip() and depth <= skip_depth:
                skip_depth = None  # back at the node's level or above
            else:
                continue
        out.append(ln)
        if "InMemoryRelation" in ln:
            skip_depth = depth
    return "\n".join(out)


def static_plan_section(plan: str) -> str:
    """The DETERMINISTIC section of an executed-plan string.

    With AQE, ``executedPlan().toString()`` prints the ``== Final
    Plan ==`` (what runtime adaptation actually did) followed by the
    ``== Initial Plan ==`` (the compile-time shape).  The final
    section is RACY: AQE's shuffle→broadcast conversion is
    best-effort — it lands only if the shuffle stage has not already
    started materializing, so under a loaded box the same query text
    flips between ``Exchange hashpartitioning`` (conversion missed)
    and ``BroadcastExchange`` (conversion landed), moving text-count
    metrics by ±1 per eligible join (caught live: the
    line_dedup_documents ratchet read 11 under a full-suite run, 10 in
    isolation).  Shape metrics therefore ratchet the INITIAL plan —
    the shuffles the query DECLARES; runtime conversions are upside,
    not shape.  Plans without the marker (AQE off or no adaptive
    root) pass through whole.

    Marker selection: a CACHED relation's reprinted build plan embeds
    its own ``== Initial Plan ==`` marker (the cached frame executed
    under AQE too), so the FIRST marker in the string can belong to an
    InMemoryRelation reprint deep inside the final section — slicing
    there would start MID cached subtree (caught live: the
    strip-cached-subtrees regression test read 1 leaked build
    exchange).  The ROOT's marker is the one at minimal tree depth."""
    best_i = -1
    best_d = None
    pos = 0
    for ln in plan.split("\n"):
        if "== Initial Plan ==" in ln:
            d = len(ln) - len(ln.lstrip(" :+-"))
            if best_d is None or d < best_d:
                best_d, best_i = d, pos
        pos += len(ln) + 1
    return plan[best_i:] if best_i >= 0 else plan


def plan_shape(df: DataFrame) -> dict:
    """The plan-shape ratchet's metrics over the STATIC section of the
    LIVE plan (initial-plan section under AQE — see
    :func:`static_plan_section` — with cached subtrees stripped, see
    :func:`strip_cached_subtrees`).  Single source of truth for
    docs/gen_plan_shapes.py and tests/test_plan_shapes.py."""
    p = strip_cached_subtrees(static_plan_section(executed_plan(df)))
    return {
        "exchanges": p.count("Exchange hashpartitioning")
        + p.count("Exchange rangepartitioning"),
        "single_partition": p.count("Exchange SinglePartition"),
        "bnlj": p.count("BroadcastNestedLoopJoin"),
        "row_python": p.count("BatchEvalPython"),
    }


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the LIVE plan (each is a full
    network round of the data below it — the unit of scale cost).
    Cached subtrees are stripped first: a persisted frame's build plan
    is re-printed at every reference but executes once."""
    p = strip_cached_subtrees(executed_plan(df))
    return p.count("Exchange hashpartitioning") + p.count(
        "Exchange rangepartitioning"
    )


def count_hash_aggregates(df: DataFrame) -> int:
    return executed_plan(df).count("HashAggregate")


def _struct_fields(plan: str, start: int) -> list[str]:
    """Split the body of a ``struct<...>`` starting at ``start`` (the char
    after the opening ``<``) into top-level fields, tracking ``<>`` depth so
    nested struct/array/map columns count as ONE field.  Stops at the
    matching ``>`` or end of line (Spark truncates long schemas)."""
    fields: list[str] = []
    depth, buf = 0, []
    for ch in plan[start:]:
        if ch == "\n" or (ch == ">" and depth == 0):
            break
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        fields.append("".join(buf))
    return [f.strip() for f in fields if f.strip()]


def read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = executed_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<", plan):
        cols.extend(f.split(":")[0].strip() for f in _struct_fields(plan, m.end()))
    return cols


def pushed_filters(df: DataFrame) -> str:
    m = re.search(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
    return m.group(1) if m else ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


_TREE_PREFIX = re.compile(r"^([\s:+\-]*)(.*)$")
_CODEGEN_TAG = re.compile(r"^\*\(\d+\)\s*")
# Nodes that merely wrap their single child without changing row counts —
# skipped when identifying what an Exchange/BroadcastExchange actually moves.
_WRAPPERS = (
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "InputAdapter",
    "WholeStageCodegen",
    "ColumnarToRow",
    # row-preserving movement: a broadcast build side behind an AQE
    # BroadcastQueryStage prints as QueryStage > BroadcastExchange >
    # <real operator> — both layers must be skipped to judge the
    # operator that actually produces the broadcast rows
    "BroadcastExchange",
)


def _parse_tree(plan: str) -> list[tuple[int, str]]:
    """Parse Spark's plan ``toString`` into ``(depth, node_text)`` rows.

    Depth is the length of the ``:  +-`` indentation prefix; node text has
    the whole-stage-codegen ``*(N)`` tag stripped so shape checks see the
    operator name first."""
    nodes: list[tuple[int, str]] = []
    for line in plan.splitlines():
        m = _TREE_PREFIX.match(line)
        text = m.group(2).strip()
        if not text:
            continue
        nodes.append((len(m.group(1)), _CODEGEN_TAG.sub("", text)))
    return nodes


def _children(nodes: list[tuple[int, str]], i: int) -> list[int]:
    """Indices of node ``i``'s direct children (min-depth rows of its
    subtree — Spark indents all direct children equally)."""
    d = nodes[i][0]
    sub: list[int] = []
    j = i + 1
    while j < len(nodes) and nodes[j][0] > d:
        sub.append(j)
        j += 1
    if not sub:
        return []
    dmin = min(nodes[j][0] for j in sub)
    return [j for j in sub if nodes[j][0] == dmin]


def _first_real_child(nodes: list[tuple[int, str]], i: int) -> str:
    """Text of the first non-wrapper descendant below node ``i`` (the
    operator whose output the node actually consumes)."""
    kids = _children(nodes, i)
    while kids:
        text = nodes[kids[0]][1]
        if not text.startswith(_WRAPPERS):
            return text
        kids = _children(nodes, kids[0])
    return ""


_AGG_KEYS = re.compile(
    # SortAggregate prints `key=[...]` (singular); the hash variants
    # print `keys=[...]` — match both or sort-based scalar aggregates
    # (percentile/first force SortAggregate) read as real grouping
    r"^(?:HashAggregate|SortAggregate|ObjectHashAggregate)\(keys?=\[([^\]]*)\]"
)
# a grouping key that is a literal (or its alias/attribute): `0 AS 0#173`
# at the partial phase, `0#173` at the final — the single-group trick the
# full-table cofactor uses, so every group key collapses to ONE group
_CONST_KEY = re.compile(r"^\d+(?:\.\d+)?(?:L|#\d+L?)?$|^\d+(?:\.\d+)? AS \S+$")


def _is_scalar_agg(text: str) -> bool:
    """An aggregate that emits at most ONE row per input partition
    (partial) or ONE row total (final): either no grouping keys, or
    every grouping key a constant/constant-alias.  Non-constant-looking
    keys fail closed (treated as real grouping)."""
    m = _AGG_KEYS.match(text)
    if not m:
        return False
    keys = [k.strip() for k in m.group(1).split(",") if k.strip()]
    return all(_CONST_KEY.match(k) for k in keys)


# node kinds that emit at most max(children row counts) rows — a join
# of 1-row subtrees is still 1 row
_ONE_ROW_COMBINERS = (
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "Project",
    "Filter",
    "ColumnarToRow",
)


def _is_scalar_subtree(nodes: list[tuple[int, str]], i: int) -> bool:
    """Whether node ``i``'s subtree provably emits at most ONE row:
    a scalar aggregate, or a wrapper/join/projection combining only
    scalar subtrees (the dense⊕sparse cofactor combine is a broadcast
    join of two 1-row aggregates — still 1 row).  Fails closed."""
    text = nodes[i][1]
    if text.startswith(_WRAPPERS):
        kids = _children(nodes, i)
        return bool(kids) and _is_scalar_subtree(nodes, kids[0])
    if _is_scalar_agg(text):
        return True
    if text.startswith(_ONE_ROW_COMBINERS):
        kids = _children(nodes, i)
        return bool(kids) and all(_is_scalar_subtree(nodes, k) for k in kids)
    return False


def _paren_args(text: str, start: int) -> list[str]:
    """Split the argument list starting at ``start`` (the char after the
    opening ``(``) on top-level commas, tracking paren depth."""
    args: list[str] = []
    depth, buf = 0, []
    for ch in text[start:]:
        if ch == ")" and depth == 0:
            break
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        args.append("".join(buf).strip())
    return args


_CONST_EXPR = re.compile(r"^(?:\d+(?:\.\d+)?|pmod\(.*,\s*1\))(?:#\d+L?)?$")


def _is_constant_partition_key(
    nodes: list[tuple[int, str]], i: int, key: str
) -> bool:
    """True when exchange key ``key`` is constant-valued: a literal or a
    ``pmod(x, 1)`` (≡ 0), either inline or via an alias defined by a
    Project/Aggregate in the exchange's subtree.

    Known blind spot: when the alias is computed inside an aggregate's
    result projection, plan toString prints only the attribute name in
    ``output=[...]`` with no defining expression — those exchanges are
    not recognized (e.g. the bounded offsets branch of
    operators/prefix.py, which is fine to miss).  A window partitioned
    on pmod over raw data always gets a visible Project, so the misuse
    case this warn exists for IS caught."""
    if _CONST_EXPR.match(key):
        return True
    # resolve `<expr> AS <key>` in the subtree feeding the exchange
    pat = re.compile(
        r"(?:\b\d+(?:\.\d+)?|pmod\([^)]*,\s*1\))\s+AS\s+" + re.escape(key)
    )
    d = nodes[i][0]
    j = i + 1
    while j < len(nodes) and nodes[j][0] > d:
        if pat.search(nodes[j][1]):
            return True
        j += 1
    return False


def _ancestors(nodes: list[tuple[int, str]], i: int):
    """Yield ancestor node texts of ``i``, nearest first."""
    d = nodes[i][0]
    for j in range(i - 1, -1, -1):
        if nodes[j][0] < d:
            d = nodes[j][0]
            yield nodes[j][1]


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
    nodes = _parse_tree(plan)
    findings: list[PlanFinding] = []

    # Exchange SinglePartition funnels every row below it through ONE
    # task — UNLESS what it moves is the partial phase of a scalar
    # (no-grouping-key) aggregate: then exactly one pre-combined row per
    # upstream task crosses the wire, which is how any engine computes a
    # global COUNT/AVG and is scale-benign.
    n_single = n_scalar = 0
    for i, (_, text) in enumerate(nodes):
        if text.startswith("Exchange SinglePartition"):
            if _is_scalar_agg(_first_real_child(nodes, i)):
                n_scalar += 1
            else:
                n_single += 1
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
    if n_scalar:
        findings.append(
            PlanFinding(
                "scalar-aggregate-exchange",
                "info",
                f"{n_scalar} SinglePartition exchange(s) above a "
                "no-grouping-key partial aggregate: one combined row per "
                "task crosses it — benign at any scale.",
            )
        )

    # hashpartitioning on a constant-valued key (a literal or pmod(x,1))
    # is a SinglePartition exchange in disguise: every row hashes to ONE
    # reducer.  Legitimate on frames already bounded by construction
    # (top-k survivors, n_shards offset rows) — hence warn, not error —
    # but fatal if the input is the corpus.
    n_const = 0
    for i, (_, text) in enumerate(nodes):
        if text.startswith("Exchange hashpartitioning("):
            keys = _paren_args(text, len("Exchange hashpartitioning("))[:-1]
            if keys and all(
                _is_constant_partition_key(nodes, i, k) for k in keys
            ):
                if not _is_scalar_agg(_first_real_child(nodes, i)):
                    n_const += 1
    if n_const:
        findings.append(
            PlanFinding(
                "constant-partition-exchange",
                "warn",
                f"{n_const} hash exchange(s) on a constant-valued key "
                "(literal / pmod(x,1)): all rows land on ONE reducer. "
                "Fine only when the input is bounded by construction "
                "(top-k, n_shards offsets); use the shard-offset pattern "
                "(operators/prefix.py) for unbounded input.",
            )
        )

    # Nested-loop joins are O(|L|x|R|) — UNLESS the broadcast build side
    # is a scalar-aggregate subtree (a 1-row cross join attaching global
    # stats to every row: one extra comparison per probe row, no blow-up).
    for i, (_, text) in enumerate(nodes):
        if text.startswith("CartesianProduct"):
            findings.append(
                PlanFinding(
                    "non-equi-join",
                    "error",
                    "CartesianProduct: O(|L|x|R|) pairs. Rewrite as an "
                    "equi-join on a derived key (banding/bucketing) if at "
                    "all possible.",
                )
            )
        elif text.startswith("BroadcastNestedLoopJoin"):
            kids = _children(nodes, i)
            build = kids[0] if "BuildLeft" in text else kids[-1] if kids else None
            if build is not None and _is_scalar_subtree(nodes, build):
                findings.append(
                    PlanFinding(
                        "scalar-broadcast-join",
                        "info",
                        "BroadcastNestedLoopJoin whose build side is a "
                        "scalar aggregate (1-row broadcast) — a global-"
                        "stats attach, benign at any scale.",
                    )
                )
            else:
                findings.append(
                    PlanFinding(
                        "non-equi-join",
                        "error",
                        "BroadcastNestedLoopJoin: a full broadcast of one "
                        "side, compared against every row per task. "
                        "Rewrite as an equi-join on a derived key "
                        "(banding/bucketing) if at all possible.",
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
    # the scan reads every row group even though a predicate exists.
    # "Directly above" = an ancestor Filter with no row-count-changing
    # operator (join/agg/generate/window/exchange) in between — a Filter
    # over some OTHER table in a multi-scan plan must not trigger this.
    _BOUNDARY = (
        "Exchange",
        "BroadcastExchange",
        "HashAggregate",
        "SortAggregate",
        "ObjectHashAggregate",
        "Generate",
        "Window",
        "Expand",
    )
    flagged = False
    for i, (_, text) in enumerate(nodes):
        if flagged:
            break
        if text.startswith("FileScan") and "PushedFilters: []" in text:
            for anc in _ancestors(nodes, i):
                if anc.startswith(_BOUNDARY) or "Join" in anc.split("(")[0]:
                    break
                if anc.startswith("Filter "):
                    findings.append(
                        PlanFinding(
                            "filter-not-pushed",
                            "warn",
                            "parquet scan with empty PushedFilters below a "
                            "Filter node — predicate may be non-pushable "
                            "(UDF/complex expr over the scan column); "
                            "check row-group pruning is not lost.",
                        )
                    )
                    flagged = True
                    break

    wide_scans = [
        m
        for m in re.finditer(r"ReadSchema: struct<", plan)
        if len(_struct_fields(plan, m.end())) > 24
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
