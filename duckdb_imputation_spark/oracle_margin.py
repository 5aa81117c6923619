"""Static rounding-boundary margin check for driver-row oracles.

Round 6 proved that gate-rehearsal green does NOT imply driver green
for boundary-fragile cells: `grouped_covariance_lineitem` was
rehearsal-green yet driver-red because a ROUND(,6) cell sat 4.6e-8
from its .5 rounding boundary while the cross-engine /
partial-agg-order noise of sibling cells in the same column reaches
~5e-13 absolute (measured) — and a busier box can push summation
order much further.  A rounding flake is FLAKY, not deterministic, so
no number of rehearsal replays can rule it out; only a static margin
check on the PRE-ROUND values can (VERDICT r6 #1b).

The check (pure DuckDB, no Spark needed):

1. Parse every ``ROUND(expr, d)`` occurrence out of the oracle SQL
   (balanced-paren scan, so nested calls survive) and emit a stripped
   twin where each becomes ``(expr)`` — the pre-round oracle.
2. Run both forms; pair rows on the non-float columns (group keys /
   ids — unique in every catalog row).
3. For each float column, identify its rounding tier: the FINEST
   parsed ``d`` whose half-step envelope contains every
   |pre − rounded| gap.  Columns that match no tier were never
   rounded — skipped (exact-arithmetic columns are covered by the
   ordinary hash gate).
4. Flag a cell when its pre-round distance to the nearest
   ``(k + 0.5)·10^-d`` boundary is below the cell's noise budget.
   Two noise classes, detected from the oracle SQL:

   * **second-moment statistics** (the oracle contains
     ``covar_pop`` / ``var_pop`` / ``stddev`` / ``corr`` /
     ``regr_*``): these are cross-partition reductions with
     catastrophic-cancellation co-moments, the class that actually
     flipped in round 6 — their worst-case cross-engine noise is set
     by the LARGE co-moments sharing the pass, not by the cell's own
     magnitude (the r6 cell: |v| = 5.5e-6 in a column whose variance
     cells reach 208).  Budget: **ABS_STAT = 5e-7 absolute**.  Since
     the maximum attainable boundary distance at tier 6 is exactly
     0.5e-6, the rule makes ROUND(,6) categorically too fine for this
     class — precisely the repo's documented tier discipline
     (ROUND(,4) for large-magnitude statistics, PLANS §6), now
     machine-checked.  The old r6 covariance form flags on every
     cell; the repaired ROUND(,4)+0.0 form (min distance 7.0e-7) and
     the green grouped_linreg row (min distance 1.3e-5, noise ~1e-7,
     130x margin) both pass.
   * **everything else** (pointwise arithmetic, per-entity in-order
     folds, exact-integer sums — reductions whose evaluation order is
     identical on both engines, so cross-engine agreement is
     bit-exact or a few ULPs): budget **REL_POINT = 1e-12 · |v|**
     (~4500 ULPs of the value, orders above any observed pointwise
     delta yet far below the distances real window cells exhibit).

   Cells whose pre-round value sits EXACTLY on a tick or EXACTLY on a
   .5 boundary are exempt in the pointwise class: exact binary hits
   are the signature of exact rational arithmetic (length ratios,
   integer sums), computed bit-identically by both engines — a noisy
   float is never exactly on either (measure zero).  Both engines
   round exact halves away from zero, so even on-boundary exact cells
   agree.

   CAVEAT (found live, round 8: target_encode at tier 2): the
   exempt-halves argument holds only when the DECIMAL boundary is an
   exact DOUBLE.  At fractional tiers and large magnitudes it often
   is not (4851.235 has no exact double) — then Spark HALF_UPs the
   binary expansion of the stored double while DuckDB rounds the
   ×10^d product, and the two CAN disagree on a cell that is an exact
   rational ON the decimal boundary.  Integer tiers are immune (x.5
   is an exact double for |x| < 2⁵²), so dense-continuum row-level
   outputs should round at an integer tier after scaling
   (CAST(ROUND(v·10^d) AS BIGINT)) instead of ROUND(v, d).

   Since round 9 this caveat is MACHINE-CHECKED: a pointwise cell
   sitting ON a fractional-tier boundary is only exempt when that
   boundary is an exact double (``boundary_is_exact_double``);
   otherwise it flags — the static detector for the exact class that
   flipped target_encode live in round 8.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

ABS_STAT = 5e-7
REL_POINT = 1e-12

_ROUND_RE = re.compile(r"\bROUND\s*\(", re.IGNORECASE)
_STAT_RE = re.compile(
    r"\b(covar_pop|covar_samp|var_pop|var_samp|variance|stddev(_pop|_samp)?"
    r"|corr|regr_\w+)\s*\(",
    re.IGNORECASE,
)


def _string_spans(sql: str) -> "list[tuple[int, int]]":
    """Half-open [start, end) spans of single-quoted SQL string
    literals, with the standard '' escape.  The ROUND scanner must not
    read parens, commas, or the word ROUND inside these — the fuzz
    (tests/test_oracle_margin_fuzz.py) caught the unguarded scan
    silently mis-spanning ``ROUND(CASE WHEN x = ')' ...`` (a literal
    close-paren ended the call early, yielding a wrong stripped form
    and a wrong tier)."""
    spans = []
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j + 1, n)))
            i = j + 1
        else:
            i += 1
    return spans


def strip_rounds(sql: str) -> tuple[str, list[int]]:
    """Replace every top-level-parsable ``ROUND(expr, d)`` with
    ``(expr)``; return (stripped_sql, sorted unique digit tiers).
    ``d`` must be an integer literal (every catalog oracle's form);
    a non-literal second argument leaves that call untouched.
    String-literal-aware: parens/commas/ROUND text inside single-quoted
    literals are opaque to the scan."""
    tiers: set[int] = set()
    out = sql
    # iterate until no ROUND( remains un-stripped (handles nesting:
    # inner calls are re-scanned after the outer rewrite)
    while True:
        spans = _string_spans(out)

        def _in_string(pos: int) -> int:
            """-1 if outside every literal, else the span's END."""
            for a, b in spans:
                if a <= pos < b:
                    return b
            return -1

        m, search_from = None, 0
        while True:
            m = _ROUND_RE.search(out, search_from)
            if m is None:
                break
            skip_to = _in_string(m.start())
            if skip_to < 0:
                break
            search_from = skip_to
        if not m:
            break
        start, open_idx = m.start(), m.end() - 1
        depth, i = 0, open_idx
        comma = -1
        while i < len(out):
            end = _in_string(i)
            if end >= 0:  # hop over the literal atomically
                i = end
                continue
            c = out[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                comma = i  # last top-level comma wins (expr may nest)
            i += 1
        if depth != 0:
            raise ValueError("unbalanced parens in oracle SQL")
        close = i
        if comma < 0:
            # ROUND(x) — round to integer (d = 0)
            expr = out[open_idx + 1 : close]
            tiers.add(0)
            out = out[:start] + "(" + expr + ")" + out[close + 1 :]
            continue
        expr = out[open_idx + 1 : comma]
        dstr = out[comma + 1 : close].strip()
        if not re.fullmatch(r"-?\d+", dstr):
            raise ValueError(f"non-literal ROUND digits: {dstr!r}")
        tiers.add(int(dstr))
        out = out[:start] + "(" + expr + ")" + out[close + 1 :]
    return out, sorted(tiers)


def boundary_distance(v: float, d: int) -> float:
    """Absolute distance from ``v`` to the nearest half-step rounding
    boundary of ``ROUND(., d)`` — the value whose crossing flips the
    rounded digit."""
    r = v * 10.0**d
    return (0.5 - abs(r - round(r))) * 10.0**-d


def boundary_is_exact_double(v: float, d: int) -> bool:
    """Whether the ROUND(., d) half-step boundary nearest to ``v`` is
    exactly representable as a double.  At integer tiers (d <= 0)
    every x.5 boundary is exact for |x| < 2**52; at fractional tiers
    (2h+1)/(2*10^d) usually is NOT (4851.235 has no exact double) —
    the r8 target_encode live catch: when the boundary is inexact,
    Spark HALF_UPs the decimal expansion of the stored double while
    DuckDB rounds the scaled product, and an exact-rational cell ON
    the boundary can round differently on the two engines."""
    from fractions import Fraction

    if d <= 0:
        return True
    r = v * 10.0**d
    # nearest half boundary: floor(r)+0.5 or floor(r)-0.5
    lo, hi = math.floor(r) - 0.5, math.floor(r) + 0.5
    half = hi if abs(r - hi) <= abs(r - lo) else lo
    num = int(round(half * 2))  # odd numerator 2h+1
    exact = Fraction(num, 2 * 10**d)
    try:
        return Fraction(float(exact)) == exact
    except (OverflowError, ValueError):
        return False


@dataclass
class CellFlag:
    column: str
    tier: int
    value: float
    distance: float
    budget: float


@dataclass
class RowReport:
    name: str
    checked_cols: dict[str, int] = field(default_factory=dict)
    skipped_cols: list[str] = field(default_factory=list)
    flags: list[CellFlag] = field(default_factory=list)
    note: str = ""

    @property
    def ok(self) -> bool:
        return not self.flags


def check_oracle(con, name: str, sql: str) -> RowReport:
    """Run the margin check for one oracle on an open DuckDB
    connection (tables already registered).  Returns a RowReport;
    ``report.flags`` lists every boundary-fragile cell."""
    import numpy as np
    import pandas as pd

    rep = RowReport(name=name)
    stripped, tiers = strip_rounds(sql)
    if not tiers:
        rep.note = "no ROUND in oracle"
        return rep
    rounded = con.execute(sql).df()
    pre = con.execute(stripped).df()
    if len(rounded) != len(pre):
        # ROUND participated in row selection (LIMIT over a rounded
        # ORDER BY) — cannot pair; report for a human eye
        rep.note = (
            f"row count changed when ROUND stripped "
            f"({len(rounded)} vs {len(pre)}) — pairing skipped"
        )
        return rep
    float_cols = [
        c for c in rounded.columns if pd.api.types.is_float_dtype(rounded[c])
    ]
    key_cols = [c for c in rounded.columns if c not in float_cols]
    if key_cols and not rounded.duplicated(subset=key_cols).any():
        rounded = rounded.sort_values(key_cols, ignore_index=True)
        pre = pre.sort_values(key_cols, ignore_index=True)
    else:
        # no unique non-float key: align on everything, the pre-round
        # floats coarsened to the coarsest tier so near-boundary cells
        # still pair with their rounded counterparts
        d0 = min(tiers)
        rounded = rounded.sort_values(
            list(rounded.columns), ignore_index=True
        )
        order = (
            pre.assign(**{c: pre[c].round(d0) for c in float_cols})
            .sort_values(list(pre.columns))
            .index
        )
        pre = pre.loc[order].reset_index(drop=True)
    for c in float_cols:
        pv = pre[c].to_numpy(dtype=float)
        rv = rounded[c].to_numpy(dtype=float)
        mask = ~(np.isnan(pv) | np.isnan(rv))
        if not mask.any():
            rep.skipped_cols.append(c)
            continue
        gap = abs(pv[mask] - rv[mask])
        tier = None
        for d in sorted(tiers, reverse=True):  # finest first
            if (gap <= 0.5000001 * 10.0**-d).all():
                tier = d
                break
        if tier is None:
            rep.skipped_cols.append(c)  # not a ROUND output column
            continue
        rep.checked_cols[c] = tier
        is_stat = bool(_STAT_RE.search(sql))
        step = 10.0**-tier
        for v in pv[mask]:
            v = float(v)
            dist = boundary_distance(v, tier)
            if is_stat:
                budget = ABS_STAT
                fragile = dist < budget
            else:
                budget = REL_POINT * abs(v)
                # exact-tick (dist == step/2) and exact-boundary cells
                # are exact-arithmetic — exempt.  "Exact boundary" is
                # detected within 4 ULPs of the scaled value: the
                # v*10^d scaling itself carries ±ulp error, so a
                # binary-exact value sitting ON the boundary (EWMA
                # with alpha=1/2^k, length ratios) measures ~1 ulp
                # away, not 0.  Both engines round decimal-intent
                # halves away from zero (Spark via the shortest-repr
                # BigDecimal, DuckDB via the scaled double snapping to
                # the representable .5), so these agree.
                exact_eps = 4.0 * math.ulp(abs(v) * 10.0**tier) * step
                r = v * 10.0**tier
                on_tick = abs(r - round(r)) <= 4.0 * math.ulp(abs(r))
                if (
                    not on_tick  # tick cells: rounding is identity
                    and dist <= exact_eps
                    and not boundary_is_exact_double(v, tier)
                ):
                    # the r8 target_encode class: an exact-rational
                    # cell ON a fractional-tier boundary whose decimal
                    # boundary is NOT an exact double — the engines
                    # CAN disagree; the exact-halves exemption only
                    # holds for exactly-representable boundaries.
                    # Fix: round at an integer tier after scaling,
                    # CAST(ROUND(v*10^d) AS BIGINT).
                    fragile = True
                else:
                    fragile = (
                        exact_eps < dist < budget and dist != 0.5 * step
                    )
            if fragile:
                rep.flags.append(
                    CellFlag(
                        column=c,
                        tier=tier,
                        value=v,
                        distance=dist,
                        budget=budget,
                    )
                )
    return rep


def check_window(
    oracles: dict[str, str],
    sf_dir: str,
    names: list[str] | None = None,
) -> list[RowReport]:
    """Margin-check a set of oracles against the parquet tables in
    ``sf_dir``.  Pure DuckDB — safe to run in CI without Spark."""
    import duckdb

    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    reports = []
    for name in names if names is not None else list(oracles):
        if name not in oracles:
            continue
        try:
            reports.append(check_oracle(con, name, oracles[name]))
        except Exception as ex:  # parse/execution issue — surface it
            rep = RowReport(name=name, note=f"ERROR {ex}")
            rep.flags.append(
                CellFlag(
                    column="<error>", tier=0, value=math.nan,
                    distance=math.nan, budget=math.nan,
                )
            )
            reports.append(rep)
    return reports
