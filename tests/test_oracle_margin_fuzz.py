"""Property fuzz for the margin gate's ROUND parser (oracle_margin.
strip_rounds): random SQL expression trees with nested ROUND calls AND
string literals carrying every hazard the scanner must treat as opaque
— close-parens, commas, the text "ROUND(", and '' escapes.  Two laws:

* BEHAVIOR: the stripped SQL evaluates in DuckDB to the same value as
  a stripped reference built during generation (each ROUND(e, d)
  replaced by (e) by construction) — so the scan rewrites exactly the
  ROUND calls, never literal contents;
* TIERS: the returned tier set equals the set of d's actually used.

The unguarded scanner failed the very first hazard class (a ')' inside
a CASE branch's string literal closed the call early — a silently
WRONG stripped form and tier in the tool whose whole job is catching
silent wrongness); the guard and this fuzz landed together."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_imputation_spark.oracle_margin import strip_rounds

# hazard literals the scan must not read structure from
_HAZARDS = [")", "(", ",", "ROUND(", "it''s", "a) , ROUND(b", ""]


@st.composite
def _expr(draw, depth=0):
    """(sql, stripped_reference, tiers_used) — numeric expression trees
    over literals, arithmetic, ROUND, and CASE WHEN <string cmp> arms
    whose compared literals carry hazards."""
    choices = ["num"]
    if depth < 4:
        choices += ["round", "add", "case"]
    kind = draw(st.sampled_from(choices))
    if kind == "num":
        v = draw(st.integers(-999, 999))
        frac = draw(st.integers(0, 99))
        s = f"{v}.{frac:02d}"
        return s, s, set()
    if kind == "add":
        a_sql, a_ref, a_t = draw(_expr(depth=depth + 1))
        b_sql, b_ref, b_t = draw(_expr(depth=depth + 1))
        return f"({a_sql} + {b_sql})", f"({a_ref} + {b_ref})", a_t | b_t
    if kind == "round":
        a_sql, a_ref, a_t = draw(_expr(depth=depth + 1))
        d = draw(st.integers(0, 6))
        return (
            f"ROUND({a_sql}, {d})",
            f"({a_ref})",
            a_t | {d},
        )
    # case: string comparison with hazard literals in both positions
    lit = draw(st.sampled_from(_HAZARDS))
    other = draw(st.sampled_from(_HAZARDS))
    a_sql, a_ref, a_t = draw(_expr(depth=depth + 1))
    b_sql, b_ref, b_t = draw(_expr(depth=depth + 1))
    cond = f"'{lit}' = '{other}'"
    return (
        f"(CASE WHEN {cond} THEN {a_sql} ELSE {b_sql} END)",
        f"(CASE WHEN {cond} THEN {a_ref} ELSE {b_ref} END)",
        a_t | b_t,
    )


@settings(max_examples=200, deadline=None)
@given(_expr())
def test_strip_rounds_behavioral_equivalence(tree):
    sql, ref, tiers_used = tree
    stripped, tiers = strip_rounds(f"SELECT {sql} AS v")
    assert tiers == sorted(tiers_used)
    con = duckdb.connect()
    got = con.execute(stripped).fetchone()[0]
    want = con.execute(f"SELECT {ref} AS v").fetchone()[0]
    assert got == want, (sql, stripped, ref)


def test_strip_rounds_hazard_hand_cases():
    """The four hand cases the guard was built against, pinned."""
    got = strip_rounds(
        "SELECT ROUND(CASE WHEN x = ')' THEN 1.5 ELSE 2.5 END, 2) AS a"
    )
    assert got == (
        "SELECT (CASE WHEN x = ')' THEN 1.5 ELSE 2.5 END) AS a",
        [2],
    )
    assert strip_rounds("SELECT 'ROUND(' AS lbl, ROUND(x, 3) AS b") == (
        "SELECT 'ROUND(' AS lbl, (x) AS b",
        [3],
    )
    assert strip_rounds("SELECT ROUND(x || ',', 2) AS c") == (
        "SELECT (x || ',') AS c",
        [2],
    )
    assert strip_rounds(
        "SELECT ROUND(len('it''s (nested, right)'), 0) AS d"
    ) == ("SELECT (len('it''s (nested, right)')) AS d", [0])
