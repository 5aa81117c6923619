"""validate_constraints — declarative data-quality checks: every check
class against hand-countable fixtures, plus the plan-shape guarantees
(row checks share ONE scan; no row-Python; FK dimension broadcastable).
"""

import pytest

from duckdb_imputation_spark.operators.validate import (
    accepted_values,
    expression,
    foreign_key,
    in_range,
    not_null,
    unique,
    validate_constraints,
)


def _res(df):
    return {r["check"]: r.asDict() for r in df.collect()}


def test_row_checks_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 5.0, "A"),
            (2, None, "B"),
            (None, 60.0, "A"),
            (4, -1.0, "Z"),
            (5, 20.0, None),
        ],
        "id int, qty double, flag string",
    )
    out = _res(
        validate_constraints(
            df,
            [
                not_null("id", name="id_nn"),
                not_null("qty", name="qty_nn"),
                in_range("qty", 0, 50, name="qty_rng"),
                accepted_values("flag", ["A", "B"], name="flag_dom"),
                expression("qty >= 0 OR id IS NULL", name="expr"),
            ],
        )
    )
    assert out["id_nn"]["n_violations"] == 1
    assert out["qty_nn"]["n_violations"] == 1
    # NULL qty does not violate the range; 60 and -1 do
    assert out["qty_rng"]["n_violations"] == 2
    # NULL flag does not violate the domain; 'Z' does
    assert out["flag_dom"]["n_violations"] == 1
    # expression: NULL predicate = not violated (SQL CHECK semantics);
    # only (4, -1.0) has qty < 0 with non-NULL id
    assert out["expr"]["n_violations"] == 1
    assert all(r["n_rows"] == 5 for r in out.values())
    assert out["id_nn"]["passed"] == 0 and out["qty_rng"]["passed"] == 0


def test_unique_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (2, 1), (2, 2)], "a int, b int"
    )
    out = _res(validate_constraints(df, [unique(["a", "b"], name="u")]))
    # key (1,1) has 3 rows -> 2 violations; the others are unique
    assert out["u"]["n_violations"] == 2
    assert out["u"]["n_rows"] == 5 and out["u"]["passed"] == 0
    clean = spark.createDataFrame([(1, 1), (1, 2)], "a int, b int")
    assert _res(
        validate_constraints(clean, [unique(["a", "b"], name="u")])
    )["u"]["passed"] == 1


def test_foreign_key_orphans_and_null_exemption(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "k int"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "rk int")
    out = _res(
        validate_constraints(
            fact,
            [foreign_key(["k"], "dim", ["rk"], name="fk")],
            refs={"dim": dim},
        )
    )
    # 99 is an orphan; the NULL key is exempt (SQL FK semantics)
    assert out["fk"]["n_violations"] == 1
    assert out["fk"]["n_rows"] == 4


def test_foreign_key_missing_ref_raises(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="refs missing"):
        validate_constraints(df, [foreign_key(["k"], "dim", ["rk"])])


def test_empty_checks_raise(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="no checks"):
        validate_constraints(df, [])


def test_empty_table_all_pass(spark):
    df = spark.createDataFrame([], "a int, b int")
    out = _res(
        validate_constraints(
            df,
            [
                not_null("a", name="nn"),
                unique(["a"], name="u"),
                in_range("b", 0, 1, name="r"),
            ],
        )
    )
    assert all(
        r["n_violations"] == 0 and r["passed"] == 1 for r in out.values()
    )
    assert out["u"]["n_rows"] == 0


def test_row_checks_share_one_scan(spark):
    """Six row checks must produce a plan with exactly ONE parquet-free
    scan of the input: no per-check re-aggregation of the base frame
    (the one-pass contract).  We count LocalTableScan/Scan occurrences
    of the input in the optimized plan via the aggregate count."""
    df = spark.range(100).selectExpr(
        "id", "id % 7 AS a", "CAST(id % 3 AS DOUBLE) AS b"
    )
    out = validate_constraints(
        df,
        [
            not_null("a", name="c1"),
            not_null("b", name="c2"),
            in_range("a", 0, 5, name="c3"),
            in_range("b", 0, 1, name="c4"),
            accepted_values("a", [0, 1, 2, 3], name="c5"),
            expression("b >= 0", name="c6"),
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one Range scan feeds all six checks (the six 1-row projections
    # fan out OF the single aggregate, they do not re-scan)
    assert plan.count("Range (0, 100") == 1
    assert len(out.collect()) == 6


def test_violation_rows_kind_labels(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    dim = spark.createDataFrame([(1,)], "rk int")
    out = validate_constraints(
        df,
        [
            not_null("a"),
            unique(["a"]),
            foreign_key(["b"], "dim", ["rk"]),
        ],
        refs={"dim": dim},
    )
    kinds = {r["check"]: r["kind"] for r in out.collect()}
    assert kinds["not_null(a)"] == "not_null"
    assert kinds["unique(a)"] == "unique"
    assert kinds["foreign_key(b->dim)"] == "foreign_key"


# --------------------------------------------------------------------- #
# seeded fuzz: every check class vs a pandas reference                  #
# --------------------------------------------------------------------- #


def test_validate_random_vs_pandas_reference(spark):
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 300
        pdf = pd.DataFrame(
            {
                "a": rng.integers(0, 20, n).astype("float64"),
                "b": rng.integers(0, 5, n).astype("float64"),
                "c": rng.choice(["x", "y", "z", "w"], n),
                "k": rng.integers(0, 50, n).astype("float64"),
            }
        )
        # inject NULLs
        for col in ("a", "b", "c", "k"):
            mask = rng.random(n) < 0.1
            pdf.loc[mask, col] = None
        df = spark.createDataFrame(pdf)
        dim_vals = list(range(0, 40))  # keys 40..49 become orphans
        dim = spark.createDataFrame([(float(v),) for v in dim_vals], "rk double")

        out = {
            r["check"]: r["n_violations"]
            for r in validate_constraints(
                df,
                [
                    not_null("a", name="nn"),
                    in_range("a", 3, 15, name="rng"),
                    accepted_values("c", ["x", "y"], name="dom"),
                    expression("b < 4", name="expr"),
                    unique(["a", "b"], name="uq"),
                    foreign_key(["k"], "dim", ["rk"], name="fk"),
                ],
                refs={"dim": dim},
            ).collect()
        }
        a, b, c, k = pdf["a"], pdf["b"], pdf["c"], pdf["k"]
        assert out["nn"] == int(a.isna().sum()), seed
        assert out["rng"] == int(((a < 3) | (a > 15)).sum()), seed  # NaN-safe: NaN comparisons are False
        assert out["dom"] == int((~c.isna() & ~c.isin(["x", "y"])).sum()), seed
        # SQL CHECK semantics: NULL predicate is not a violation
        assert out["expr"] == int((b >= 4).sum()), seed
        # unique: NULL keys group together (pandas dropna=False)
        sizes = pdf.groupby(["a", "b"], dropna=False).size()
        assert out["uq"] == int((sizes - 1).sum()), seed
        assert out["fk"] == int((~k.isna() & ~k.isin(dim_vals)).sum()), seed


def test_validate_rows_long_format(spark):
    """validate_rows emits one (row, failed check) pair per violation,
    silent checks emit nothing, and clean rows never appear."""
    from duckdb_imputation_spark.operators.validate import (
        accepted_values,
        in_range,
        not_null,
        validate_rows,
    )

    df = spark.createDataFrame(
        [
            (1, 5.0, "x"),     # clean
            (2, 99.0, "x"),    # rng only
            (3, None, "q"),    # nn + dom
            (4, -1.0, "q"),    # rng + dom
        ],
        "id long, v double, c string",
    )
    checks = [
        not_null("v", name="nn"),
        in_range("v", 0, 10, name="rng"),
        accepted_values("c", ["x", "y"], name="dom"),
        not_null("id", name="silent"),  # never fires
    ]
    got = sorted(
        (r["id"], r["check"], r["kind"])
        for r in validate_rows(df, checks, id_cols=["id"]).collect()
    )
    assert got == [
        (2, "rng", "in_range"),
        (3, "dom", "accepted_values"),
        (3, "nn", "not_null"),
        (4, "dom", "accepted_values"),
        (4, "rng", "in_range"),
    ]


def test_validate_rows_counts_match_constraints(spark):
    """The long-format pair counts must agree with
    validate_constraints' per-check violation counts on the same
    data — the two operators are views of the same facts."""
    import numpy as np
    import pandas as pd

    from duckdb_imputation_spark.operators.validate import (
        expression,
        in_range,
        not_null,
        validate_constraints,
        validate_rows,
    )

    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "a": rng.integers(0, 20, n).astype("float64"),
            "b": rng.integers(0, 5, n).astype("float64"),
        }
    )
    pdf.loc[rng.random(n) < 0.1, "a"] = None
    df = spark.createDataFrame(pdf)
    checks = [
        not_null("a", name="nn"),
        in_range("a", 3, 15, name="rng"),
        expression("b < 4", name="expr"),
    ]
    want = {
        r["check"]: r["n_violations"]
        for r in validate_constraints(df, checks).collect()
    }
    rows = validate_rows(df, checks, id_cols=["id"]).collect()
    got = {}
    for r in rows:
        got[r["check"]] = got.get(r["check"], 0) + 1
    for name, cnt in want.items():
        assert got.get(name, 0) == cnt, name


def test_validate_rows_per_check_limit_deterministic(spark):
    """per_check_limit keeps the first N violations per check in
    order_cols order, deterministically."""
    from duckdb_imputation_spark.operators.validate import (
        in_range,
        validate_rows,
    )

    df = spark.createDataFrame(
        [(i, float(100 + i)) for i in range(20)], "id long, v double"
    )
    out = validate_rows(
        df,
        [in_range("v", 0, 10, name="rng")],
        id_cols=["id"],
        per_check_limit=5,
        order_cols=["id"],
    )
    got = sorted(r["id"] for r in out.collect())
    assert got == [0, 1, 2, 3, 4]
    # re-run: same sample
    assert sorted(r["id"] for r in out.collect()) == got


def test_validate_rows_rejects_set_level_checks(spark):
    from duckdb_imputation_spark.operators.validate import (
        unique,
        validate_rows,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="row-local"):
        validate_rows(df, [unique(["id"], name="uq")])


def test_validate_rows_one_scan_no_shuffle(spark):
    """The uncapped quarantine path must stay a pure scan: no exchange
    in the plan (clean rows never leave the scan stage), and the
    filter on the struct array is the only gate."""
    from duckdb_imputation_spark.operators.validate import (
        in_range,
        not_null,
        validate_rows,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = validate_rows(
        df,
        [
            in_range("l_quantity", 1, 48, name="q"),
            not_null("l_orderkey", name="nn"),
        ],
        id_cols=["l_orderkey", "l_linenumber"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan
