"""Name-compatible API surface for users of the reference extension.

The reference registers 399 fused aggregates ``sum_to_triple_<x>_<y>``
and ``sum_to_nb_agg_<x>_<y>`` for x,y in 0..19
(duckdb_imputation_extension.cpp:80-113,146-179) plus the scalar/agg
names ``to_cofactor``, ``sum_triple``, ``multiply_triple``,
``to_nb_agg``, ``sum_nb_agg``, ``multiply_nb_agg`` and the ML functions.
Here one generic Python implementation serves them all; this module
exposes the same *names* so reference call sites translate 1:1:

    from duckdb_imputation_spark.functions.registry import sum_to_triple_3_3
    sum_to_triple_3_3(df, "a", "b", "c", "d", "e", "f")   # 3 num, 3 cat

Vararg order follows the reference convention: all continuous columns
before all categorical columns (README.md:126).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from ..ml.lda import lda_train
from ..ml.linreg import linreg_train
from ..ml.nb import nb_train
from ..ml.qda import qda_train
from ..operators.cofactor import lift_columns, sum_to_triple, sum_triples
from ..operators.multiply import multiply_triples
from .triple import Triple

__all__ = [
    "to_cofactor",
    "to_nb_agg",
    "sum_triple",
    "sum_nb_agg",
    "multiply_triple",
    "multiply_nb_agg",
    "linreg_train",
    "lda_train",
    "qda_train",
    "nb_train",
    "quack",
]

MAX_ARITY = 20  # the reference pre-instantiates x,y in 0..19


def to_cofactor(*cols: str, num: int | None = None) -> Column:
    """Per-row lift (scalar varargs).  ``num`` gives the continuous-column
    count; defaults to all columns continuous (the reference infers the
    split from SQL types, which Python strings don't carry)."""
    n = len(cols) if num is None else num
    return lift_columns(list(cols[:n]), list(cols[n:]))


def to_nb_agg(*cols: str, num: int | None = None) -> Column:
    n = len(cols) if num is None else num
    return lift_columns(list(cols[:n]), list(cols[n:]), nb=True)


def sum_triple(df: DataFrame, triple_col: str, d_num: int, d_cat: int, group_by=()):
    return sum_triples(df, triple_col, d_num, d_cat, group_by=group_by)


def sum_nb_agg(df: DataFrame, triple_col: str, d_num: int, d_cat: int, group_by=()):
    return sum_triples(df, triple_col, d_num, d_cat, group_by=group_by, nb=True)


def multiply_triple(left, right, shape_left, shape_right):
    if isinstance(left, Triple):
        return left * right
    return multiply_triples(left, right, shape_left, shape_right)


def multiply_nb_agg(left, right, shape_left=None, shape_right=None):
    if isinstance(left, Triple):
        return left * right
    return multiply_triples(left, right, shape_left, shape_right, nb=True)


def quack(s: str) -> str:
    """The reference's template leftover demo function
    (duckdb_imputation_extension.cpp:39-46)."""
    return f"Quack {s} 🐥"


def _make_fused(x: int, y: int, nb: bool):
    name = f"sum_to_{'nb_agg' if nb else 'triple'}_{x}_{y}"

    def fused(df: DataFrame, *cols: str, group_by=()):
        if len(cols) != x + y:
            raise TypeError(f"{name} expects {x + y} columns, got {len(cols)}")
        return sum_to_triple(
            df, list(cols[:x]), list(cols[x:]), group_by=group_by, nb=nb
        )

    fused.__name__ = name
    fused.__doc__ = (
        f"Fused lift+sum over {x} continuous + {y} categorical columns "
        f"(reference sum_no_lift.cpp:53-216; instance #{x},{y} of the "
        f"{MAX_ARITY}x{MAX_ARITY} registration loop)."
    )
    return fused


for _x in range(MAX_ARITY):
    for _y in range(MAX_ARITY):
        for _nb in (False, True):
            _fn = _make_fused(_x, _y, _nb)
            globals()[_fn.__name__] = _fn
            __all__.append(_fn.__name__)
del _x, _y, _nb, _fn
