"""Incremental cofactor maintenance (F-IVM style).

The reference maintains its training cofactor incrementally —
``full ⊖ delta ⊕ delta′`` across MICE rounds (imputation_low.cpp:110,
188-194, driver-side sub.cpp/sum.cpp).  This module names that pattern
as a standalone API: a driver-resident cofactor view over a (possibly
huge) fact table that absorbs inserts and deletes without rescanning.

Each ``insert``/``delete`` aggregates ONLY the changed rows on the
cluster (one bounded cofactor job) and folds the result into the
driver state with ⊕/⊖ — O(|delta|) work per refresh, never O(|table|).
The streaming module is the event-time flavor of the same algebra.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..functions.triple import Triple
from .cofactor import sum_to_triple

__all__ = ["IncrementalCofactor"]


class IncrementalCofactor:
    """Maintained cofactor over a logical table.

    >>> view = IncrementalCofactor(["price"], ["region"])
    >>> view.insert(day1_df)       # one cofactor job over day1 only
    >>> view.insert(day2_df)
    >>> view.delete(corrections)   # retract bad rows
    >>> model = linreg_train(view.triple, label=0)
    """

    def __init__(
        self, num_cols: Sequence[str], cat_cols: Sequence[str] = (), nb: bool = False
    ):
        self.num_cols = list(num_cols)
        self.cat_cols = list(cat_cols)
        self.nb = nb
        self.triple = Triple.zero(len(self.num_cols), len(self.cat_cols), nb=nb)

    def _aggregate(self, df: DataFrame) -> Triple:
        rows = sum_to_triple(df, self.num_cols, self.cat_cols, nb=self.nb).collect()
        if not rows:
            return Triple.zero(len(self.num_cols), len(self.cat_cols), nb=self.nb)
        return Triple.from_row(
            rows[0]["triple"],
            d_num=len(self.num_cols),
            d_cat=len(self.cat_cols),
        )

    def insert(self, delta: DataFrame) -> "IncrementalCofactor":
        self.triple = self.triple + self._aggregate(delta)
        return self

    def delete(self, delta: DataFrame) -> "IncrementalCofactor":
        self.triple = self.triple - self._aggregate(delta)
        return self
