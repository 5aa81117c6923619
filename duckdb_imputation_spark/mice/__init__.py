"""MICE imputation loops (SURVEY §2.2)."""

from .partition import column_stats, flag_and_fill, inject_nulls, null_flag
from .run import MiceResult, mice_impute

__all__ = [
    "mice_impute",
    "MiceResult",
    "column_stats",
    "flag_and_fill",
    "null_flag",
    "inject_nulls",
]
