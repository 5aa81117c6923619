"""duckdb_imputation_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of eddbase/duckdb-imputation.

Core surface:
  * :mod:`.functions.triple`    — ring ("cofactor") value algebra ⊕ ⊖ ⊗
  * :mod:`.operators.cofactor`  — distributed triple aggregation
  * :mod:`.operators.multiply`  — factorized aggregation over joins
  * :mod:`.ml`                  — in-DataFrame ML trained from triples
                                  (ridge/stochastic linreg, LDA, QDA, NB)
  * :mod:`.mice`                — MICE imputation loops (baseline/low/high)
  * :mod:`.operators.dedup` / ``.simsearch`` / ``.textstats`` /
    ``.multimodal``            — large-scale training-data pipeline ops
"""

from .functions.triple import Triple, nb_schema, triple_schema
from .operators.cofactor import lift_columns, sum_to_triple, sum_triples

__all__ = [
    "Triple",
    "triple_schema",
    "nb_schema",
    "sum_to_triple",
    "sum_triples",
    "lift_columns",
]

__version__ = "0.1.0"
