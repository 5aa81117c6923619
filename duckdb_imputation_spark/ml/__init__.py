"""In-DataFrame ML trained from ring aggregates (SURVEY §2.1 #9-16).

Train on the driver from a collected triple (the sufficient statistics);
predict as generated Column expressions (or a pandas UDF for QDA's
quadratic form).  Two cluster boundary crossings per model: one collect
(triple out), one closure/broadcast (params in) — never per-row traffic.
"""

from .lda import LDAModel, lda_predict_expr, lda_train
from .linreg import LinRegModel, linreg_predict_expr, linreg_train
from .nb import NBModel, nb_predict_expr, nb_train
from .qda import QDAModel, qda_predict_expr, qda_train
from .sigma import build_class_sums, build_sigma, one_hot_dictionary, standardize_sigma

__all__ = [
    "LinRegModel",
    "linreg_train",
    "linreg_predict_expr",
    "LDAModel",
    "lda_train",
    "lda_predict_expr",
    "QDAModel",
    "qda_train",
    "qda_predict_expr",
    "NBModel",
    "nb_train",
    "nb_predict_expr",
    "one_hot_dictionary",
    "build_sigma",
    "build_class_sums",
    "standardize_sigma",
]
