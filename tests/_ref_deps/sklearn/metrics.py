"""`mean_squared_error` with sklearn's default multioutput='uniform_average'
(for 1-D/2-D arrays this equals the overall elementwise mean)."""

import numpy as np


def mean_squared_error(y_true, y_pred):
    y_true = np.asarray(y_true, np.float64)
    y_pred = np.asarray(y_pred, np.float64)
    if y_true.shape != y_pred.shape:
        raise ValueError("shape mismatch")
    return float(np.mean((y_true - y_pred) ** 2))
