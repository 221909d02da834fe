"""`MinMaxScaler` with sklearn's exact semantics: per-column min/max over
axis 0, scale = (hi - lo) / data_range with zero ranges replaced by 1.0,
computed in float64.  The reference uses only ``fit_transform`` with
``feature_range=(0, 255)`` (motionFeatureExtractor.py:19,53)."""

import numpy as np


class MinMaxScaler:
    def __init__(self, feature_range=(0, 1)):
        self.feature_range = feature_range

    def fit(self, X):
        X = np.asarray(X, np.float64)
        lo, hi = self.feature_range
        if lo >= hi:
            raise ValueError("feature_range lo must be < hi")
        self.data_min_ = X.min(axis=0)
        self.data_max_ = X.max(axis=0)
        rng = self.data_max_ - self.data_min_
        rng = np.where(rng == 0.0, 1.0, rng)  # _handle_zeros_in_scale
        self.scale_ = (hi - lo) / rng
        self.min_ = lo - self.data_min_ * self.scale_
        return self

    def transform(self, X):
        X = np.asarray(X, np.float64)
        return X * self.scale_ + self.min_

    def fit_transform(self, X):
        return self.fit(X).transform(X)
