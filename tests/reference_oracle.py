"""Shared exact oracle + fixture streams reproducing the reference harness.

Distributions mirror main.cpp:175-181; the exact quantile oracle is the order
statistic at idx = floor(1 + q*(n-1)) (main.cpp:962-976).
"""

from __future__ import annotations

import math

import numpy as np


def exact_quantile(values: np.ndarray, q: float) -> float:
    """Order statistic at floor(1+q*(n-1)) (1-based), via partition
    (the reference uses std::nth_element, main.cpp:971-976)."""
    n = len(values)
    idx = int(math.floor(1 + q * (n - 1)))  # 1-based
    return float(np.partition(np.asarray(values, dtype=np.float64), idx - 1)[idx - 1])


def reference_streams(n: int, seed: int = 42) -> dict[str, np.ndarray]:
    """The six harness distributions (main.cpp:175-181), seeded."""
    rng = np.random.default_rng(seed)
    return {
        "normal_2_3": rng.normal(2, 3, n),
        "normal_10_3": rng.normal(10, 3, n),
        "exponential_17": rng.exponential(1 / 17, n),
        "uniform_neg": rng.uniform(-50, 0, n),
        "uniform_wide": rng.uniform(10, 4e5, n),
        "gamma_2_2": rng.gamma(2, 2, n),
    }


Q_GRID = (0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99)
