"""Sketch configuration.

Mirrors the reference defaults (reference: main.cpp:32-34):
offset = 1073741824 (2^31/2), bin_limit = 500, alpha = 0.008.

gamma = (1+alpha)/(1-alpha), ln_gamma cached (reference: ddsketch.cc:37-38).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

DEFAULT_OFFSET = 1073741824
DEFAULT_BIN_LIMIT = 500
DEFAULT_ALPHA = 0.008

# Collapse strategies (reference: ddsketch.cc:212/258/300 dispatch in main.cpp:285-315)
GAMMA2 = "gamma2"  # collapse type 1: square gamma, halve resolution
LAST = "last"      # collapse type 2: fold 2nd-last bucket into last
FIRST = "first"    # collapse type 3: fold 2nd bucket into first

COLLAPSE_TYPES = (GAMMA2, LAST, FIRST)

# The 11-point quantile grid used by the reference oracle (main.cpp:962).
Q_GRID = (0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99)


@dataclass(frozen=True)
class DDSketchConfig:
    """Immutable sketch parameters, broadcast into UDF closures.

    ``alpha`` here is always the *initial* alpha (level 0); a state's
    effective alpha after j gamma^2 collapses is derived via
    :func:`alpha_at_level`.
    """

    offset: int = DEFAULT_OFFSET
    bin_limit: int = DEFAULT_BIN_LIMIT
    alpha: float = DEFAULT_ALPHA
    collapse: str = GAMMA2

    def __post_init__(self) -> None:
        if not (0.0 < self.alpha < 1.0):
            raise ValueError(f"alpha must be in (0,1), got {self.alpha}")
        if self.bin_limit < 2:
            raise ValueError(f"bin_limit must be >= 2, got {self.bin_limit}")
        if self.collapse not in COLLAPSE_TYPES:
            raise ValueError(f"collapse must be one of {COLLAPSE_TYPES}")

    @property
    def gamma(self) -> float:
        return (1.0 + self.alpha) / (1.0 - self.alpha)

    @property
    def ln_gamma(self) -> float:
        return math.log(self.gamma)


def gamma_at_level(alpha0: float, level: int) -> float:
    """gamma after ``level`` gamma^2 collapses: gamma0^(2^level)."""
    g = (1.0 + alpha0) / (1.0 - alpha0)
    for _ in range(level):
        g = g * g
    return g


def alpha_at_level(alpha0: float, level: int) -> float:
    """alpha trajectory under gamma^2 collapse: a <- 2a/(1+a^2).

    (reference: ddsketch.cc:851)
    """
    a = alpha0
    for _ in range(level):
        a = (2.0 * a) / (1.0 + a * a)
    return a
