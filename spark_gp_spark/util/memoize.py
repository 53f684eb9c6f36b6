"""Objective memoization for the driver-side optimizer.

L-BFGS-B line searches re-evaluate the same hyperparameter vector; each
evaluation costs a Spark job, so caching pays immediately.  Parity:
DiffFunctionMemoized (util/DiffFunctionMemoized.scala:8-16).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np


def memoize_by_x(fn: Callable[[np.ndarray], tuple[float, np.ndarray]]):
    cache: dict[bytes, tuple[float, np.ndarray]] = {}

    def wrapped(x: np.ndarray) -> tuple[float, np.ndarray]:
        key = np.asarray(x, dtype=np.float64).tobytes()
        if key not in cache:
            cache[key] = fn(np.asarray(x, dtype=np.float64))
        return cache[key]

    wrapped.cache = cache  # type: ignore[attr-defined]
    return wrapped
