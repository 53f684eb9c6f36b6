"""Gauss-Hermite expectation of a function of a normal variable.

Parity: util/Integrator.scala:7-16 — E[f(X)], X ~ N(mean, variance), computed
with n-point Hermite quadrature:
    E[f(X)] = (1/sqrt(pi)) * sum_i w_i * f(sqrt(2)*sd*x_i + mean)

The reference builds this and unit-tests it (IntegratorTest.scala) but never
calls it from the classifier (it applies the sigmoid to the latent mean
instead, GaussianProcessClassifier.scala:141-156).  We port it and optionally
use it for calibrated GPC probabilities.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np


def expected_of_function_of_normal(
    mean: float, variance: float, f: Callable[[np.ndarray], np.ndarray], n: int = 100
) -> float:
    nodes, weights = np.polynomial.hermite.hermgauss(n)
    sd = np.sqrt(variance)
    return float(np.sum(weights * f(np.sqrt(2.0) * sd * nodes + mean)) / np.sqrt(np.pi))
