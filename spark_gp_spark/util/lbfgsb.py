"""Box-constrained L-BFGS for the driver-side hyperparameter search.

The reference uses breeze's LBFGSB (GaussianProcessCommons.scala:82-91).  The
container ships no scipy, so this is a self-contained implementation:

- two-loop-recursion L-BFGS direction (Nocedal & Wright ch. 7),
- strong-Wolfe line search with bracketing + zoom (N&W alg. 3.5/3.6) while the
  step stays interior — the curvature condition keeps the (s, y) pairs
  positive-definite,
- when the line hits the box, the step is capped at the boundary and accepted
  under Armijo with projection; pairs with non-positive curvature are skipped.

Dimensions here are tiny (a handful of kernel hyperparameters) but each
objective evaluation is a Spark job, so the memoized caller keeps evaluation
counts low.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np


def _project(x: np.ndarray, lower: np.ndarray, upper: np.ndarray) -> np.ndarray:
    return np.minimum(np.maximum(x, lower), upper)


def _max_feasible_step(x, d, lower, upper) -> float:
    """Largest alpha with x + alpha*d inside the box."""
    with np.errstate(divide="ignore", invalid="ignore"):
        steps = np.where(d > 0, (upper - x) / d, np.where(d < 0, (lower - x) / d, np.inf))
    return float(np.min(steps)) if len(steps) else np.inf


def _wolfe_zoom(fun, x, f0, g0, d, alpha_max, c1=1e-4, c2=0.9, max_evals=25):
    """Strong-Wolfe line search along x + alpha*d (interior).  Returns
    (alpha, f, g) or None on failure."""
    dphi0 = float(g0 @ d)
    phi = lambda a: fun(x + a * d)

    def zoom(alo, ahi, flo, glo_d):
        for _ in range(max_evals):
            a = 0.5 * (alo + ahi)
            f, g = phi(a)
            if (not np.isfinite(f)) or f > f0 + c1 * a * dphi0 or f >= flo:
                ahi = a
            else:
                dphi = float(g @ d)
                if abs(dphi) <= -c2 * dphi0:
                    return a, f, g
                if dphi * (ahi - alo) >= 0:
                    ahi = alo
                alo, flo, glo_d = a, f, dphi
            if abs(ahi - alo) < 1e-14:
                break
        f, g = phi(alo)
        return (alo, f, g) if np.isfinite(f) and f < f0 else None

    a_prev, f_prev = 0.0, f0
    a = min(1.0, alpha_max)
    for _ in range(max_evals):
        f, g = phi(a)
        if (not np.isfinite(f)) or f > f0 + c1 * a * dphi0 or (a_prev > 0 and f >= f_prev):
            return zoom(a_prev, a, f_prev, dphi0)
        dphi = float(g @ d)
        if abs(dphi) <= -c2 * dphi0:
            return a, f, g
        if dphi >= 0:
            return zoom(a, a_prev, f, dphi)
        a_prev, f_prev = a, f
        a = min(2.0 * a, alpha_max)
        if a_prev >= alpha_max * (1 - 1e-12):
            return a_prev, f_prev, g
    return None


def minimize_lbfgsb(
    fun: Callable[[np.ndarray], tuple[float, np.ndarray]],
    x0: np.ndarray,
    lower: np.ndarray,
    upper: np.ndarray,
    max_iter: int = 100,
    tol: float = 1e-6,
    memory: int = 10,
) -> np.ndarray:
    """Minimize ``fun`` (returning (value, gradient)) subject to
    ``lower <= x <= upper``.  Returns the best x found."""
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    x = _project(np.asarray(x0, dtype=np.float64).copy(), lower, upper)
    f, g = fun(x)
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    best_x, best_f = x.copy(), f

    for _ in range(max_iter):
        pg = x - _project(x - g, lower, upper)
        if np.max(np.abs(pg)) < tol:
            break

        # Two-loop recursion for d = -H g.
        q = g.copy()
        alphas = []
        for s, y in zip(reversed(s_hist), reversed(y_hist)):
            rho = 1.0 / float(y @ s)
            a = rho * float(s @ q)
            alphas.append((a, rho, s, y))
            q -= a * y
        if y_hist:
            s_last, y_last = s_hist[-1], y_hist[-1]
            q *= float(s_last @ y_last) / float(y_last @ y_last)
        for a, rho, s, y in reversed(alphas):
            b = rho * float(y @ q)
            q += (a - b) * s
        d = -q
        if float(d @ g) >= 0.0:  # not a descent direction; reset
            d = -g
            s_hist.clear()
            y_hist.clear()

        alpha_max = _max_feasible_step(x, d, lower, upper)
        result = None
        if alpha_max > 1e-14:
            result = _wolfe_zoom(fun, x, f, g, d, alpha_max)
        if result is not None:
            alpha, f_new, g_new = result
            x_new = x + alpha * d
        else:
            # Projected-arc Armijo fallback (boundary or pathological line).
            step = min(1.0, alpha_max) if np.isfinite(alpha_max) and alpha_max > 0 else 1.0
            x_new = f_new = g_new = None
            for _ls in range(30):
                cand = _project(x + step * d, lower, upper)
                dx = cand - x
                if np.max(np.abs(dx)) == 0.0:
                    break
                fc, gc = fun(cand)
                if np.isfinite(fc) and fc <= f + 1e-4 * float(g @ dx):
                    x_new, f_new, g_new = cand, fc, gc
                    break
                step *= 0.5
            if x_new is None:
                break

        s_vec = x_new - x
        y_vec = g_new - g
        if float(s_vec @ y_vec) > 1e-10 * float(
            np.linalg.norm(s_vec) * np.linalg.norm(y_vec) + 1e-30
        ):
            s_hist.append(s_vec)
            y_hist.append(y_vec)
            if len(s_hist) > memory:
                s_hist.pop(0)
                y_hist.pop(0)

        f_delta = abs(f_new - f)
        x = _project(x_new, lower, upper)
        f, g = f_new, g_new
        if f < best_f:
            best_x, best_f = x.copy(), f
        if f_delta < tol * max(1.0, abs(f)) and np.max(np.abs(s_vec)) < tol:
            break

    return best_x
