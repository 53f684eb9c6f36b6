"""Dense linear-algebra helpers shared by the GP experts (numpy-only).

The reference computes logdet and inverse from a single LU factorization
(`/root/reference/src/main/scala/org/apache/spark/ml/commons/util/logDetAndInv.scala:9-64`).
We keep the "factor once, reuse" idea via Cholesky (default): every matrix the
GP inverts is K + sigma2*I, which is symmetric positive definite by
construction, so Cholesky is both faster and more stable.  The container has
no scipy, so everything routes through numpy.linalg (LAPACK-backed).
"""

from __future__ import annotations

import numpy as np


class NotPositiveDefiniteException(Exception):
    """Mirrors the reference's actionable PD failure
    (ProjectedGaussianProcessHelper.scala:9-11)."""

    def __init__(self) -> None:
        super().__init__(
            "Some matrix which is supposed to be positive definite is not. "
            "This probably happened due to `sigma2` parameter being too small. "
            "Try to gradually increase it."
        )


def logdet_and_inv(X: np.ndarray, assume_posdef: bool = True) -> tuple[float, float, np.ndarray]:
    """Returns ``(sign, logdet, inverse)`` from one matrix factorization.

    Parity: logDetAndInv.scala:52-63.  With ``assume_posdef`` (the GP hot
    path) we Cholesky-factor once and derive both outputs from L; otherwise
    fall back to slogdet + inv.
    """
    if assume_posdef:
        try:
            L = np.linalg.cholesky(X)
        except np.linalg.LinAlgError:
            return logdet_and_inv(X, assume_posdef=False)
        logdet = 2.0 * float(np.sum(np.log(np.diag(L))))
        Linv = np.linalg.solve(L, np.eye(X.shape[0]))
        return 1.0, logdet, Linv.T @ Linv
    sign, logdet = np.linalg.slogdet(X)
    if sign == 0.0:
        return 0.0, -np.inf, np.full_like(X, np.nan)
    return float(sign), float(logdet), np.linalg.inv(X)


def solve_posdef(A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Solve A x = b for symmetric positive definite A; raises the reference's
    actionable error if A is not PD (ProjectedGaussianProcessHelper.scala:62-65)."""
    try:
        L = np.linalg.cholesky(A)
    except np.linalg.LinAlgError as e:
        raise NotPositiveDefiniteException() from e
    return np.linalg.solve(L.T, np.linalg.solve(L, b))


def assert_sym_positive_definite(A: np.ndarray) -> None:
    """PD assertion via symmetric eigenvalues
    (ProjectedGaussianProcessHelper.scala:67-70).

    Unlike the reference's strict ``< 0`` check, negative eigenvalues within
    floating-point roundoff of the matrix scale are tolerated: at optimized
    hyperparameters the projected system routinely has condition numbers
    > 1e12, where eigvalsh legitimately returns ≈ -1e-12 for a PSD matrix."""
    ev = np.linalg.eigvalsh(A)
    tol = 1e-10 * max(float(np.max(np.abs(ev))), 1.0)
    if np.any(ev < -tol):
        raise NotPositiveDefiniteException()
