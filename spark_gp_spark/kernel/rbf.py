"""RBF and ARD-RBF kernels, numpy-vectorized.

Parity targets (reference):
- RBF: ``k(a, b) = exp(-||a - b||^2 / (2 sigma^2))``, one hyperparameter
  ``sigma``, analytic derivative ``dK/dsigma = sqdist * K / sigma^3``
  (RBFKernel.scala:14-85; golden matrices RBFKernelTest.scala:29-76).
- ARD RBF: ``k(a, b) = exp(-||(a - b) * beta||^2)`` — note: beta MULTIPLIES
  and there is no factor 1/2 in the exponent, a deliberately different
  convention from RBF that we preserve exactly for golden-output parity
  (ARDRBFKernel.scala:20-96).  Per-dimension derivative:
  ``dK/dbeta_k = -2 K * beta_k * (a_k - b_k)^2`` (ARDRBFKernel.scala:63-81).
"""

from __future__ import annotations

import numpy as np

from .base import _TrainDataBearing, _as_matrix


def _sq_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Pairwise squared euclidean distances, shape (len(A), len(B))."""
    # ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b ; clip negatives from cancellation
    aa = np.einsum("ij,ij->i", A, A)
    bb = np.einsum("ij,ij->i", B, B)
    d = aa[:, None] + bb[None, :] - 2.0 * (A @ B.T)
    np.maximum(d, 0.0, out=d)
    return d


class RBFKernel(_TrainDataBearing):
    """Radial basis function kernel with a single trainable bandwidth."""

    def __init__(self, sigma: float = 1.0, lower: float = 1e-6, upper: float = np.inf) -> None:
        super().__init__()
        self.sigma = float(sigma)
        self.lower = float(lower)
        self.upper = float(upper)
        self._sqd: np.ndarray | None = None

    def get_hyperparameters(self) -> np.ndarray:
        return np.array([self.sigma])

    def set_hyperparameters(self, value: np.ndarray) -> "RBFKernel":
        self.sigma = float(np.asarray(value).ravel()[0])
        return self

    @property
    def n_hyperparameters(self) -> int:
        return 1

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return np.array([self.lower]), np.array([self.upper])

    def set_training_vectors(self, X) -> "RBFKernel":
        super().set_training_vectors(X)
        # Precompute the squared-distance matrix once per data slice; it is
        # hyperparameter-independent (RBFKernel.scala:37-48).
        X = self.get_training_vectors()
        self._sqd = _sq_dists(X, X)
        return self

    def _sqd_or_raise(self) -> np.ndarray:
        self.get_training_vectors()  # raises if not initialized
        assert self._sqd is not None
        return self._sqd

    def training_kernel(self) -> np.ndarray:
        return np.exp(self._sqd_or_raise() / (-2.0 * self.sigma**2))

    def training_kernel_diag(self) -> np.ndarray:
        return np.ones(len(self.get_training_vectors()))

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        sqd = self._sqd_or_raise()
        K = np.exp(sqd / (-2.0 * self.sigma**2))
        dK = sqd * K / self.sigma**3
        return K, dK[None, :, :]

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.exp(_sq_dists(test, self.get_training_vectors()) / (-2.0 * self.sigma**2))

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.ones(test.shape[0])

    def __repr__(self) -> str:
        return f"RBFKernel(sigma={self.sigma:.1e})"


class ARDRBFKernel(_TrainDataBearing):
    """Automatic Relevance Determination RBF kernel: one inverse-lengthscale
    per input dimension."""

    def __init__(self, beta, lower=None, upper=None) -> None:
        super().__init__()
        if isinstance(beta, int):
            # ARDRBFKernel.scala:28-31 — dimension + uniform initial value
            beta = np.ones(beta)
        self.beta = np.asarray(beta, dtype=np.float64).ravel().copy()
        p = len(self.beta)
        self.lower = np.zeros(p) if lower is None else np.broadcast_to(np.asarray(lower, dtype=np.float64), (p,)).copy()
        self.upper = np.full(p, np.inf) if upper is None else np.broadcast_to(np.asarray(upper, dtype=np.float64), (p,)).copy()

    def get_hyperparameters(self) -> np.ndarray:
        return self.beta.copy()

    def set_hyperparameters(self, value: np.ndarray) -> "ARDRBFKernel":
        self.beta = np.asarray(value, dtype=np.float64).ravel().copy()
        return self

    @property
    def n_hyperparameters(self) -> int:
        return len(self.beta)

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return self.lower, self.upper

    def _weighted_sqd(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        Aw = A * self.beta[None, :]
        Bw = B * self.beta[None, :]
        return _sq_dists(Aw, Bw)

    def training_kernel(self) -> np.ndarray:
        X = self.get_training_vectors()
        return np.exp(-self._weighted_sqd(X, X))

    def training_kernel_diag(self) -> np.ndarray:
        return np.ones(len(self.get_training_vectors()))

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        X = self.get_training_vectors()
        K = self.training_kernel()
        # dK/dbeta_k = -2 K * beta_k * (x_ik - x_jk)^2  (ARDRBFKernel.scala:63-81)
        diff = X[:, None, :] - X[None, :, :]  # (n, n, d)
        dK = -2.0 * K[None, :, :] * (self.beta[:, None, None] * np.moveaxis(diff**2, 2, 0))
        return K, dK

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.exp(-self._weighted_sqd(test, self.get_training_vectors()))

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.ones(test.shape[0])

    def __repr__(self) -> str:
        return f"ARDRBFKernel(beta={self.beta!r})"
