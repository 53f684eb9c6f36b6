"""Matérn kernels (ν = 3/2 and ν = 5/2), numpy-vectorized.

An extension beyond the reference's kernel family (SURVEY §2.4 lists only
RBF/ARD-RBF/Eye): Matérn covariances are the standard choice when the RBF's
infinite smoothness over-smooths — ν controls mean-square differentiability
(⌈ν⌉−1 times).  Both fit the same 10-method ``Kernel`` contract, so they
compose with Sum/Scalar/WhiteNoise and plug into either estimator.

With s = √(2ν)·r/ℓ over pairwise distance r and lengthscale ℓ:
- ν = 3/2:  k = (1 + s)·e^{−s},          dk/dℓ = 3 r²/ℓ³ · e^{−s}
- ν = 5/2:  k = (1 + s + s²/3)·e^{−s},   dk/dℓ = (5 r²)/(3 ℓ³) · (1 + s)·e^{−s}

(derivatives by the chain rule through ds/dℓ = −s/ℓ; both verified against
central finite differences in tests/test_kernels.py.)
"""

from __future__ import annotations

import numpy as np

from .base import _TrainDataBearing, _as_matrix
from .rbf import _sq_dists

_SQRT3 = np.sqrt(3.0)
_SQRT5 = np.sqrt(5.0)


class MaternKernel(_TrainDataBearing):
    """Matérn covariance with a single trainable lengthscale.

    ``nu`` must be 1.5 or 2.5 (the closed-form cases used in practice; other
    ν need Bessel functions and are not worth the hyperparameter trouble).
    """

    def __init__(
        self,
        lengthscale: float = 1.0,
        nu: float = 1.5,
        lower: float = 1e-6,
        upper: float = np.inf,
    ) -> None:
        super().__init__()
        if nu not in (1.5, 2.5):
            raise ValueError(f"nu must be 1.5 or 2.5, got {nu!r}")
        self.lengthscale = float(lengthscale)
        self.nu = float(nu)
        self.lower = float(lower)
        self.upper = float(upper)
        self._r: np.ndarray | None = None

    def get_hyperparameters(self) -> np.ndarray:
        return np.array([self.lengthscale])

    def set_hyperparameters(self, value: np.ndarray) -> "MaternKernel":
        self.lengthscale = float(np.asarray(value).ravel()[0])
        return self

    @property
    def n_hyperparameters(self) -> int:
        return 1

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return np.array([self.lower]), np.array([self.upper])

    def set_training_vectors(self, X) -> "MaternKernel":
        super().set_training_vectors(X)
        X = self.get_training_vectors()
        # distances are hyperparameter-independent — precompute once per
        # data slice, like RBF's squared-distance cache
        self._r = np.sqrt(_sq_dists(X, X))
        return self

    def _r_or_raise(self) -> np.ndarray:
        self.get_training_vectors()  # raises if not initialized
        assert self._r is not None
        return self._r

    def _k_of_r(self, r: np.ndarray) -> np.ndarray:
        if self.nu == 1.5:
            s = _SQRT3 * r / self.lengthscale
            return (1.0 + s) * np.exp(-s)
        s = _SQRT5 * r / self.lengthscale
        return (1.0 + s + s * s / 3.0) * np.exp(-s)

    def training_kernel(self) -> np.ndarray:
        return self._k_of_r(self._r_or_raise())

    def training_kernel_diag(self) -> np.ndarray:
        return np.ones(len(self.get_training_vectors()))

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        r = self._r_or_raise()
        ell = self.lengthscale
        if self.nu == 1.5:
            s = _SQRT3 * r / ell
            K = (1.0 + s) * np.exp(-s)
            dK = 3.0 * r * r / ell**3 * np.exp(-s)
        else:
            s = _SQRT5 * r / ell
            K = (1.0 + s + s * s / 3.0) * np.exp(-s)
            dK = (5.0 * r * r) / (3.0 * ell**3) * (1.0 + s) * np.exp(-s)
        return K, dK[None, :, :]

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        r = np.sqrt(_sq_dists(test, self.get_training_vectors()))
        return self._k_of_r(r)

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.ones(test.shape[0])

    def __repr__(self) -> str:
        return f"MaternKernel(lengthscale={self.lengthscale:.1e}, nu={self.nu})"


class PeriodicKernel(_TrainDataBearing):
    """Exp-sine-squared periodic covariance in PER-DIMENSION product form:
    ``k = exp(−2 Σ_j sin²(π Δ_j / p) / ℓ²)`` with trainable (lengthscale ℓ,
    period p) — the standard kernel for seasonal/cyclic structure, absent
    from the reference's family.

    The per-dimension form (a product of valid 1-D periodic kernels) is PSD
    for ANY input dimension; the tempting isotropic shortcut
    ``sin²(π‖x−y‖/p)`` is NOT a valid kernel for d ≥ 2 — a hypothesis
    property test surfaced Gram matrices with eigenvalues as low as −1.6
    (tests/test_properties.py).  For d = 1 the two coincide (sin² is even).

    Analytic derivatives (FD-checked), with S = Σ_j sin²(π Δ_j / p):
    ``dk/dℓ = 4 S / ℓ³ · k`` and
    ``dk/dp = (2π)/(ℓ² p²) · Σ_j Δ_j sin(2π Δ_j / p) · k``.

    The (n, n, d) pairwise-difference tensor is cached per data slice —
    experts are chunk-sized (n ≈ 10²–10³, small d), so this stays a few MB.
    """

    def __init__(
        self,
        lengthscale: float = 1.0,
        period: float = 1.0,
        lower: float = 1e-6,
        upper: float = np.inf,
    ) -> None:
        super().__init__()
        self.lengthscale = float(lengthscale)
        self.period = float(period)
        self.lower = float(lower)
        self.upper = float(upper)
        self._delta: np.ndarray | None = None

    def get_hyperparameters(self) -> np.ndarray:
        return np.array([self.lengthscale, self.period])

    def set_hyperparameters(self, value: np.ndarray) -> "PeriodicKernel":
        v = np.asarray(value, dtype=np.float64).ravel()
        self.lengthscale, self.period = float(v[0]), float(v[1])
        return self

    @property
    def n_hyperparameters(self) -> int:
        return 2

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return np.array([self.lower, self.lower]), np.array([self.upper, self.upper])

    @staticmethod
    def _pairwise_delta(A: np.ndarray, B: np.ndarray) -> np.ndarray:
        return A[:, None, :] - B[None, :, :]  # (nA, nB, d)

    def set_training_vectors(self, X) -> "PeriodicKernel":
        super().set_training_vectors(X)
        X = self.get_training_vectors()
        self._delta = self._pairwise_delta(X, X)
        return self

    def _delta_or_raise(self) -> np.ndarray:
        self.get_training_vectors()
        assert self._delta is not None
        return self._delta

    def _k_of_delta(self, delta: np.ndarray) -> np.ndarray:
        S = np.sum(np.sin(np.pi * delta / self.period) ** 2, axis=-1)
        return np.exp(-2.0 * S / self.lengthscale**2)

    def training_kernel(self) -> np.ndarray:
        return self._k_of_delta(self._delta_or_raise())

    def training_kernel_diag(self) -> np.ndarray:
        return np.ones(len(self.get_training_vectors()))

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        delta = self._delta_or_raise()
        ell, p = self.lengthscale, self.period
        S = np.sum(np.sin(np.pi * delta / p) ** 2, axis=-1)
        K = np.exp(-2.0 * S / ell**2)
        dK_ell = 4.0 * S / ell**3 * K
        T = np.sum(delta * np.sin(2.0 * np.pi * delta / p), axis=-1)
        dK_p = (2.0 * np.pi) / (ell**2 * p**2) * T * K
        return K, np.stack([dK_ell, dK_p])

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return self._k_of_delta(self._pairwise_delta(test, self.get_training_vectors()))

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.ones(test.shape[0])

    def __repr__(self) -> str:
        return (
            f"PeriodicKernel(lengthscale={self.lengthscale:.1e}, period={self.period:.1e})"
        )


class RationalQuadraticKernel(_TrainDataBearing):
    """Rational-quadratic covariance — an infinite scale-mixture of RBFs:
    ``k = (1 + r²/(2αℓ²))^(−α)`` with trainable (lengthscale ℓ, mixture
    index α); α → ∞ recovers the RBF, small α models variation on many
    lengthscales at once.  Analytic derivatives (FD-checked in
    tests/test_kernels.py), with u = r²/(2αℓ²) and B = 1 + u:
    ``dk/dℓ = B^(−α−1) · r²/ℓ³``  and  ``dk/dα = k · (u/B − ln B)``.
    """

    def __init__(
        self,
        lengthscale: float = 1.0,
        alpha: float = 1.0,
        lower: float = 1e-6,
        upper: float = np.inf,
    ) -> None:
        super().__init__()
        self.lengthscale = float(lengthscale)
        self.alpha = float(alpha)
        self.lower = float(lower)
        self.upper = float(upper)
        self._sq: np.ndarray | None = None

    def get_hyperparameters(self) -> np.ndarray:
        return np.array([self.lengthscale, self.alpha])

    def set_hyperparameters(self, value: np.ndarray) -> "RationalQuadraticKernel":
        v = np.asarray(value, dtype=np.float64).ravel()
        self.lengthscale, self.alpha = float(v[0]), float(v[1])
        return self

    @property
    def n_hyperparameters(self) -> int:
        return 2

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return np.array([self.lower, self.lower]), np.array([self.upper, self.upper])

    def set_training_vectors(self, X) -> "RationalQuadraticKernel":
        super().set_training_vectors(X)
        X = self.get_training_vectors()
        self._sq = _sq_dists(X, X)  # hyperparameter-independent, cached
        return self

    def _sq_or_raise(self) -> np.ndarray:
        self.get_training_vectors()
        assert self._sq is not None
        return self._sq

    def _k_of_sq(self, sq: np.ndarray) -> np.ndarray:
        u = sq / (2.0 * self.alpha * self.lengthscale**2)
        return (1.0 + u) ** (-self.alpha)

    def training_kernel(self) -> np.ndarray:
        return self._k_of_sq(self._sq_or_raise())

    def training_kernel_diag(self) -> np.ndarray:
        return np.ones(len(self.get_training_vectors()))

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        sq = self._sq_or_raise()
        ell, a = self.lengthscale, self.alpha
        u = sq / (2.0 * a * ell**2)
        B = 1.0 + u
        K = B ** (-a)
        dK_ell = B ** (-a - 1.0) * sq / ell**3
        dK_a = K * (u / B - np.log(B))
        return K, np.stack([dK_ell, dK_a])

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return self._k_of_sq(_sq_dists(test, self.get_training_vectors()))

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.ones(test.shape[0])

    def __repr__(self) -> str:
        return (
            f"RationalQuadraticKernel(lengthscale={self.lengthscale:.1e}, "
            f"alpha={self.alpha:.1e})"
        )


class LinearKernel(_TrainDataBearing):
    """Dot-product (linear) covariance — Rasmussen & Williams §4.2.2:

        k(x, y) = σ_b² + σ_v² · (x · y)

    with trainable (σ_b, σ_v).  Bayesian linear regression as a GP: sample
    paths are linear functions, so Sum-composing it with an RBF/Matérn
    (``LinearKernel() + Scalar(1.0) * RBFKernel(...)``) models
    trend + smooth-residual structure the stationary family alone cannot.
    Absent from the reference's kernel family (SURVEY §2.4: RBF/ARD/Eye);
    fits the same 10-method contract, so it composes with Sum/Scalar/
    WhiteNoise and plugs into either estimator.

    Analytic derivatives (FD-checked in tests/test_kernels.py):
    ``dk/dσ_b = 2 σ_b`` (constant matrix), ``dk/dσ_v = 2 σ_v (x · y)``.
    The Gram matrix X·Xᵀ is PSD but rank-≤ d; the estimators' σ²·Eye noise
    injection keeps the factorization strictly PD, exactly as for the
    reference's own noiseless-kernel configurations.  The Gram is
    hyperparameter-independent and precomputed once per data slice, like
    RBF's squared-distance cache.
    """

    def __init__(
        self,
        sigma_b: float = 1.0,
        sigma_v: float = 1.0,
        lower: float = 1e-6,
        upper: float = np.inf,
    ) -> None:
        super().__init__()
        self.sigma_b = float(sigma_b)
        self.sigma_v = float(sigma_v)
        self.lower = float(lower)
        self.upper = float(upper)
        self._gram: np.ndarray | None = None

    def get_hyperparameters(self) -> np.ndarray:
        return np.array([self.sigma_b, self.sigma_v])

    def set_hyperparameters(self, value: np.ndarray) -> "LinearKernel":
        v = np.asarray(value, dtype=np.float64).ravel()
        self.sigma_b, self.sigma_v = float(v[0]), float(v[1])
        return self

    @property
    def n_hyperparameters(self) -> int:
        return 2

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return np.array([self.lower] * 2), np.array([self.upper] * 2)

    def set_training_vectors(self, X) -> "LinearKernel":
        super().set_training_vectors(X)
        X = self.get_training_vectors()
        self._gram = X @ X.T
        return self

    def _gram_or_raise(self) -> np.ndarray:
        self.get_training_vectors()
        assert self._gram is not None
        return self._gram

    def training_kernel(self) -> np.ndarray:
        return self.sigma_b**2 + self.sigma_v**2 * self._gram_or_raise()

    def training_kernel_diag(self) -> np.ndarray:
        return self.sigma_b**2 + self.sigma_v**2 * np.diag(self._gram_or_raise())

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        G = self._gram_or_raise()
        K = self.sigma_b**2 + self.sigma_v**2 * G
        d_b = np.full_like(G, 2.0 * self.sigma_b)
        d_v = 2.0 * self.sigma_v * G
        return K, np.stack([d_b, d_v])

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return self.sigma_b**2 + self.sigma_v**2 * (
            test @ self.get_training_vectors().T
        )

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return self.sigma_b**2 + self.sigma_v**2 * np.einsum("ij,ij->i", test, test)

    def __repr__(self) -> str:
        return f"LinearKernel(sigma_b={self.sigma_b:.1e}, sigma_v={self.sigma_v:.1e})"
