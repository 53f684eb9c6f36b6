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
    """Exp-sine-squared periodic covariance:
    ``k = exp(−2 sin²(π r / p) / ℓ²)`` with trainable (lengthscale ℓ,
    period p) — the standard kernel for seasonal/cyclic structure, absent
    from the reference's family.  Analytic derivatives (FD-checked):
    ``dk/dℓ = 4 sin²(π r/p) / ℓ³ · k`` and
    ``dk/dp = (4π r)/(ℓ² p²) · sin(π r/p) cos(π r/p) · k``.
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
        self._r: np.ndarray | None = None

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

    def set_training_vectors(self, X) -> "PeriodicKernel":
        super().set_training_vectors(X)
        X = self.get_training_vectors()
        self._r = np.sqrt(_sq_dists(X, X))
        return self

    def _r_or_raise(self) -> np.ndarray:
        self.get_training_vectors()
        assert self._r is not None
        return self._r

    def _k_of_r(self, r: np.ndarray) -> np.ndarray:
        sin2 = np.sin(np.pi * r / self.period) ** 2
        return np.exp(-2.0 * sin2 / self.lengthscale**2)

    def training_kernel(self) -> np.ndarray:
        return self._k_of_r(self._r_or_raise())

    def training_kernel_diag(self) -> np.ndarray:
        return np.ones(len(self.get_training_vectors()))

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        r = self._r_or_raise()
        ell, p = self.lengthscale, self.period
        arg = np.pi * r / p
        sin_, cos_ = np.sin(arg), np.cos(arg)
        K = np.exp(-2.0 * sin_**2 / ell**2)
        dK_ell = 4.0 * sin_**2 / ell**3 * K
        dK_p = (4.0 * np.pi * r) / (ell**2 * p**2) * sin_ * cos_ * K
        return K, np.stack([dK_ell, dK_p])

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return self._k_of_r(np.sqrt(_sq_dists(test, self.get_training_vectors())))

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.ones(test.shape[0])

    def __repr__(self) -> str:
        return (
            f"PeriodicKernel(lengthscale={self.lengthscale:.1e}, period={self.period:.1e})"
        )
