"""Kernel algebra for Gaussian Processes — numpy-vectorized, picklable.

Re-expresses the kernel contract of the reference library
(`/root/reference/src/main/scala/org/apache/spark/ml/commons/kernel/Kernel.scala:12-98`)
as a Python ABC whose instances operate on numpy ``(n, d)`` matrices instead of
``Array[Vector]``.  Instances ship inside pandas-UDF closures, so they must stay
numpy-only (no JVM / Spark references) and picklable.

Semantics parity notes (file:line refer to the reference):
- ``training_kernel`` / ``cross_kernel`` / ``self_kernel`` /
  ``training_kernel_diag`` / ``training_kernel_and_derivative``:
  Kernel.scala:50-98.
- hyperparameters are one flat vector with box bounds, concatenated across
  composites: SumOfKernels.scala:19-35, ScalarTimesKernel.scala:76-91.
- ``white_noise_var``: Kernel.scala:92-97 — the variance of white noise the
  kernel presumes (EyeKernel → 1, sums/scalars propagate).
- calling data-dependent methods before ``set_training_vectors`` raises
  ``TrainingVectorsNotInitializedException``: Kernel.scala:116-133.
"""

from __future__ import annotations

import numpy as np


class TrainingVectorsNotInitializedException(Exception):
    """Raised when a kernel is used before `set_training_vectors`.

    Mirrors the reference contract (Kernel.scala:119-120, unit-tested at
    RBFKernelTest.scala:9-25).
    """

    def __init__(self) -> None:
        super().__init__("set_training_vectors method should have been called first")


def _as_matrix(x) -> np.ndarray:
    a = np.asarray(x, dtype=np.float64)
    if a.ndim == 1:
        a = a.reshape(1, -1)
    return a


class Kernel:
    """Covariance function of a Gaussian Process, differentiable in its
    hyperparameters.  All matrix-returning methods are vectorized over numpy
    arrays of shape ``(n, d)``.
    """

    # -- hyperparameters ---------------------------------------------------
    def get_hyperparameters(self) -> np.ndarray:
        raise NotImplementedError

    def set_hyperparameters(self, value: np.ndarray) -> "Kernel":
        raise NotImplementedError

    @property
    def n_hyperparameters(self) -> int:
        raise NotImplementedError

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        """(lower, upper) element-wise box bounds."""
        raise NotImplementedError

    # -- training data -----------------------------------------------------
    def set_training_vectors(self, X) -> "Kernel":
        raise NotImplementedError

    def get_training_vectors(self) -> np.ndarray:
        raise NotImplementedError

    # -- kernel evaluations --------------------------------------------------
    def training_kernel(self) -> np.ndarray:
        """K with K[i, j] = k(X[i], X[j]) over the training vectors."""
        raise NotImplementedError

    def training_kernel_diag(self) -> np.ndarray:
        raise NotImplementedError

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        """Returns (K, dK) where dK has shape (p, n, n), one slice per
        hyperparameter (reference returns Array[BDM], Kernel.scala:63-68)."""
        raise NotImplementedError

    def cross_kernel(self, test) -> np.ndarray:
        """K of shape (n_test, n_train): K[i, j] = k(test[i], train[j])
        (Kernel.scala:70-76)."""
        raise NotImplementedError

    def self_kernel(self, test) -> np.ndarray:
        """Vector of k(x, x) for each test row (generalizes the reference's
        scalar selfKernel, Kernel.scala:86-91, to a batch)."""
        raise NotImplementedError

    @property
    def white_noise_var(self) -> float:
        return 0.0

    # -- DSL (kernel/package.scala:3-9, ScalarTimesKernel.scala:100-141) ----
    def __add__(self, other: "Kernel") -> "Kernel":
        return SumOfKernels(self, other)

    def __rmul__(self, c) -> "Kernel":
        if isinstance(c, (int, float)):
            return Scalar(float(c)) * self
        return NotImplemented


class _TrainDataBearing(Kernel):
    """Owns a slice of training data (TrainDatasetBearingKernel,
    Kernel.scala:126-133)."""

    def __init__(self) -> None:
        self._X: np.ndarray | None = None

    def set_training_vectors(self, X) -> "Kernel":
        self._X = _as_matrix(X)
        return self

    def get_training_vectors(self) -> np.ndarray:
        if self._X is None:
            raise TrainingVectorsNotInitializedException()
        return self._X


class EyeKernel(_TrainDataBearing):
    """Identity-matrix kernel (Kernel.scala:142-164): K=I on training data,
    cross kernel is 0, presumes unit white noise."""

    def get_hyperparameters(self) -> np.ndarray:
        return np.empty(0)

    def set_hyperparameters(self, value: np.ndarray) -> "EyeKernel":
        return self

    @property
    def n_hyperparameters(self) -> int:
        return 0

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return np.empty(0), np.empty(0)

    def training_kernel(self) -> np.ndarray:
        return np.eye(len(self.get_training_vectors()))

    def training_kernel_diag(self) -> np.ndarray:
        return np.ones(len(self.get_training_vectors()))

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        n = len(self.get_training_vectors())
        return np.eye(n), np.empty((0, n, n))

    def cross_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.zeros((test.shape[0], len(self.get_training_vectors())))

    def self_kernel(self, test) -> np.ndarray:
        test = _as_matrix(test)
        return np.ones(test.shape[0])

    @property
    def white_noise_var(self) -> float:
        return 1.0

    def __repr__(self) -> str:
        return "I"


class SumOfKernels(Kernel):
    """k'(a, b) = k1(a, b) + k2(a, b); hyperparameter vectors concatenated
    (SumOfKernels.scala:15-65)."""

    def __init__(self, k1: Kernel, k2: Kernel) -> None:
        self.k1 = k1
        self.k2 = k2

    def get_hyperparameters(self) -> np.ndarray:
        return np.concatenate([self.k1.get_hyperparameters(), self.k2.get_hyperparameters()])

    def set_hyperparameters(self, value: np.ndarray) -> "SumOfKernels":
        value = np.asarray(value, dtype=np.float64)
        p1 = self.k1.n_hyperparameters
        self.k1.set_hyperparameters(value[:p1])
        self.k2.set_hyperparameters(value[p1:])
        return self

    @property
    def n_hyperparameters(self) -> int:
        return self.k1.n_hyperparameters + self.k2.n_hyperparameters

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        lo1, up1 = self.k1.hyperparameter_bounds()
        lo2, up2 = self.k2.hyperparameter_bounds()
        return np.concatenate([lo1, lo2]), np.concatenate([up1, up2])

    def set_training_vectors(self, X) -> "SumOfKernels":
        X = _as_matrix(X)
        self.k1.set_training_vectors(X)
        self.k2.set_training_vectors(X)
        return self

    def get_training_vectors(self) -> np.ndarray:
        return self.k1.get_training_vectors()

    def training_kernel(self) -> np.ndarray:
        return self.k1.training_kernel() + self.k2.training_kernel()

    def training_kernel_diag(self) -> np.ndarray:
        return self.k1.training_kernel_diag() + self.k2.training_kernel_diag()

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        K1, d1 = self.k1.training_kernel_and_derivative()
        K2, d2 = self.k2.training_kernel_and_derivative()
        return K1 + K2, np.concatenate([d1, d2], axis=0)

    def cross_kernel(self, test) -> np.ndarray:
        return self.k1.cross_kernel(test) + self.k2.cross_kernel(test)

    def self_kernel(self, test) -> np.ndarray:
        return self.k1.self_kernel(test) + self.k2.self_kernel(test)

    @property
    def white_noise_var(self) -> float:
        return self.k1.white_noise_var + self.k2.white_noise_var

    def __repr__(self) -> str:
        return f"{self.k1!r} + {self.k2!r}"


class ConstantTimesKernel(Kernel):
    """k' = C * k with C fixed (ScalarTimesKernel.scala:41-59)."""

    def __init__(self, kernel: Kernel, c: float) -> None:
        if c < 0:
            raise ValueError("C should be positive")
        self.kernel = kernel
        self.c = float(c)

    def get_hyperparameters(self) -> np.ndarray:
        return self.kernel.get_hyperparameters()

    def set_hyperparameters(self, value: np.ndarray) -> "ConstantTimesKernel":
        self.kernel.set_hyperparameters(np.asarray(value, dtype=np.float64))
        return self

    @property
    def n_hyperparameters(self) -> int:
        return self.kernel.n_hyperparameters

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return self.kernel.hyperparameter_bounds()

    def set_training_vectors(self, X) -> "ConstantTimesKernel":
        self.kernel.set_training_vectors(X)
        return self

    def get_training_vectors(self) -> np.ndarray:
        return self.kernel.get_training_vectors()

    def training_kernel(self) -> np.ndarray:
        return self.kernel.training_kernel() * self.c

    def training_kernel_diag(self) -> np.ndarray:
        return self.kernel.training_kernel_diag() * self.c

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        K, dK = self.kernel.training_kernel_and_derivative()
        return K * self.c, dK * self.c

    def cross_kernel(self, test) -> np.ndarray:
        return self.kernel.cross_kernel(test) * self.c

    def self_kernel(self, test) -> np.ndarray:
        return self.kernel.self_kernel(test) * self.c

    @property
    def white_noise_var(self) -> float:
        return self.c * self.kernel.white_noise_var

    def __repr__(self) -> str:
        return f"{self.c:.1e} * {self.kernel!r}"


class TrainableScalarTimesKernel(Kernel):
    """k' = C * k with C the first (trainable) hyperparameter; derivative
    w.r.t. C is K itself, prepended to the inner derivatives
    (ScalarTimesKernel.scala:71-98)."""

    def __init__(self, kernel: Kernel, c: float, c_lower: float = 0.0, c_upper: float = np.inf) -> None:
        if c < 0:
            raise ValueError("C should be positive")
        self.kernel = kernel
        self.c = float(c)
        self.c_lower = float(c_lower)
        self.c_upper = float(c_upper)

    def get_hyperparameters(self) -> np.ndarray:
        return np.concatenate([[self.c], self.kernel.get_hyperparameters()])

    def set_hyperparameters(self, value: np.ndarray) -> "TrainableScalarTimesKernel":
        value = np.asarray(value, dtype=np.float64)
        self.c = float(value[0])
        self.kernel.set_hyperparameters(value[1:])
        return self

    @property
    def n_hyperparameters(self) -> int:
        return 1 + self.kernel.n_hyperparameters

    def hyperparameter_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        lo, up = self.kernel.hyperparameter_bounds()
        return np.concatenate([[self.c_lower], lo]), np.concatenate([[self.c_upper], up])

    def set_training_vectors(self, X) -> "TrainableScalarTimesKernel":
        self.kernel.set_training_vectors(X)
        return self

    def get_training_vectors(self) -> np.ndarray:
        return self.kernel.get_training_vectors()

    def training_kernel(self) -> np.ndarray:
        return self.kernel.training_kernel() * self.c

    def training_kernel_diag(self) -> np.ndarray:
        return self.kernel.training_kernel_diag() * self.c

    def training_kernel_and_derivative(self) -> tuple[np.ndarray, np.ndarray]:
        K, dK = self.kernel.training_kernel_and_derivative()
        return K * self.c, np.concatenate([K[None, :, :], dK * self.c], axis=0)

    def cross_kernel(self, test) -> np.ndarray:
        return self.kernel.cross_kernel(test) * self.c

    def self_kernel(self, test) -> np.ndarray:
        return self.kernel.self_kernel(test) * self.c

    @property
    def white_noise_var(self) -> float:
        return self.c * self.kernel.white_noise_var

    def __repr__(self) -> str:
        return f"{self.c:.1e} * {self.kernel!r}"


class Scalar:
    """Scalar factor DSL (ScalarTimesKernel.scala:100-141):
    ``Scalar(1).between(0, 30) * k`` creates a trainable factor with bounds;
    ``Scalar(2).const * k`` a fixed one. ``2 * k`` (via __rmul__) is trainable
    with bounds [0, inf), matching the reference implicit ``toScalar``."""

    def __init__(self, c: float, lower: float = 0.0, upper: float = np.inf, trainable: bool = True) -> None:
        if trainable and not lower < upper:
            raise ValueError(
                "The scalar should either have its lower limit below its upper limit or not be trainable"
            )
        self.c = float(c)
        self.lower = lower
        self.upper = upper
        self.trainable = trainable

    def __mul__(self, kernel: Kernel) -> Kernel:
        if self.trainable:
            return TrainableScalarTimesKernel(kernel, self.c, self.lower, self.upper)
        return ConstantTimesKernel(kernel, self.c)

    def between(self, lower: float, upper: float) -> "Scalar":
        return Scalar(self.c, lower, upper, self.trainable)

    def below(self, upper: float) -> "Scalar":
        return Scalar(self.c, self.lower, upper, self.trainable)

    @property
    def const(self) -> "Scalar":
        return Scalar(self.c, self.c, self.c, trainable=False)


def white_noise_kernel(initial: float, lower: float, upper: float) -> Kernel:
    """WhiteNoiseKernel sugar (Kernel.scala:166-169): a trainable scalar times
    the identity kernel."""
    return Scalar(initial, lower, upper) * EyeKernel()
