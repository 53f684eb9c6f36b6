"""Kernel algebra: the GP library's user-extensible "expression" surface."""

from .base import (
    ConstantTimesKernel,
    EyeKernel,
    Kernel,
    Scalar,
    SumOfKernels,
    TrainableScalarTimesKernel,
    TrainingVectorsNotInitializedException,
    white_noise_kernel,
)
from .matern import (
    LinearKernel,
    MaternKernel,
    PeriodicKernel,
    RationalQuadraticKernel,
)
from .rbf import ARDRBFKernel, RBFKernel

__all__ = [
    "ARDRBFKernel",
    "ConstantTimesKernel",
    "EyeKernel",
    "Kernel",
    "LinearKernel",
    "MaternKernel",
    "PeriodicKernel",
    "RationalQuadraticKernel",
    "RBFKernel",
    "Scalar",
    "SumOfKernels",
    "TrainableScalarTimesKernel",
    "TrainingVectorsNotInitializedException",
    "white_noise_kernel",
]
