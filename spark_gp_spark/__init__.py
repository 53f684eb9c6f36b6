"""spark_gp_spark — a PySpark-native Gaussian Process + data-pipeline engine.

Re-implements the capabilities of the reference GP-on-Spark library (Bayesian
Committee Machine fitting, Projected Process prediction, kernel algebra,
random/k-means/greedy active sets, regression + binary classification) on
idiomatic PySpark — DataFrames, Arrow-vectorized pandas UDFs, and driver-side
numpy — and extends it with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.
"""

from .classification import (
    GaussianProcessClassificationModel,
    GaussianProcessClassifier,
    OneVsRestGP,
)
from .kernel import (
    ARDRBFKernel,
    EyeKernel,
    Kernel,
    LinearKernel,
    MaternKernel,
    PeriodicKernel,
    RationalQuadraticKernel,
    RBFKernel,
    Scalar,
    white_noise_kernel,
)
from .regression import GaussianProcessRegression, GaussianProcessRegressionModel

__all__ = [
    "ARDRBFKernel",
    "EyeKernel",
    "GaussianProcessClassificationModel",
    "GaussianProcessClassifier",
    "GaussianProcessRegression",
    "GaussianProcessRegressionModel",
    "Kernel",
    "LinearKernel",
    "MaternKernel",
    "PeriodicKernel",
    "RationalQuadraticKernel",
    "OneVsRestGP",
    "RBFKernel",
    "Scalar",
    "white_noise_kernel",
]

__version__ = "0.1.0"
