"""Kernel unit tests — golden matrices and finite-difference derivative checks.

Mirrors the reference test suite (implementation-independent math):
- RBFKernelTest.scala:29-76 (golden kernel/cross-kernel matrices, tol 1e-4)
- RBFKernelTest.scala:41-60, ARDRBFKernelTest.scala:11-31 (central-difference
  derivative checks, h=1e-3, tol 1e-3)
- RBFKernelTest.scala:9-25 (not-initialized exception contract)
"""

import numpy as np
import pytest

from spark_gp_spark.kernel import (
    ARDRBFKernel,
    EyeKernel,
    RBFKernel,
    Scalar,
    TrainingVectorsNotInitializedException,
    white_noise_kernel,
)

DATASET = np.array([[1.0, 2.0], [2.0, 3.0], [5.0, 7.0]])


def test_training_kernel_before_set_raises():
    with pytest.raises(TrainingVectorsNotInitializedException):
        RBFKernel().training_kernel()


def test_derivative_before_set_raises():
    with pytest.raises(TrainingVectorsNotInitializedException):
        RBFKernel().training_kernel_and_derivative()


def test_rbf_training_kernel_golden():
    rbf = RBFKernel(np.sqrt(0.2)).set_training_vectors(DATASET)
    expected = np.array(
        [
            [1.000000e00, 6.737947e-03, 3.053624e-45],
            [6.737947e-03, 1.000000e00, 7.187782e-28],
            [3.053624e-45, 7.187782e-28, 1.000000e00],
        ]
    )
    assert np.all(np.abs(rbf.training_kernel() - expected) < 1e-4)


def _rbf_fd_derivative(sigma, h):
    left = RBFKernel(sigma - h).set_training_vectors(DATASET)
    right = RBFKernel(sigma + h).set_training_vectors(DATASET)
    return (right.training_kernel() - left.training_kernel()) / (2 * h)


def test_rbf_derivative_matches_finite_difference():
    rbf = RBFKernel(0.2).set_training_vectors(DATASET)
    _, dK = rbf.training_kernel_and_derivative()
    assert np.all(np.abs(dK[0] - _rbf_fd_derivative(0.2, 1e-3)) < 1e-3)


def test_rbf_cross_kernel_golden():
    rbf = RBFKernel(np.sqrt(0.2)).set_training_vectors(DATASET[1:])
    cross = rbf.cross_kernel(DATASET[:1])
    expected = np.array([[6.737947e-03, 3.053624e-45]])
    assert cross.shape == (1, 2)
    assert np.all(np.abs(cross - expected) < 1e-4)


def test_rbf_cross_kernel_single_vector():
    rbf = RBFKernel(np.sqrt(0.2)).set_training_vectors(DATASET[1:])
    cross = rbf.cross_kernel(DATASET[0])  # 1-D input → (1, n) row
    assert np.all(np.abs(cross - np.array([[6.737947e-03, 3.053624e-45]])) < 1e-4)


def _ard_fd_derivative(beta, h):
    left = ARDRBFKernel(beta - h).set_training_vectors(DATASET)
    right = ARDRBFKernel(beta + h).set_training_vectors(DATASET)
    return (right.training_kernel() - left.training_kernel()) / (2 * h)


def test_ard_derivative_matches_finite_difference():
    beta = np.array([0.2, 0.3])
    ard = ARDRBFKernel(beta).set_training_vectors(DATASET)
    _, dK = ard.training_kernel_and_derivative()
    analytical = dK.sum(axis=0)
    assert np.all(np.abs(analytical - _ard_fd_derivative(beta, 1e-3)) < 1e-3)


def test_composite_kernel_hyperparameters_and_bounds():
    # 1 * RBF(0.1, 1e-6, 10) + WhiteNoise(0.5, 0, 1) — the Synthetics kernel
    k = Scalar(1.0) * RBFKernel(0.1, 1e-6, 10) + white_noise_kernel(0.5, 0, 1)
    hp = k.get_hyperparameters()
    assert np.allclose(hp, [1.0, 0.1, 0.5])
    lo, up = k.hyperparameter_bounds()
    assert np.allclose(lo, [0.0, 1e-6, 0.0])
    assert np.allclose(up, [np.inf, 10.0, 1.0])
    # white noise variance = trainable scalar of the Eye component
    k.set_training_vectors(DATASET)
    assert k.white_noise_var == pytest.approx(0.5)
    # K = C*RBF + noise*I on the diagonal
    K = k.training_kernel()
    assert np.allclose(np.diag(K), 1.0 + 0.5)
    # derivative stack: dC (=K_rbf), dsigma, dnoise (=I)
    Kfull, dK = k.training_kernel_and_derivative()
    assert dK.shape == (3, 3, 3)
    assert np.allclose(dK[2], np.eye(3))


def test_composite_derivative_finite_difference():
    def build(theta):
        k = Scalar(theta[0]) * RBFKernel(theta[1]) + white_noise_kernel(theta[2], 0, 1)
        return k.set_training_vectors(DATASET)

    theta = np.array([1.3, 0.7, 0.2])
    k = build(theta)
    k.set_hyperparameters(theta)
    _, dK = k.training_kernel_and_derivative()
    h = 1e-5
    for i in range(3):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += h
        tm[i] -= h
        fd = (build(tp).training_kernel() - build(tm).training_kernel()) / (2 * h)
        assert np.all(np.abs(dK[i] - fd) < 1e-5), f"hyperparam {i}"


def test_eye_kernel_contract():
    eye = EyeKernel().set_training_vectors(DATASET)
    assert np.allclose(eye.training_kernel(), np.eye(3))
    assert np.allclose(eye.cross_kernel(DATASET[:2]), np.zeros((2, 3)))
    assert eye.white_noise_var == 1.0


def test_scalar_const_dsl():
    k = Scalar(2.0).const * EyeKernel()
    assert k.n_hyperparameters == 0
    assert k.white_noise_var == 2.0


def test_double_times_kernel_dsl():
    k = 2.0 * RBFKernel(0.5)
    assert np.allclose(k.get_hyperparameters(), [2.0, 0.5])


def test_matern_derivative_matches_finite_difference():
    from spark_gp_spark.kernel import MaternKernel

    for nu in (1.5, 2.5):
        k = MaternKernel(0.7, nu=nu).set_training_vectors(DATASET)
        _, dK = k.training_kernel_and_derivative()
        h = 1e-4
        left = MaternKernel(0.7 - h, nu=nu).set_training_vectors(DATASET)
        right = MaternKernel(0.7 + h, nu=nu).set_training_vectors(DATASET)
        fd = (right.training_kernel() - left.training_kernel()) / (2 * h)
        assert np.all(np.abs(dK[0] - fd) < 1e-3)


def test_matern_contract_and_composition():
    from spark_gp_spark.kernel import MaternKernel

    with pytest.raises(TrainingVectorsNotInitializedException):
        MaternKernel().training_kernel()
    with pytest.raises(ValueError):
        MaternKernel(nu=2.0)
    k = MaternKernel(1.3, nu=2.5).set_training_vectors(DATASET)
    K = k.training_kernel()
    assert np.allclose(np.diag(K), 1.0) and np.all(K <= 1.0) and np.all(K >= 0.0)
    assert np.allclose(K, K.T)
    assert np.allclose(k.training_kernel_diag(), 1.0)
    assert np.allclose(k.cross_kernel(DATASET), K)
    # composes with the DSL like any kernel
    comp = (Scalar(2.0) * MaternKernel(1.0, nu=1.5) + white_noise_kernel(0.1, 0.0, 1.0)
            ).set_training_vectors(DATASET)
    assert comp.n_hyperparameters == 3
    comp.training_kernel_and_derivative()


def test_matern_gpr_end_to_end(spark):
    import pyspark.sql.functions as F

    from spark_gp_spark import GaussianProcessRegression, MaternKernel, Scalar

    df = (
        spark.range(2000)
        .withColumn("x", F.rand(31) * 6.0)
        .select("x", F.sin(F.col("x")).alias("label"), F.array("x").alias("features"))
    )
    gp = (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * MaternKernel(1.0, nu=2.5))
        .setDatasetSizeForExpert(100)
        .setActiveSetSize(100)
        .setActiveSetProvider("random")
        .setSeed(17)
        .setSigma2(1e-3)
        .setMaxIter(15)
    )
    pred = gp.fit(df).transform(df)
    rmse = pred.select(
        F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)).alias("rmse")
    ).first().rmse
    assert rmse < 0.11


def test_periodic_derivative_matches_finite_difference():
    from spark_gp_spark.kernel import PeriodicKernel

    base = (0.8, 1.3)
    k = PeriodicKernel(*base).set_training_vectors(DATASET)
    _, dK = k.training_kernel_and_derivative()
    h = 1e-5
    for i in range(2):
        lo, hi = list(base), list(base)
        lo[i] -= h
        hi[i] += h
        fd = (
            PeriodicKernel(*hi).set_training_vectors(DATASET).training_kernel()
            - PeriodicKernel(*lo).set_training_vectors(DATASET).training_kernel()
        ) / (2 * h)
        assert np.all(np.abs(dK[i] - fd) < 1e-3), i


def test_rational_quadratic_derivative_matches_finite_difference():
    from spark_gp_spark.kernel import RationalQuadraticKernel

    base = (0.9, 1.7)
    k = RationalQuadraticKernel(*base).set_training_vectors(DATASET)
    _, dK = k.training_kernel_and_derivative()
    h = 1e-5
    for i in range(2):
        lo, hi = list(base), list(base)
        lo[i] -= h
        hi[i] += h
        fd = (
            RationalQuadraticKernel(*hi).set_training_vectors(DATASET).training_kernel()
            - RationalQuadraticKernel(*lo).set_training_vectors(DATASET).training_kernel()
        ) / (2 * h)
        assert np.all(np.abs(dK[i] - fd) < 1e-3), i


def test_rational_quadratic_limits_and_composition():
    from spark_gp_spark.kernel import RationalQuadraticKernel
    from spark_gp_spark.kernel import RBFKernel as _RBF

    # alpha -> large recovers the RBF with the same lengthscale
    ell = 0.7
    rq = RationalQuadraticKernel(ell, 1e6).set_training_vectors(DATASET)
    rbf = _RBF(1.0 / ell).set_training_vectors(DATASET)  # RBF takes beta = 1/ell
    K_rq = rq.training_kernel()
    # compare against exp(-r^2 / (2 ell^2)) directly (RBF conventions differ)
    from spark_gp_spark.kernel.rbf import _sq_dists

    K_ref = np.exp(-_sq_dists(DATASET, DATASET) / (2 * ell * ell))
    assert np.allclose(K_rq, K_ref, atol=1e-4)
    # composes through the DSL like every other kernel
    from spark_gp_spark.kernel import Scalar, white_noise_kernel

    comp = Scalar(2.0) * RationalQuadraticKernel() + white_noise_kernel(0.1, 1e-6, 10.0)
    comp.set_training_vectors(DATASET)
    K, dK = comp.training_kernel_and_derivative()
    assert K.shape == (len(DATASET), len(DATASET))
    assert len(dK) == comp.n_hyperparameters


def test_linear_kernel_derivative_matches_finite_difference():
    from spark_gp_spark.kernel import LinearKernel

    k = LinearKernel(0.7, 1.3).set_training_vectors(DATASET)
    K, dK = k.training_kernel_and_derivative()
    # golden: sigma_b^2 + sigma_v^2 * X X^T
    assert np.allclose(K, 0.49 + 1.69 * (DATASET @ DATASET.T))
    h = 1e-5
    for p in range(2):
        x = np.array([0.7, 1.3])
        xl, xr = x.copy(), x.copy()
        xl[p] -= h
        xr[p] += h
        left = LinearKernel(*xl).set_training_vectors(DATASET).training_kernel()
        right = LinearKernel(*xr).set_training_vectors(DATASET).training_kernel()
        fd = (right - left) / (2 * h)
        assert np.all(np.abs(dK[p] - fd) < 1e-3), p


def test_linear_kernel_contract_and_composition():
    import pytest

    from spark_gp_spark.kernel import (
        LinearKernel,
        RBFKernel,
        Scalar,
        TrainingVectorsNotInitializedException,
    )

    with pytest.raises(TrainingVectorsNotInitializedException):
        LinearKernel().training_kernel()
    k = LinearKernel(0.5, 2.0).set_training_vectors(DATASET)
    # diag and self_kernel agree with the full matrix
    assert np.allclose(np.diag(k.training_kernel()), k.training_kernel_diag())
    assert np.allclose(k.self_kernel(DATASET), k.training_kernel_diag())
    # cross kernel against itself equals the training kernel
    assert np.allclose(k.cross_kernel(DATASET), k.training_kernel())
    # composes through the DSL: trend + smooth residual
    combo = (LinearKernel() + Scalar(1.0) * RBFKernel(1.0)).set_training_vectors(
        DATASET
    )
    assert combo.n_hyperparameters == 4  # (sigma_b, sigma_v) + (scale, sigma)
    K, dK = combo.training_kernel_and_derivative()
    assert K.shape == (3, 3) and dK.shape == (4, 3, 3)


def test_linear_gpr_learns_linear_trend(spark):
    """A pure linear target: the LinearKernel GP must recover it essentially
    exactly (Bayesian linear regression as a GP)."""
    import pyspark.sql.functions as F

    from spark_gp_spark import GaussianProcessRegression, LinearKernel

    df = (
        spark.range(2000)
        .withColumn("x1", F.rand(41) * 4.0 - 2.0)
        .withColumn("x2", F.rand(43) * 4.0 - 2.0)
        .select(
            (1.5 * F.col("x1") - 0.5 * F.col("x2") + 0.25).alias("label"),
            F.array("x1", "x2").alias("features"),
        )
    )
    gp = (
        GaussianProcessRegression()
        .setKernel(lambda: LinearKernel(1.0, 1.0))
        .setDatasetSizeForExpert(100)
        .setActiveSetSize(100)
        .setActiveSetProvider("random")
        .setSeed(19)
        .setSigma2(1e-3)
        .setMaxIter(15)
    )
    pred = gp.fit(df).transform(df)
    rmse = pred.select(
        F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)).alias("rmse")
    ).first().rmse
    assert rmse < 0.05, rmse
