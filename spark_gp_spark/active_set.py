"""Active-set (inducing point) providers for Projected Process Approximation.

Parity: ActiveSetProvider.scala —
- random (``:48-56``): exact-size uniform sample,
- k-means (``:26-43``): cluster centers as inducing points,
- greedy (``:63-139``): Seeger et al. 2003 "Fast Forward Selection" info-gain
  scoring, one point per round, scored distributedly across experts.

A provider is a callable ``(ActiveSetContext) -> np.ndarray (m, d)``.
Strings 'random' | 'kmeans' | 'greedy' resolve via ``resolve_provider``; any
user callable with the same signature plugs in (the reference's strategy
interface, ActiveSetProvider.scala:13-20).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame

from .experts import Experts, sample_feature_rows
from .gp_math import expert_gram
from .kernel import Kernel
from .util.linalg import assert_sym_positive_definite


@dataclass
class ActiveSetContext:
    points: DataFrame  # normalized (label, features) relation
    experts: Experts
    kernel_factory: object  # () -> Kernel, effective kernel (incl. sigma2 noise)
    optimal_hyperparameters: np.ndarray
    active_set_size: int
    seed: int


def random_active_set(ctx: ActiveSetContext) -> np.ndarray:
    return sample_feature_rows(ctx.points, ctx.active_set_size, ctx.seed)


def _local_kmeans(X: np.ndarray, k: int, seed: int, max_iter: int = 20) -> np.ndarray:
    """Driver-local Lloyd's algorithm with k-means++ seeding, for the small-
    data fast path (avoids ~10 s of Spark KMeans job overhead per fit)."""
    rng = np.random.default_rng(seed)
    n = len(X)
    k = min(k, n)
    centers = np.empty((k, X.shape[1]))
    centers[0] = X[rng.integers(n)]
    closest = np.full(n, np.inf)
    for i in range(1, k):
        d = np.einsum("ij,ij->i", X - centers[i - 1], X - centers[i - 1])
        np.minimum(closest, d, out=closest)
        total = closest.sum()
        if total <= 0:
            centers[i:] = X[rng.integers(n, size=k - i)]
            break
        centers[i] = X[np.searchsorted(np.cumsum(closest), rng.uniform() * total)]
    for _ in range(max_iter):
        d = (
            np.einsum("ij,ij->i", X, X)[:, None]
            - 2.0 * X @ centers.T
            + np.einsum("ij,ij->i", centers, centers)[None, :]
        )
        assign = np.argmin(d, axis=1)
        new_centers = centers.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                new_centers[c] = members.mean(axis=0)
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    return centers


def kmeans_active_set(ctx: ActiveSetContext, max_iter: int = 20) -> np.ndarray:
    """KMeansActiveSetProvider (ActiveSetProvider.scala:26-43): cluster
    centers of the training features.  Uses pyspark.ml KMeans on the
    distributed path; when the experts already live on the driver (small
    data), clusters locally instead — same semantics, zero Spark jobs."""
    from .experts import LocalExperts

    if isinstance(ctx.experts, LocalExperts):
        X = np.vstack([chunk_x for _, chunk_x in ctx.experts.chunks])
        return _local_kmeans(X, ctx.active_set_size, ctx.seed, max_iter)

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = ctx.points.select(array_to_vector("features").alias("features"))
    model = KMeans(k=ctx.active_set_size, seed=ctx.seed, maxIter=max_iter).fit(vecs)
    return np.asarray(model.clusterCenters(), dtype=np.float64)


def greedy_active_set(ctx: ActiveSetContext) -> np.ndarray:
    """GreedilyOptimizingActiveSetProvider (ActiveSetProvider.scala:63-139).

    Starts from one random point; each round scores every training point by
    the Seeger information-gain delta and appends the argmax.  Per round this
    costs one Gram reduction + one argmax reduction over the experts.
    """
    active = sample_feature_rows(ctx.points, 1, ctx.seed)
    x_opt = ctx.optimal_hyperparameters

    while len(active) < ctx.active_set_size:
        kern: Kernel = ctx.kernel_factory()
        kern.set_hyperparameters(x_opt).set_training_vectors(active)
        Kmm = kern.training_kernel()
        sigma2 = kern.white_noise_var
        m = len(active)
        Kinv = np.linalg.inv(Kmm)

        factory, act = ctx.kernel_factory, active

        def gram_fn(y, X, _factory=factory, _act=act, _x=x_opt, _m=m):
            k = _factory().set_hyperparameters(_x).set_training_vectors(X)
            g, v = expert_gram(y, X, k, _act)
            return np.concatenate([g.ravel(), v])

        flat = ctx.experts.sum_over_experts(gram_fn, m * m + m)
        KmnKnm = flat[: m * m].reshape(m, m)
        Kmny = flat[m * m :]

        pdm = sigma2 * Kmm + KmnKnm
        assert_sym_positive_definite(pdm)
        inv_pdm = np.linalg.inv(pdm)
        magic_vector = np.linalg.solve(pdm, Kmny)
        sigma = np.sqrt(sigma2)

        def delta_fn(y, X, _factory=factory, _act=act, _x=x_opt,
                     _Kinv=Kinv, _inv_pdm=inv_pdm, _mv=magic_vector,
                     _sigma=sigma, _sigma2=sigma2):
            k = _factory().set_hyperparameters(_x).set_training_vectors(X)
            cross = k.cross_kernel(_act)  # (m, n)
            diag = k.training_kernel_diag()
            with np.errstate(invalid="ignore", divide="ignore"):
                p = np.einsum("mi,mi->i", cross, _Kinv @ cross)
                q = np.einsum("mi,mi->i", cross, _inv_pdm @ cross)
                mu = _mv @ cross
                li = np.sqrt(diag - p)
                ratio2 = (_sigma / li) ** 2
                ksi = 1.0 / (ratio2 + 1.0 - q)
                kappa = ksi * (1.0 + 2.0 * ratio2)
                delta = -np.log(_sigma / li) - (
                    np.log(ksi) + ksi * (1.0 - kappa) / _sigma2 * (y - mu) ** 2 - kappa + 2.0
                ) / 2.0
            if np.all(np.isnan(delta)):
                return float("nan"), X[0]
            i = int(np.nanargmax(delta))
            return float(delta[i]), X[i]

        _, best_vec = ctx.experts.max_over_experts(delta_fn)
        active = np.vstack([active, best_vec])

    return active


_PROVIDERS = {
    "random": random_active_set,
    "kmeans": kmeans_active_set,
    "greedy": greedy_active_set,
}


def resolve_provider(spec):
    if callable(spec):
        return spec
    try:
        return _PROVIDERS[spec]
    except KeyError:
        raise ValueError(
            f"unknown active set provider {spec!r}; expected one of {sorted(_PROVIDERS)} or a callable"
        ) from None
