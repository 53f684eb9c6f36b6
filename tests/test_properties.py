"""Property-based tests (hypothesis) for the numeric core — no Spark session,
so these run fast and explore the input space the example-based tests pin.

Properties:
- every kernel's training matrix is PSD (+ jitter) for arbitrary data and
  hyperparameters in bounds — the contract the Cholesky-based GP math relies on;
- the self-contained L-BFGS-B finds the box-projected optimum of random
  convex quadratics — the optimizer correctness property;
- the Laplace mode is start-point independent (warm == cold) — the warm-start
  soundness property.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_gp_spark.gp_math import gpc_laplace
from spark_gp_spark.kernel import (
    MaternKernel,
    PeriodicKernel,
    RationalQuadraticKernel,
    RBFKernel,
    Scalar,
)
from spark_gp_spark.util.lbfgsb import minimize_lbfgsb

_hyper = st.floats(min_value=0.05, max_value=5.0)


def _dataset(seed: int, n: int, d: int) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(n, d))


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(3, 25),
    d=st.integers(1, 4),
    h1=_hyper,
    h2=_hyper,
    kind=st.sampled_from(["rbf", "matern15", "matern25", "periodic", "rq"]),
)
def test_kernel_matrices_are_psd(seed, n, d, h1, h2, kind):
    X = _dataset(seed, n, d)
    k = {
        "rbf": lambda: RBFKernel(h1),
        "matern15": lambda: MaternKernel(h1, 1.5),
        "matern25": lambda: MaternKernel(h1, 2.5),
        "periodic": lambda: PeriodicKernel(h1, h2),
        "rq": lambda: RationalQuadraticKernel(h1, h2),
    }[kind]()
    k.set_training_vectors(X)
    K = k.training_kernel()
    assert K.shape == (n, n)
    assert np.allclose(K, K.T, atol=1e-12)
    # PSD up to jitter: Cholesky of K + 1e-8 I must succeed
    np.linalg.cholesky(K + 1e-8 * np.eye(n))
    # diag contract: unit variance for all stationary kernels here
    assert np.allclose(np.diag(K), k.training_kernel_diag(), atol=1e-12)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    p=st.integers(1, 5),
)
def test_lbfgsb_solves_box_constrained_quadratics(seed, p):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(p, p))
    H = A @ A.T + np.eye(p)  # SPD Hessian
    target = rng.normal(size=p, scale=2.0)
    lower, upper = -np.ones(p), np.ones(p)

    def fun(x):
        g = H @ (x - target)
        return 0.5 * float((x - target) @ g), g

    x = minimize_lbfgsb(fun, np.zeros(p), lower, upper, max_iter=200, tol=1e-10)
    # KKT: the projected gradient at the solution vanishes
    g = H @ (x - target)
    pg = x - np.clip(x - g, lower, upper)
    assert float(np.max(np.abs(pg))) < 1e-5


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(5, 30))
def test_laplace_mode_is_start_point_independent(seed, n):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 2))
    y = (rng.random(n) > 0.5).astype(np.float64)
    x0 = np.array([1.0, 0.7])

    def make():
        return (Scalar(1.0) * RBFKernel(1.0)).set_hyperparameters(x0)

    nll_c, g_c, f_c, _ = gpc_laplace(y, X, make(), x0, tol=1e-12)
    warm_start = rng.normal(size=n)  # arbitrary (not even a converged mode)
    nll_w, g_w, f_w, _ = gpc_laplace(y, X, make(), x0, tol=1e-12, f0=warm_start)
    assert nll_w == pytest.approx(nll_c, rel=1e-6, abs=1e-8)
    assert np.allclose(f_w, f_c, atol=1e-5)


@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(1, 120),
    n_bins=st.integers(1, 12),
    buckets=st.integers(2, 7),
    seed=st.integers(0, 10_000),
)
def test_exact_ntile_matches_sql_ntile(spark, n, n_bins, buckets, seed):
    """exact_ntile's distributed rank→bin arithmetic must be bit-identical
    to Spark's own ntile over an unpartitioned window for ANY (n, n_bins,
    bucket count) — including n < n_bins (empty tail bins), n not
    divisible by n_bins (the first n%n_bins bins take one extra row), and
    more range-buckets than rows."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_gp_spark.operators.text import exact_ntile

    rng = random.Random(seed)
    keys = rng.sample(range(100_000), n)
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(3)
    got = {
        (r.k, r.b)
        for r in exact_ntile(df, n_bins, ["k"], out_col="b", buckets=buckets)
        .select("k", F.col("b").cast("long").alias("b"))
        .collect()
    }
    want = {
        (r.k, r.b)
        for r in df.select(
            "k",
            F.ntile(n_bins).over(Window.orderBy("k")).cast("long").alias("b"),
        ).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 200),
    buckets=st.integers(2, 7),
    seed=st.integers(0, 10_000),
)
def test_exact_quantiles_match_rank_definition(spark, n, buckets, seed):
    """exact_quantiles must return the value at global rank ceil(p·N) under
    (value, id) order for every prob — duplicates in the VALUE column
    included (the id tiebreak makes the rank total)."""
    import math
    import random

    from spark_gp_spark.operators.dq import exact_quantiles

    rng = random.Random(seed)
    rows = [(rng.randint(0, 20) * 1.0, i) for i in range(n)]
    df = spark.createDataFrame(rows, "v double, id long").repartition(3)
    out = {
        r.prob: (r.rank, r.n_rows, r.value)
        for r in exact_quantiles(df, "v", ["id"], buckets=buckets).collect()
    }
    ordered = sorted(rows)
    for p in (0.25, 0.5, 0.75):
        rank = math.ceil(p * n)
        assert out[p] == (rank, n, round(ordered[rank - 1][0], 6)), (p, n)


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000), parts=st.integers(1, 7))
def test_reconciliation_is_partition_invariant_and_total(spark, seed, parts):
    """reconciliation_report's integer micro-unit arithmetic makes the
    relation a pure function of the DATA: for random headers/details the
    output is identical under any repartitioning (the double-sum
    alternative would not be), the four classes partition n_rows exactly,
    and every class matches a pure-python integer recomputation."""
    import random
    from collections import defaultdict

    from pyspark.sql import functions as F

    from spark_gp_spark.operators.dq import reconciliation_report

    rng = random.Random(seed)
    orders, details = [], []
    expected = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, miss, t, l, b
    for k in range(40):
        total_c = rng.randint(100, 2_000_00)  # cents
        grp = rng.choice("XY")
        orders.append((k, total_c / 100.0, grp))
        n_li = rng.randint(0, 3)
        recomputed_micro = 0
        for _ in range(n_li):
            ep_c = rng.randint(1, 1_000_00)
            disc = rng.randint(0, 10)
            tax = rng.randint(0, 10)
            details.append((k, ep_c / 100.0, disc / 100.0, tax / 100.0))
            recomputed_micro += ep_c * (100 - disc) * (100 + tax)
        e = expected[grp]
        e[0] += 1
        if n_li == 0:
            e[1] += 1
        else:
            rel = abs(total_c * 10_000 - recomputed_micro) / (total_c * 10_000)
            if rel <= 0.01:
                e[2] += 1
            elif rel <= 0.25:
                e[3] += 1
            else:
                e[4] += 1
    o_df = spark.createDataFrame(
        orders, "o_orderkey bigint, o_totalprice double, o_orderpriority string"
    ).repartition(parts)
    li_df = spark.createDataFrame(
        details or [(None, None, None, None)],
        "l_orderkey bigint, l_extendedprice double, l_discount double,"
        " l_tax double",
    ).repartition(parts)
    if not details:
        li_df = li_df.filter(F.col("l_orderkey").isNotNull())
    child_units = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
        * (100 + F.round(F.col("l_tax") * 100, 0).cast("long"))
    )
    total_units = F.round(F.col("o_totalprice") * 1000000, 0).cast("long")
    rows = reconciliation_report(
        o_df, li_df,
        parent_key="o_orderkey", child_key="l_orderkey",
        total_units=total_units, child_units=child_units,
        group_col="o_orderpriority",
    ).collect()
    assert {r["o_orderpriority"] for r in rows} == set(expected)
    for r in rows:
        e = expected[r["o_orderpriority"]]
        got = [r["n_rows"], r["n_missing"], r["n_within_tight"],
               r["n_within_loose"], r["n_beyond"]]
        assert got == e
        assert r["n_missing"] + r["n_within_tight"] + r["n_within_loose"] \
            + r["n_beyond"] == r["n_rows"]


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_benford_report_is_a_distribution_over_in_scope_rows(spark, seed):
    """For random positive amounts: the 9 spine rows always appear,
    n_rows sums to the count of in-scope (>= 1) amounts, obs_share sums
    to 1 (when any row is in scope), and the flag equals the threshold
    predicate applied to the UNROUNDED deviation."""
    import random

    from spark_gp_spark.operators.dq import benford_first_digit_report

    rng = random.Random(seed)
    amounts = [round(rng.uniform(0.0, 10_000.0), 2) for _ in range(80)]
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    rows = benford_first_digit_report(df, "amt").collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    in_scope = [a for a in amounts if a >= 1]
    assert sum(r["n_rows"] for r in rows) == len(in_scope)
    if in_scope:
        shares = sum(r["n_rows"] / len(in_scope) for r in rows)
        assert abs(shares - 1.0) < 1e-9
    for r in rows:
        obs = r["n_rows"] / max(len(in_scope), 1)
        assert r["flagged"] == (1 if abs(obs - r["exp_share"]) > 0.04 else 0)


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000), parts=st.integers(1, 6))
def test_split_balance_is_a_partition_of_shares(spark, seed, parts):
    """For random assignments under any repartitioning: the spine covers
    every observed (split, stratum) cross, within-split shares sum to 1
    per split, per-cell counts reproduce a pure-python recount (zero
    cells included), and the flag equals the unrounded-gap predicate."""
    import random
    from collections import Counter

    from spark_gp_spark.operators.prep import split_balance_report

    rng = random.Random(seed)
    splits = ["train", "val", "test"][: rng.randint(2, 3)]
    strata = ["a", "b", "c", "d"][: rng.randint(2, 4)]
    rows = [
        (rng.choice(splits), rng.choice(strata)) for _ in range(rng.randint(20, 120))
    ]
    df = spark.createDataFrame(rows, "split string, lang string").repartition(parts)
    out = split_balance_report(df).collect()
    seen_splits = {s for s, _ in rows}
    seen_strata = {l for _, l in rows}
    assert {(r["split"], r["lang"]) for r in out} == {
        (s, l) for s in seen_splits for l in seen_strata
    }
    counts = Counter(rows)
    total = len(rows)
    strat_tot = Counter(l for _, l in rows)
    split_tot = Counter(s for s, _ in rows)
    for r in out:
        n = counts.get((r["split"], r["lang"]), 0)
        assert r["n_docs"] == n
        gap = n / split_tot[r["split"]] - strat_tot[r["lang"]] / total
        assert r["flagged"] == (1 if abs(gap) > 0.02 else 0)
    for s in seen_splits:
        shares = sum(r["split_share"] for r in out if r["split"] == s)
        assert abs(shares - 1.0) < 1e-4  # rounded-to-6 cells summed
