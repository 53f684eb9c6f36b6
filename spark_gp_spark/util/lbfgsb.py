"""Box-constrained L-BFGS for the driver-side hyperparameter search.

The reference uses breeze's LBFGSB (GaussianProcessCommons.scala:82-91).  The
container ships no scipy, so this is a self-contained projected-L-BFGS:

- active-set masking: variables pinned at a bound with the gradient pushing
  outward are frozen for the iteration; the two-loop recursion runs on the
  free subspace (Nocedal & Wright ch. 7 + gradient-projection, ch. 18.6),
- projected-arc Armijo backtracking line search, Barzilai-Borwein initial
  step when curvature history exists,
- degenerate steps (the projected step barely moves while the projected
  gradient is still large — the classic failure right after a step is
  truncated by the box) reset the curvature history and retry with steepest
  descent instead of being mistaken for convergence.

Dimensions here are tiny (a handful of kernel hyperparameters) but each
objective evaluation is a Spark job, so the memoized caller keeps evaluation
counts low.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np


def _project(x: np.ndarray, lower: np.ndarray, upper: np.ndarray) -> np.ndarray:
    return np.minimum(np.maximum(x, lower), upper)


def _free_mask(x, g, lower, upper, eps=1e-12) -> np.ndarray:
    """False for variables pinned at a bound with the gradient pointing
    further outside the box."""
    at_lo = (x <= lower + eps) & (g > 0)
    at_hi = (x >= upper - eps) & (g < 0)
    return ~(at_lo | at_hi)


def _two_loop(g_masked: np.ndarray, s_hist, y_hist) -> np.ndarray:
    """d = -H·g via two-loop recursion over the stored curvature pairs."""
    q = g_masked.copy()
    alphas = []
    for s, y in zip(reversed(s_hist), reversed(y_hist)):
        rho = 1.0 / float(y @ s)
        a = rho * float(s @ q)
        alphas.append((a, rho, s, y))
        q -= a * y
    if y_hist:
        s_last, y_last = s_hist[-1], y_hist[-1]
        q *= float(s_last @ y_last) / float(y_last @ y_last)
    for a, rho, s, y in reversed(alphas):
        b = rho * float(y @ q)
        q += (a - b) * s
    return -q


#: candidates evaluated per batched line-search call — covers the typical
#: Armijo backtrack in ONE distributed objective evaluation.
_LS_BATCH = 4


def minimize_lbfgsb(
    fun: Callable[[np.ndarray], tuple[float, np.ndarray]],
    x0: np.ndarray,
    lower: np.ndarray,
    upper: np.ndarray,
    max_iter: int = 100,
    tol: float = 1e-6,
    memory: int = 10,
    max_ls: int = 30,
    fun_batch: "Callable[[list[np.ndarray]], list[tuple[float, np.ndarray]]] | None" = None,
    on_accept: "Callable[[np.ndarray], None] | None" = None,
) -> np.ndarray:
    """Minimize ``fun`` (returning (value, gradient)) subject to
    ``lower <= x <= upper``.  Returns the best x found.

    ``fun_batch``, when given, evaluates several points in ONE call; the line
    search then submits its whole backtracking ladder (and its expansion
    probes) speculatively in batches of ``_LS_BATCH``, which collapses the
    per-candidate distributed jobs into one job per ladder.  Accept/reject
    decisions are made in the same order as the sequential scan, so the
    iterate sequence — and the result — is unchanged; extra speculative
    evaluations are pure overlap, memoized internally so they are never
    re-evaluated (no caller-side memoization contract required).

    ``on_accept(x)`` fires once per accepted iterate — the hook stateful
    objectives (the GPC's per-expert Laplace warm start) use to refresh
    their carried state at the new point.
    """
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    if fun_batch is None:
        def fun_batch(xs):
            return [fun(x) for x in xs]
    # Self-contained memo of every point ever evaluated: speculation (the
    # line search rides expansion doublings along in the same batch and
    # discards their results) re-reads them from here for free, so it never
    # depends on the CALLER memoizing — a non-memoized fun_batch would
    # otherwise evaluate each speculated point twice.  The expansion loop
    # also probes membership to consume speculated doublings one cached
    # prefix at a time.  Memory: a handful of (f, g) pairs per iteration
    # over tiny hyperparameter vectors.
    evaluated: dict[bytes, tuple[float, np.ndarray]] = {}
    raw_fun_batch = fun_batch

    def fun_batch(xs):  # noqa: F811 — deliberate wrap
        keys = [np.asarray(c, dtype=np.float64).tobytes() for c in xs]
        fresh: dict[bytes, np.ndarray] = {}
        for key, c in zip(keys, xs):
            if key not in evaluated and key not in fresh:
                fresh[key] = c
        if fresh:
            for key, res in zip(fresh, raw_fun_batch(list(fresh.values()))):
                evaluated[key] = res
        return [evaluated[key] for key in keys]

    x = _project(np.asarray(x0, dtype=np.float64).copy(), lower, upper)
    f, g = fun(x)
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    best_x, best_f = x.copy(), f
    degenerate_streak = 0

    for _ in range(max_iter):
        pg = x - _project(x - g, lower, upper)
        pg_norm = float(np.max(np.abs(pg))) if len(pg) else 0.0
        if pg_norm < tol:
            break

        free = _free_mask(x, g, lower, upper)
        gm = np.where(free, g, 0.0)
        d = _two_loop(gm, s_hist, y_hist)
        d[~free] = 0.0
        if float(d @ g) >= 0.0 or not np.any(d):
            # Not a descent direction in the free subspace — steepest descent.
            s_hist.clear()
            y_hist.clear()
            d = -gm

        # Initial trial step: unit for quasi-Newton directions; for steepest
        # descent use a BB-like / inverse-gradient scale so a huge gradient
        # does not launch the iterate into the stratosphere.
        if s_hist:
            step = 1.0
        else:
            gmax = float(np.max(np.abs(d)))
            step = min(1.0, 1.0 / gmax) if gmax > 0 else 1.0

        # Projected-arc Armijo backtracking: the halving ladder is submitted
        # speculatively in batches (one distributed job per batch when
        # fun_batch is wired), scanned in sequential order so the accepted
        # candidate — and the whole iterate sequence — matches the
        # one-at-a-time algorithm exactly.
        x_new = f_new = g_new = None
        dx_acc = None
        c1 = 1e-4
        tried = 0
        exhausted = False  # projection collapsed — no further move possible
        while tried < max_ls and x_new is None and not exhausted:
            steps, cands, dxs = [], [], []
            s = step
            while len(cands) < min(_LS_BATCH, max_ls - tried):
                cand = _project(x + s * d, lower, upper)
                dx = cand - x
                if float(np.max(np.abs(dx))) == 0.0:
                    exhausted = True
                    break
                steps.append(s)
                cands.append(cand)
                dxs.append(dx)
                s *= 0.5
            if not cands:
                break
            # Speculative expansion: on the FIRST backtracking round, ride
            # the doubled and quadrupled steps along in the same batch.  The
            # common accept-at-first-try iteration previously paid a second
            # distributed job just to have its expansion probe rejected;
            # with the doublings pre-evaluated (and memoized), that decision
            # is free.  Results beyond the ladder are dropped here — the
            # expansion loop below reads them from the cache.
            spec: list[np.ndarray] = []
            if tried == 0:
                s_up, prev_up = steps[0], dxs[0]
                for _ in range(2):
                    s_up *= 2.0
                    cand_up = _project(x + s_up * d, lower, upper)
                    dx_up = cand_up - x
                    if float(np.max(np.abs(dx_up - prev_up))) == 0.0:
                        break
                    spec.append(cand_up)
                    prev_up = dx_up
            results = fun_batch(cands + spec)[: len(cands)]
            tried += len(cands)
            for s_i, cand, dx, (fc, gc) in zip(steps, cands, dxs, results):
                gdx = float(g @ dx)
                # Box projection can turn d into an ascent direction
                # (g·dx ≥ 0); the Armijo bound is then ABOVE f and would
                # accept an ascent step — require strict decrease instead.
                armijo_ok = fc <= f + c1 * gdx if gdx < 0.0 else fc < f
                if np.isfinite(fc) and armijo_ok:
                    step, dx_acc, x_new, f_new, g_new = s_i, dx, cand, fc, gc
                    break
            else:
                step = steps[-1] * 0.5
        if x_new is not None:
            # Greedy expansion: while the doubled step still satisfies
            # Armijo and keeps descending, take it (cheap way to cover
            # the many-orders-of-magnitude amplitude search the airfoil
            # fit needs without a full Wolfe bracket).  Probes are batched
            # three-ahead; decisions stop at the first rejection, so the
            # accepted sequence equals the sequential doubling loop's.
            while True:
                # Build the next probe round: a run of already-evaluated
                # (speculated) doublings forms a cached prefix that decides
                # with NO distributed job; the first unevaluated probe opens
                # a classic 3-ahead batch instead.
                probes = []
                round_has_new = False
                s, prev_dx = step, dx_acc
                while len(probes) < 3:
                    s2 = s * 2.0
                    cand2 = _project(x + s2 * d, lower, upper)
                    dx2 = cand2 - x
                    if float(np.max(np.abs(dx2 - prev_dx))) == 0.0:
                        break
                    is_new = cand2.tobytes() not in evaluated  # dict of memoized (f, g)
                    if is_new and probes and not round_has_new:
                        break  # decide the cached prefix first
                    probes.append((s2, cand2, dx2))
                    round_has_new = round_has_new or is_new
                    s, prev_dx = s2, dx2
                if not probes:
                    break
                results = fun_batch([p[1] for p in probes])
                advanced_to_end = True
                for (s2, cand2, dx2), (fc2, gc2) in zip(probes, results):
                    gdelta = float(g @ (dx2 - dx_acc))
                    grow_ok = (
                        fc2 < f_new + c1 * gdelta if gdelta < 0.0 else fc2 < f_new
                    )
                    if np.isfinite(fc2) and grow_ok:
                        step, dx_acc, x_new, f_new, g_new = s2, dx2, cand2, fc2, gc2
                    else:
                        advanced_to_end = False
                        break
                if not advanced_to_end:
                    break
        if x_new is None:
            # Could not move at all along d.
            if s_hist:
                s_hist.clear()
                y_hist.clear()
                continue
            break

        s_vec = x_new - x
        y_vec = g_new - g
        moved = float(np.max(np.abs(s_vec)))
        new_pg = x_new - _project(x_new - g_new, lower, upper)
        new_pg_norm = float(np.max(np.abs(new_pg))) if len(new_pg) else 0.0

        if float(s_vec @ y_vec) > 1e-10 * float(
            np.linalg.norm(s_vec) * np.linalg.norm(y_vec) + 1e-30
        ):
            s_hist.append(s_vec)
            y_hist.append(y_vec)
            if len(s_hist) > memory:
                s_hist.pop(0)
                y_hist.pop(0)

        f_delta = abs(f_new - f)
        x, f, g = _project(x_new, lower, upper), f_new, g_new
        if f < best_f:
            best_x, best_f = x.copy(), f
        if on_accept is not None:
            on_accept(x)

        tiny_step = moved < tol and f_delta < tol * max(1.0, abs(f))
        if tiny_step and new_pg_norm >= tol:
            # Degenerate: barely moved but far from stationary — the history
            # is poisoned (e.g. by a bound-truncated pair); reset and retry.
            s_hist.clear()
            y_hist.clear()
            degenerate_streak += 1
            if degenerate_streak >= 3:
                break
            continue
        degenerate_streak = 0
        if tiny_step:
            break

    return best_x
