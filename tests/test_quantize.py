"""Scalar quantization: code range, reconstruction bound, constant dims."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_gp_spark.operators.quantize import dim_min_max, scalar_quantize


def test_scalar_quantize_codes_and_error_bound(spark):
    rows = [
        (1, [0.0, 10.0, 5.0]),
        (2, [1.0, 10.0, -5.0]),
        (3, [0.25, 10.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = scalar_quantize(df, levels=255, dim=3).collect()
    assert len(out) == 3
    mins, maxs = dim_min_max(df, "embedding", dim=3)
    assert mins == [0.0, 10.0, -5.0] and maxs == [1.0, 10.0, 5.0]
    by_id = {r.vec_id: r for r in out}
    for r in out:
        assert all(0 <= c <= 255 for c in r.qvec)
        # reconstruction error is at most half a quantization step per dim
        worst_step = max(
            (maxs[i] - mins[i]) / 255 for i in range(3)
        )
        assert r.max_abs_err <= worst_step / 2 + 1e-12
    # constant dimension (index 1) codes to 0 and reconstructs exactly
    assert all(by_id[i].qvec[1] == 0 for i in (1, 2, 3))
    # extremes hit the code range ends
    assert by_id[1].qvec[0] == 0 and by_id[2].qvec[0] == 255
    assert by_id[2].qvec[2] == 0 and by_id[1].qvec[2] == 255


def test_scalar_quantize_with_precomputed_stats_runs_one_job(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [2.0, 3.0])], "vec_id bigint, embedding array<double>"
    )
    # explicit stats → plan is a pure projection (no aggregate in the plan)
    out = scalar_quantize(df, levels=255, stats=([0.0, 1.0], [2.0, 3.0]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan and "Exchange" not in plan
    assert out.count() == 2


def test_scalar_quantize_error_bound_property(spark):
    """Hypothesis: for ANY corpus, per-dimension reconstruction error is at
    most half a quantization step — the floor(x+0.5) rounding contract."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.floats(-100, 100, allow_nan=False, width=64),
                min_size=3, max_size=3,
            ),
            min_size=2, max_size=12,
        )
    )
    def check(vecs):
        X = np.asarray(vecs, dtype=np.float64)
        df = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(len(X))],
            "vec_id bigint, embedding array<double>",
        )
        out = scalar_quantize(df, levels=255).collect()
        worst_step = max(
            (float(X[:, j].max()) - float(X[:, j].min())) / 255 for j in range(3)
        )
        for r in out:
            assert r.max_abs_err <= worst_step / 2 + 1e-9
            assert all(0 <= c <= 255 for c in r.qvec)

    check()
