"""Tree-reduction tests: executor-side merge rounds must change only WHERE
partials are summed, never the result (up to float associativity)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_gp_spark.experts import DistributedExperts, build_expert_frame


def _points(spark, n=2000, parts=64):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            (F.col("id") % 7).cast("double").alias("label"),
            F.array((F.col("id") % 13).cast("double"), F.lit(1.0)).alias("features"),
        )
    )


def test_tree_merge_matches_flat_sum(spark):
    points = _points(spark)
    frame = build_expert_frame(points, 50, "chunk")

    def fn(y, X):
        return np.array([y.sum(), float(len(y)), X.sum()])

    flat = DistributedExperts(frame, aggregation_depth=2)
    tree = DistributedExperts(frame, aggregation_depth=4)
    try:
        a = flat.sum_over_experts(fn, 3)
        b = tree.sum_over_experts(fn, 3)
    finally:
        flat.unpersist()
        tree.unpersist()
    assert np.allclose(a, b, rtol=1e-12)
    assert a[1] == 2000.0  # every row reduced exactly once


def test_tree_merge_reduces_driver_rows(spark):
    """depth 3 over 64 partitions must hand the driver ~sqrt(64) rows."""
    points = _points(spark)
    frame = build_expert_frame(points, 50, "chunk")
    ex = DistributedExperts(frame, aggregation_depth=3)
    try:
        partials = ex.frame.mapInPandas(
            lambda it: iter(
                [__import__("pandas").DataFrame({"part": [np.zeros(2)]}) for _ in it]
            ),
            schema="part array<double>",
        )
        merged = ex._tree_merge(partials, 2)
        n_rows = merged.count()
        assert n_rows <= max(16, int(np.ceil(np.sqrt(ex._n_parts))) + 1)
        assert ex._n_parts >= 32  # the premise: many input partitions
    finally:
        ex.unpersist()


def test_distributed_state_roundtrip(spark):
    """update_states writes per-expert latent state that subsequent stateful
    reductions and updates read back — the GPC warm-start contract."""
    points = _points(spark)
    frame = build_expert_frame(points, 50, "chunk")
    ex = DistributedExperts(frame, aggregation_depth=2)
    try:
        # before any update the state is None
        n_none = ex.sum_over_experts_stateful(
            lambda y, X, st: np.array([1.0 if st is None else 0.0]), 1
        )
        ex.update_states(lambda y, X, st: y * 2.0)
        total = ex.sum_over_experts_stateful(lambda y, X, st: np.array([st.sum()]), 1)
        ex.update_states(lambda y, X, st: st + 1.0)  # reads the previous state
        total2 = ex.sum_over_experts_stateful(lambda y, X, st: np.array([st.sum()]), 1)
    finally:
        ex.unpersist()
    assert n_none[0] > 0
    assert total[0] == 2.0 * sum(i % 7 for i in range(2000))
    assert total2[0] == total[0] + 2000.0


def test_distributed_fit_with_tree_depth(spark):
    """End-to-end: a distributed GPR fit at aggregationDepth=3 still learns."""
    from spark_gp_spark import GaussianProcessRegression, RBFKernel, Scalar

    df = (
        spark.range(2000)
        .select(
            (F.rand(5) * 2.0 - 1.0).alias("x1"),
            (F.rand(7) * 2.0 - 1.0).alias("x2"),
        )
        .select(
            F.array("x1", "x2").alias("features"),
            (F.sin(F.col("x1") * 3) + F.col("x2")).alias("label"),
        )
    )
    gp = (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(1.0, 1e-6, 10))
        .setDatasetSizeForExpert(100)
        .setActiveSetSize(100)
        .setSeed(11)
        .setSigma2(1e-3)
        .setMaxIter(15)
        .setMultiStart(1)
        .setDriverLocalRows(0)  # force the distributed reduction path
        .setAggregationDepth(3)
    )
    model = gp.fit(df)
    pred = model.transform(df).select("label", "prediction").toPandas()
    rmse = float(np.sqrt(((pred["label"] - pred["prediction"]) ** 2).mean()))
    assert rmse < 0.2, rmse
