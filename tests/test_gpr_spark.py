"""End-to-end GPR acceptance tests.

Layer-4 parity with the reference examples (SURVEY §5):
- Synthetics: 10-fold CV RMSE < 0.11 on sin(x) + N(0, 0.01)
  (regression/examples/Synthetics.scala:16-33)
- Airfoil: 10-fold CV RMSE < 2.1 on z-scaled UCI airfoil
  (regression/examples/Airfoil.scala:14-24)
Both thresholds are identical to the reference's asserts.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_gp_spark import (
    ARDRBFKernel,
    EyeKernel,
    GaussianProcessRegression,
    RBFKernel,
    Scalar,
    white_noise_kernel,
)

AIRFOIL_CSV = "/root/reference/data/airfoil.csv"


def synthetics_df(spark, n=2000, seed=13):
    """sin(x) + N(0, 0.01) over linspace(0,1,n), generated as column
    expressions — no driver materialization (Synthetics.scala:16-23)."""
    return (
        spark.range(n)
        .withColumn("x", F.col("id") / (n - 1))
        .withColumn("label", F.sin(F.col("x")) + F.randn(seed) * 0.1)
        .withColumn("features", F.array(F.col("x")))
        .select("label", "features")
    )


def synthetics_estimator():
    return (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(0.1, 1e-6, 10) + white_noise_kernel(0.5, 0, 1))
        .setDatasetSizeForExpert(100)
        .setActiveSetProvider("kmeans")
        .setActiveSetSize(100)
        .setSeed(13)
        .setSigma2(1e-3)
    )


def test_synthetics_cv_rmse(spark):
    """The reference's flagship acceptance query, via pyspark.ml
    CrossValidator (GPExample.scala:17-27): 10-fold CV RMSE < 0.11."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    cv = CrossValidator(
        estimator=synthetics_estimator(),
        evaluator=RegressionEvaluator(),
        estimatorParamMaps=ParamGridBuilder().build(),
        numFolds=10,
        seed=13,
    )
    rmse = cv.fit(synthetics_df(spark)).avgMetrics[0]
    assert rmse < 0.11, f"CV RMSE {rmse} >= 0.11"


def test_distributed_path_roundrobin(spark):
    """Force the fully distributed execution (no driver-local shortcut) and
    the reference's round-robin expert assignment."""
    gp = (
        synthetics_estimator()
        .setDriverLocalRows(0)
        .setExpertPartitioning("roundrobin")
        .setActiveSetProvider("random")
        .setMaxIter(20)
    )
    df = synthetics_df(spark, n=500)
    model = gp.fit(df)
    pred = model.transform(df)
    rmse = pred.select(F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2))).first()[0]
    assert rmse < 0.2


def test_variance_column_and_save_load(spark, tmp_path):
    gp = synthetics_estimator().setMaxIter(10).setVarianceCol("variance")
    df = synthetics_df(spark, n=400)
    model = gp.fit(df)
    row = model.transform(df).select("prediction", "variance").first()
    assert row["variance"] > 0

    path = str(tmp_path / "gpr_model")
    model.save_model(path, spark)
    from spark_gp_spark.regression import GaussianProcessRegressionModel

    loaded = GaussianProcessRegressionModel.load_model(path, spark)
    loaded._set(featuresCol="features", predictionCol="prediction")
    p1 = model.transform(df).select("prediction").limit(5).collect()
    p2 = loaded.transform(df).select("prediction").limit(5).collect()
    assert [r[0] for r in p1] == pytest.approx([r[0] for r in p2])


def test_greedy_active_set_provider(spark):
    gp = (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(0.3, 1e-6, 10))
        .setDatasetSizeForExpert(50)
        .setActiveSetProvider("greedy")
        .setActiveSetSize(10)
        .setSeed(13)
        .setSigma2(1e-2)
        .setMaxIter(10)
    )
    df = synthetics_df(spark, n=200)
    model = gp.fit(df)
    assert model.raw_predictor.magic_vector.shape == (10,)
    rmse = (
        model.transform(df)
        .select(F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)))
        .first()[0]
    )
    assert rmse < 0.3


@pytest.mark.skipif(not os.path.exists(AIRFOIL_CSV), reason="airfoil data not present")
def test_airfoil_cv_rmse(spark):
    """UCI airfoil, z-scaled features, ARD kernel + constant unit noise:
    10-fold CV RMSE < 2.1 (Airfoil.scala:14-24)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from spark_gp_spark.scaling import scale_features

    raw = spark.read.csv(AIRFOIL_CSV)
    df = raw.select(
        F.array(*[F.col(f"_c{i}").cast("double") for i in range(5)]).alias("features"),
        F.col("_c5").cast("double").alias("label"),
    )
    df = scale_features(df, "features")

    gp = (
        GaussianProcessRegression()
        .setDatasetSizeForExpert(100)
        .setActiveSetSize(1000)
        .setSigma2(1e-4)
        .setSeed(13)
        # The log-space L-BFGS-B converges in far fewer iterations than the
        # reference's linear-space breeze run; mild early stopping (15 iters,
        # single start) regularizes the BCM likelihood's overfit-prone
        # large-amplitude basin (amp≈5e3 at convergence).  Threshold is the
        # reference's own assert, unchanged.
        .setMaxIter(15)
        .setMultiStart(1)
        .setKernel(lambda: Scalar(1.0) * ARDRBFKernel(5) + Scalar(1.0).const * EyeKernel())
    )
    cv = CrossValidator(
        estimator=gp,
        evaluator=RegressionEvaluator(),
        estimatorParamMaps=ParamGridBuilder().build(),
        numFolds=10,
        seed=13,
    )
    rmse = cv.fit(df).avgMetrics[0]
    assert rmse < 2.1, f"CV RMSE {rmse} >= 2.1"


def test_numexperts_zero_edge(spark):
    """N=40 with datasetSizeForExpert=100: the reference divides by zero
    (GaussianProcessCommons.scala:27-29); we clamp to one expert (FIXTURES F8)."""
    gp = synthetics_estimator().setMaxIter(5).setActiveSetSize(10).setActiveSetProvider("random")
    df = synthetics_df(spark, n=40)
    model = gp.fit(df)
    assert model.transform(df).count() == 40


def test_greedy_batch_provider_rmse_parity(spark):
    """The batched greedy selector (B=8) must cut selection rounds ~8x and
    keep RMSE at parity with one-per-round greedy on the same data/config
    (the documented approximation trade, active_set.py:greedy_active_set)."""
    from spark_gp_spark.active_set import greedy_active_set

    df = synthetics_df(spark, n=300)

    def fit(provider):
        gp = (
            GaussianProcessRegression()
            .setKernel(lambda: Scalar(1.0) * RBFKernel(0.3, 1e-6, 10))
            .setDatasetSizeForExpert(50)
            .setActiveSetProvider(provider)
            .setActiveSetSize(17)
            .setSeed(13)
            .setSigma2(1e-2)
            .setMaxIter(10)
        )
        model = gp.fit(df)
        rounds = greedy_active_set.last_rounds
        rmse = (
            model.transform(df)
            .select(F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)))
            .first()[0]
        )
        return model, rounds, rmse

    m_g, rounds_g, rmse_g = fit("greedy")
    m_b, rounds_b, rmse_b = fit("greedy_batch")
    assert m_b.raw_predictor.magic_vector.shape == (17,)
    assert rounds_g == 16            # one per added point
    assert rounds_b == 2             # ceil(16 / 8)
    assert rmse_b < 0.3
    assert rmse_b <= rmse_g * 1.5 + 1e-6, (rmse_b, rmse_g)


def test_greedy_batch_survives_duplicate_rows(spark):
    """Exact-duplicate feature rows (a pre-dedup corpus) must not crash the
    batched selector: two bitwise-identical candidates share one finite
    Seeger delta, and appending both would make the next round's Kmm
    exactly singular (RBF diag carries no jitter).  The selector keeps one
    copy per distinct row, so the fit completes and the active set holds
    distinct points only."""
    base = synthetics_df(spark, n=120)
    df = base.union(base)  # every row appears exactly twice
    gp = (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(0.3, 1e-6, 10))
        .setDatasetSizeForExpert(60)
        .setActiveSetProvider("greedy_batch")
        .setActiveSetSize(12)
        .setSeed(13)
        .setSigma2(1e-2)
        .setMaxIter(5)
    )
    model = gp.fit(df)
    act = model.raw_predictor.kernel.get_training_vectors()
    assert len({r.tobytes() for r in act}) == len(act)  # all distinct
    rmse = (
        model.transform(base)
        .select(F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)))
        .first()[0]
    )
    assert rmse < 0.3


def test_plain_greedy_survives_duplicate_rows(spark):
    """Same screen on the one-per-round path: in floating point a twin of
    an active row can score a finite delta ~ 0 (not NaN) and win a round
    when every fresh candidate has negative gain."""
    base = synthetics_df(spark, n=60)
    df = base.union(base)
    gp = (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(0.3, 1e-6, 10))
        .setDatasetSizeForExpert(40)
        .setActiveSetProvider("greedy")
        .setActiveSetSize(6)
        .setSeed(13)
        .setSigma2(1e-2)
        .setMaxIter(5)
    )
    model = gp.fit(df)
    act = model.raw_predictor.kernel.get_training_vectors()
    assert len({r.tobytes() for r in act}) == len(act)


def test_variance_column_is_calibrated(spark):
    """The variance column (the rebuild's addition — the reference discards
    it, GaussianProcessCommons.scala:118-126) must be CALIBRATED, not just
    positive: on held-out synthetics the 95% interval
    |label − mean| ≤ 1.96·√variance should cover ≈ 0.95 of labels
    (measured 0.942 on this fixture), and the trainable white-noise
    component should have LEARNED the generating σ² = 0.01 (median
    predictive variance lands within 2× of it).  Gates are deliberately
    loose around the measured values — this catches a garbage variance
    path (unscaled, latent-only, or sign errors), not BCM approximation
    error."""
    import math
    import statistics

    df = synthetics_df(spark)
    train, test = df.randomSplit([0.7, 0.3], seed=7)
    model = (
        synthetics_estimator().setMaxIter(20).setVarianceCol("variance").fit(train)
    )
    rows = model.transform(test).select("label", "prediction", "variance").collect()
    coverage = sum(
        1
        for r in rows
        if abs(r.label - r.prediction) <= 1.96 * math.sqrt(r.variance)
    ) / len(rows)
    assert 0.88 <= coverage <= 0.99, coverage
    med_var = statistics.median(r.variance for r in rows)
    assert 0.005 <= med_var <= 0.02, med_var
