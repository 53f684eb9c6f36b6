"""pyspark.ml-native persistence round-trips (VERDICT item 5): estimator and
model save/load, and the composition that matters —
``CrossValidator(...).fit(...).save(path)`` + ``CrossValidatorModel.load``.
The reference has no persistence at all (SURVEY §2.1 sinks); pyspark.ml
interop makes it mandatory here."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_gp_spark import GaussianProcessRegression, RBFKernel, Scalar
from spark_gp_spark.regression import GaussianProcessRegressionModel


@pytest.fixture(scope="module")
def sin_df(spark):
    return (
        spark.range(600)
        .select((F.rand(3) * 6.0 - 3.0).alias("x"))
        .select(
            F.array("x").alias("features"),
            (F.sin(F.col("x")) + F.randn(5) * 0.05).alias("label"),
        )
        .cache()
    )


def _gpr() -> GaussianProcessRegression:
    return (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(1.0, 1e-6, 10))
        .setDatasetSizeForExpert(100)
        .setActiveSetSize(50)
        .setSeed(7)
        .setSigma2(1e-3)
        .setMaxIter(10)
        .setMultiStart(1)
    )


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="gp_persist_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_model_save_load_roundtrip(spark, sin_df, tmpdir):
    model = _gpr().fit(sin_df)
    before = model.transform(sin_df).select("prediction").toPandas()["prediction"].to_numpy()
    model.save(f"{tmpdir}/model")
    loaded = GaussianProcessRegressionModel.load(f"{tmpdir}/model")
    after = loaded.transform(sin_df).select("prediction").toPandas()["prediction"].to_numpy()
    assert np.array_equal(before, after)
    # params survive too
    assert loaded.getOrDefault(loaded.activeSetSize) == 50
    assert loaded.uid == model.uid


def test_estimator_save_load_refits(spark, sin_df, tmpdir):
    est = _gpr()
    est.save(f"{tmpdir}/est")
    loaded = GaussianProcessRegression.load(f"{tmpdir}/est")
    assert loaded.getOrDefault(loaded.maxIter) == 10
    # the pickled kernel factory must come back callable and equivalent
    k = loaded.getOrDefault(loaded.kernel)()
    assert k.get_hyperparameters().shape == (2,)
    model = loaded.fit(sin_df)
    pred = model.transform(sin_df).select("label", "prediction").toPandas()
    rmse = float(np.sqrt(((pred["label"] - pred["prediction"]) ** 2).mean()))
    assert rmse < 0.2


def test_crossvalidator_model_save_load(spark, sin_df, tmpdir):
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, CrossValidatorModel, ParamGridBuilder

    est = _gpr().setMaxIter(5)
    grid = ParamGridBuilder().addGrid(est.sigma2, [1e-3, 1e-2]).build()
    cv = CrossValidator(
        estimator=est,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(metricName="rmse"),
        numFolds=2,
        seed=3,
    )
    cv_model = cv.fit(sin_df)
    before = cv_model.transform(sin_df).select("prediction").toPandas()["prediction"].to_numpy()
    cv_model.save(f"{tmpdir}/cv")
    loaded = CrossValidatorModel.load(f"{tmpdir}/cv")
    after = loaded.transform(sin_df).select("prediction").toPandas()["prediction"].to_numpy()
    assert np.array_equal(before, after)
