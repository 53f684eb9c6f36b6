"""TrainValidationSplit e2e on synthetic MNIST-shaped data.

The reference's MNIST example composes TrainValidationSplit with the GP
classifier (classification/examples/MNIST.scala:34-40) but its data file is
absent upstream (.MISSING_LARGE_BLOBS:1), so this reproduces the composition
verb on a synthetic stand-in: two well-separated 16-dimensional digit-like
clusters ("6" vs "8"), binary labels {0,1} — same shape as the mnist68 CSV
the reference reads (label-first, pixels after, MNIST.scala:22-26).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_gp_spark import GaussianProcessClassifier, RBFKernel, Scalar

DIM = 16


@pytest.fixture(scope="module")
def mnist_shaped(spark):
    rng = np.random.default_rng(68)
    centers = rng.normal(size=(2, DIM)) * 2.0
    rows = []
    for i in range(400):
        c = i % 2
        x = centers[c] + rng.normal(size=DIM) * 0.8
        rows.append((float(c), [float(v) for v in x]))
    return spark.createDataFrame(rows, "label double, features array<double>").cache()


def test_train_validation_split_with_gpc(spark, mnist_shaped):
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit

    gp = (
        GaussianProcessClassifier()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(2.0, 1e-6, 100))
        .setDatasetSizeForExpert(50)
        .setActiveSetSize(50)
        .setSeed(13)
        .setSigma2(1e-3)
        .setMaxIter(10)
        .setMultiStart(1)
    )
    grid = ParamGridBuilder().addGrid(gp.sigma2, [1e-3, 1e-2]).build()
    tvs = TrainValidationSplit(
        estimator=gp,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(metricName="accuracy"),
        trainRatio=0.75,  # MNIST.scala:36 uses 0.75
        seed=5,
    )
    model = tvs.fit(mnist_shaped)
    acc = model.validationMetrics
    assert len(acc) == 2
    pred = model.transform(mnist_shaped)
    agreement = pred.filter(F.col("label") == F.col("prediction")).count() / pred.count()
    assert agreement >= 0.95, agreement
