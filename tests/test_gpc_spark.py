"""End-to-end GPC acceptance: Iris OneVsRest 10-fold CV.

Parity with the reference example (classification/examples/Iris.scala:10-33):
GaussianProcessClassifier(datasetSizeForExpert=20, activeSetSize=30) wrapped
in OneVsRest, 10-fold CV multiclass accuracy.  The reference prints the
accuracy without asserting; we pin a floor of 0.90 (typical GP Iris accuracy
is ~0.94+) so regressions are caught.
"""

import os

import pytest
from pyspark.sql import functions as F

from spark_gp_spark import GaussianProcessClassifier

IRIS_CSV = "/root/reference/data/iris.csv"


@pytest.mark.skipif(not os.path.exists(IRIS_CSV), reason="iris data not present")
def test_iris_onevsrest_cv_accuracy(spark):
    from pyspark.ml.classification import OneVsRest
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    name2idx = {"Iris-versicolor": 0.0, "Iris-setosa": 1.0, "Iris-virginica": 2.0}
    mapping = F.create_map(*[F.lit(x) for kv in name2idx.items() for x in kv])
    raw = spark.read.csv(IRIS_CSV)
    df = raw.select(
        F.array(*[F.col(f"_c{i}").cast("double") for i in range(4)]).alias("features"),
        mapping[F.col("_c4")].alias("label"),
    )

    gp = (
        GaussianProcessClassifier()
        .setDatasetSizeForExpert(20)
        .setActiveSetSize(30)
        .setSeed(13)
        .setMaxIter(20)
    )
    ovr = OneVsRest(classifier=gp)
    cv = CrossValidator(
        estimator=ovr,
        evaluator=MulticlassClassificationEvaluator(metricName="accuracy"),
        estimatorParamMaps=ParamGridBuilder().build(),
        numFolds=10,
        seed=13,
    )
    acc = cv.fit(df).avgMetrics[0]
    assert acc > 0.90, f"OneVsRest CV accuracy {acc} <= 0.90"


def test_gpc_quality_filter_heldout_accuracy(spark):
    """GP × pipeline composition gate (corpus_prep_gpc_filter): the GPC
    fitted on a 1/3 slice to predict (quality >= 0.76) from text features
    must score the HELD-OUT 2/3 at >= 0.95 accuracy — well above the
    positive-class base rate (~0.90), so the model genuinely learned the
    quality surface rather than the majority label."""
    from pyspark.sql import functions as F

    from spark_gp_spark.queries import _PIPE_QMIN, _gpc_quality_filter_frames

    corpus, _, scored = _gpc_quality_filter_frames(spark, "/root/testdata/sf0.001")
    held = scored.filter(F.pmod("doc_id", 3) != 0)
    agg = held.agg(
        F.avg(
            ((F.col("p1") >= 0.5) == (F.col("quality") >= _PIPE_QMIN)).cast("int")
        ).alias("acc"),
        F.avg((F.col("quality") >= _PIPE_QMIN).cast("int")).alias("base"),
    ).first()
    corpus.unpersist()
    scored.unpersist()
    assert agg["acc"] >= 0.95, f"held-out accuracy {agg['acc']:.4f} < 0.95"
    # the gate must beat always-predict-positive
    assert agg["acc"] > agg["base"], (agg["acc"], agg["base"])


def test_gpc_uncertainty_sample_ranking(spark):
    """Active-learning batch selection gate (gpc_uncertainty_sample): the
    returned batch is exactly the pool's top-B by smallest |p - 1/2|
    (contiguous ranks, uncertainty monotone in rank), p1 is a valid
    probability, and only pool ids (vec_id >= split) are selected."""
    from spark_gp_spark.queries import (
        _UNC_BATCH,
        _UNC_POOL_SPLIT,
        gpc_uncertainty_sample,
    )

    out = gpc_uncertainty_sample(spark, "/root/testdata/sf0.001")
    # top-B must compile to TakeOrderedAndProject (distributed partial
    # top-k), never a global single-task row_number over the pool
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert 0 < len(rows) <= _UNC_BATCH
    ranks = sorted(r.unc_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r.unc_rank)
    unc = [abs(r.p1 - 0.5) for r in by_rank]
    assert all(a <= b + 1e-12 for a, b in zip(unc, unc[1:]))  # monotone
    assert all(0.0 <= r.p1 <= 1.0 for r in rows)
    assert all(r.vec_id >= _UNC_POOL_SPLIT for r in rows)
