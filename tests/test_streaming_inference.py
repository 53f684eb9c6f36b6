"""GP model inference over a Structured Stream.

The fitted model's transform is a pure projection (Arrow-batched predict
UDF over broadcast active-set state), so it applies unchanged to a
streaming DataFrame — the online-scoring deployment shape: fit offline,
score an unbounded stream.  The test drives the same rows through the
batch and streaming paths and requires identical predictions.
"""

import os
import tempfile

from pyspark.sql import functions as F

from spark_gp_spark import GaussianProcessRegression, RBFKernel, Scalar


def test_gpr_model_scores_a_stream(spark):
    df = (
        spark.range(800)
        .withColumn("x", F.rand(7) * 4.0)
        .select("id", "x", F.sin(F.col("x")).alias("label"), F.array("x").alias("features"))
    )
    gp = (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(1.0))
        .setDatasetSizeForExpert(100)
        .setActiveSetSize(50)
        .setActiveSetProvider("random")
        .setSeed(3)
        .setSigma2(1e-3)
        .setMaxIter(10)
    )
    model = gp.fit(df)

    batch = {r.id: r.prediction for r in model.transform(df).select("id", "prediction").collect()}

    work = tempfile.mkdtemp(prefix="gp_stream_infer_")
    src, sink, ckpt = (os.path.join(work, d) for d in ("src", "sink", "ckpt"))
    df.select("id", "features").write.parquet(src)
    stream = spark.readStream.schema("id bigint, features array<double>").parquet(src)
    q = (
        model.transform(stream)
        .select("id", "prediction")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {r.id: r.prediction for r in spark.read.parquet(sink).collect()}

    assert streamed.keys() == batch.keys()
    assert all(abs(streamed[i] - batch[i]) < 1e-9 for i in batch)


def test_streaming_ann_ingest_matches_batch_encode(spark):
    """The streamed inverted file must be BIT-identical to a batch encode:
    run the embeddings fixture through the streaming encoder (persisted
    index, cell-partitioned append sink) and compare every (vec_id, cell,
    codes, mse) row against pq_encode_residual over the static table."""
    from pyspark.sql import functions as F

    from spark_gp_spark.operators.pq import pq_encode_residual
    from spark_gp_spark.queries import _persisted_ann_index
    from spark_gp_spark.sources.tables import load_table
    from spark_gp_spark.streaming.ann import run_streaming_ann_ingest

    sf = "/root/testdata/sf0.001"
    streamed = run_streaming_ann_ingest(spark, sf)
    idx = _persisted_ann_index(f"{sf}/embeddings.parquet")
    batch = pq_encode_residual(
        load_table(spark, sf, "embeddings"), idx["codebooks"], idx["centroids"]
    ).select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        F.concat_ws(",", F.col("codes").cast("array<string>")).alias("codes"),
        "mse",
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) == 500


def test_streaming_dim_stats_matches_batch_at_grain(spark, sf_dir):
    """Batch-vs-stream float-fold parity gate for the drift monitor
    (VERDICT r7 #7): the streamed complete-mode stats must equal the batch
    embedding_dim_stats at the emitted 6-dp grain — cross-batch moment
    merging may differ from partition-order folding by last-ulp noise only,
    which the shared rounding absorbs."""
    from spark_gp_spark.operators.similarity import embedding_dim_stats
    from spark_gp_spark.streaming.drift import run_streaming_embedding_drift

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    cand = emb.filter(F.col("vec_id") % 2 == 1)

    got = (
        run_streaming_embedding_drift(spark, sf_dir)
        .toPandas().sort_values("pos").reset_index(drop=True)
    )
    from spark_gp_spark.operators.similarity import embedding_drift_report

    want = (
        embedding_drift_report(base, cand)
        .toPandas().sort_values("pos").reset_index(drop=True)
    )
    assert got.columns.tolist() == want.columns.tolist()
    for c in got.columns:
        assert (got[c] == want[c]).all(), f"column {c} diverges"
