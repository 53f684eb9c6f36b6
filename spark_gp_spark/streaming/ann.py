"""Streaming ANN ingest: encode arriving vectors with a PERSISTED index.

The batch side of the ANN lifecycle is train-once (operators/ann_index.py)
+ encode-once (queries.ensure_ann_codes).  A production vector store also
ingests CONTINUOUSLY: new embeddings arrive, are encoded against the
frozen coarse centroids + residual codebooks, and append to the same
cell-partitioned codes relation the batch queries scan — FAISS's "add to
inverted lists" as a Structured Streaming dataflow.

Shape: the encoder (operators/pq.py:pq_encode_residual) is a pure
Arrow-batched projection, so the stream needs NO state store, no
watermark, no shuffle — each micro-batch flows scan → encode → append.
The sink is partitioned by the coarse cell, so the on-disk inverted-file
layout builds up incrementally and stays directly queryable by
ivfadc_topk_codes-style scans (probed-cells partition pruning works on
the growing relation unchanged).

No reference counterpart (the reference is a GP library,
/root/reference); this completes the north-star ANN surface's write path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_encode_vectors(
    vecs: DataFrame,
    codebooks,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual-PQ-encode a (streaming) vector frame against a FROZEN index:
    (id, cell, codes, mse) rows, one per arriving vector — identical values
    to the batch encoder by construction (same UDF, operators/pq.py)."""
    from ..operators.pq import pq_encode_residual

    return pq_encode_residual(vecs, codebooks, centroids, vec_col, id_col)


def run_streaming_ann_ingest(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "gp_stream_ann_ingest",
    n_files: int = 2,
) -> DataFrame:
    """Drive the embeddings parquet through the streaming encoder: id-range
    staged arrivals → readStream → encode with the PERSISTED index artifact
    → append parquet sink partitioned by cell → read the accumulated codes
    relation back.  Output: (vec_id, cell, codes as a comma-joined string,
    mse) — replayed by the DuckDB residual-encode oracle, proving the
    streamed inverted file is bit-identical to a batch encode."""
    from ..queries import _persisted_ann_index
    from .events import _drive_append_query, _staged_arrivals

    work = tempfile.mkdtemp(prefix="gp_stream_ann_ingest_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False,
        table="embeddings", order_col="vec_id",
    )
    idx = _persisted_ann_index(f"{sf_dir}/embeddings.parquet")
    stream = spark.readStream.schema(schema).parquet(src)
    codes = streaming_encode_vectors(stream, idx["codebooks"], idx["centroids"])
    q = (
        codes.writeStream.outputMode("append")
        .format("parquet")
        .partitionBy("cell")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .queryName(query_name)
        .start()
    )
    _drive_append_query(q, src, arrivals)
    back = spark.read.parquet(sink)
    return back.select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        F.concat_ws(",", F.col("codes").cast("array<string>")).alias("codes"),
        "mse",
    )
