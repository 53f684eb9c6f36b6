"""Streaming embedding-drift monitor: incremental per-dimension stats over
an ARRIVING embedding stream, compared against a static baseline snapshot.

The batch report (operators/similarity.py:embedding_drift_report) compares
two complete corpora; a production ingest pipeline instead wants the alarm
ON ARRIVAL — "as new embeddings stream in, is their per-dimension
distribution shifting away from the frozen baseline?" — so the candidate
side here is a COMPLETE-mode streaming aggregation that folds every
micro-batch into the running (pos, mean, std, min, max) relation, and the
report joins it against the baseline's batch stats after each advance.

Scale shape (same as the batch stats pass): posexplode to thin (pos, value)
rows, ONE shuffle over ≤ dim keys with map-side partial aggregation per
micro-batch; streaming state is ≤ dim aggregation buffers (avg/stddev
moments), constant in the stream length — the cheapest possible stateful
monitor.  No watermark: the stats are over ALL arrivals, complete mode is
the point (the relation is ≤ dim rows, so "unbounded" complete-mode state
is a non-issue here, unlike row-level sinks).

Float-fold parity (the risk VERDICT r7 flagged): Spark's avg/stddev_samp
merge central-moment partials in micro-batch arrival order, while the batch
oracle folds in partition order — the sums differ by last-ulp noise exactly
like any two batch partitionings.  The emitted stats round to 6 dp (the
engine-portable grain every stats consumer here shares), and batch-vs-stream
agreement at that grain is gated in tests/test_streaming_inference.py; the
registry oracle is the same _DRIFT_SQL the batch query uses.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import drift_report_from_stats, embedding_dim_stats
from .events import _staged_arrivals, _state_partitions


def streaming_dim_stats(stream: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Incremental per-dimension stats over a streaming embedding frame —
    the IDENTICAL aggregation expressions as the batch
    ``embedding_dim_stats`` (same 6-dp rounding), applied to a stream; run
    it in complete output mode.  Works on a batch frame too (it is the
    batch operator's expression tree)."""
    return embedding_dim_stats(stream, vec_col)


def run_streaming_embedding_drift(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "gp_stream_drift",
    n_files: int = 2,
) -> DataFrame:
    """Drive the embedding corpus's ODD-id half through the streaming stats
    monitor in ``n_files`` staged arrivals (cross-batch moment merging is
    the machinery under test) and report drift against the EVEN-id half as
    the static baseline — the same slicing as the batch ``embedding_drift``
    registry query, so the same _DRIFT_SQL oracle states the result."""
    work = tempfile.mkdtemp(prefix="gp_stream_drift_")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False,
        table="embeddings", order_col="vec_id",
    )
    stream = spark.readStream.schema(schema).parquet(src)
    stats = streaming_dim_stats(stream.filter(F.col("vec_id") % 2 == 1))
    with _state_partitions(spark):
        q = (
            stats.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
    from .events import _arrive_atomically

    try:
        for i, path in enumerate(arrivals):
            _arrive_atomically(src, [(path, f"arrival-{i:04d}.parquet")])
            q.processAllAvailable()
    finally:
        q.stop()
    cand_stats = spark.table(query_name)
    from ..sources.tables import load_table

    base = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    return drift_report_from_stats(embedding_dim_stats(base), cand_stats)


def run_streaming_vocab_drift(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "gp_stream_vocab_drift",
    n_files: int = 2,
    vocab_size: int = 16,
    n_slices: int = 3,
) -> DataFrame:
    """Text-side twin of the embedding-drift monitor: as crawl documents
    stream in, their OOV rate against a FROZEN baseline vocab — the
    tokenizer-fit / ingest-drift alarm AT ARRIVAL TIME (a rising OOV rate
    means the crawl drifted to a language/domain the vocab was not fit on,
    before any model metric moves).

    Baseline = the EVEN-id half of `documents` (static); its top-k
    document-frequency vocab (operators/text.py:top_df_vocab — the SAME
    derivation vocab_coverage uses) broadcasts into the arriving ODD-id
    stream via a stream-static left join, and a complete-mode aggregation
    folds every micro-batch into per-crawl-slice (doc_id % n_slices —
    the deterministic stand-in for a crawl-day key) OOV counts.

    Output: (crawl_slice, n_tokens, n_oov, oov_rate) — all counts exact
    integers, so any cross-batch merge error fails the oracle HARD (no
    float-fold grain to hide in, unlike the moment-merging embedding twin).

    Scale shape: the vocab is k rows broadcast once; per micro-batch the
    work is explode → map-side joined flags → partial counts into
    ≤ n_slices aggregation buffers — streaming state constant in the
    stream length, the same cheapest-possible-monitor contract as
    run_streaming_embedding_drift."""
    from ..operators.text import tokens, top_df_vocab
    from ..sources.tables import load_table
    from .events import _arrive_atomically

    work = tempfile.mkdtemp(prefix="gp_stream_vocab_")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False,
        table="documents", order_col="doc_id",
    )
    base = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    vocab = top_df_vocab(base, vocab_size)
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("doc_id") % 2 == 1)
    )
    occ = stream.select(
        (F.col("doc_id") % n_slices).alias("crawl_slice"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    agg = (
        occ.join(F.broadcast(vocab), "token", "left")
        .groupBy("crawl_slice")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("_in_vocab").isNull()).alias("n_oov"),
        )
        .select(
            F.col("crawl_slice").cast("long").alias("crawl_slice"),
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
    try:
        for i, path in enumerate(arrivals):
            _arrive_atomically(src, [(path, f"arrival-{i:04d}.parquet")])
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
