"""Streaming near-duplicate detection: MinHash-LSH over a document STREAM.

Batch near-dup (operators/dedup.py) sees the whole corpus at once; a
streaming ingest pipeline instead needs to answer, per arriving document,
"have I already accepted a near-duplicate of this?"  Spark's built-in
streaming dedup (`dropDuplicatesWithinWatermark`) is exact-key only, so this
is the custom-state shape: the MinHash signature is a pure projection
(engine-portable md5 family, the SAME expression as the batch operator), the
stream is keyed by LSH (band, key) bucket, and an ``applyInPandasWithState``
state machine keeps the MINIMUM doc id seen per bucket — one bigint per
bucket, the smallest state that answers "earliest prior collider".

Emission: a document colliding with an earlier document in ≥ 1 band emits
one (doc_id, dup_of = bucket-min-so-far) row per colliding band; the
min-per-doc over those emissions is the EARLIEST prior near-dup candidate.
With id-ordered staged arrivals (repartitionByRange on the id) the emitted
relation is a pure function of the data:

    dup_of(d) = min{ d' < d : d' shares ≥ 1 LSH band with d }

which the batch oracle states over the same banding CTEs the
``minhash_lsh_pairs`` oracle already uses.

Scale shape: one shuffle on (band, key); state is one long per DISTINCT
bucket — orders of magnitude smaller than the corpus.  On an unbounded
stream, bucket-count growth is bounded by passing ``ttl_ms``: a
processing-time timeout drops buckets that have gone cold for that long
(an explicit recall trade — a duplicate arriving later than the TTL after
its original is no longer detected).  The finite-corpus harness runs
without a TTL; tests/test_streaming_neardup.py exercises expiry.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_band_struct, minhash_signature
from .events import _drive_append_query, _staged_arrivals, _state_partitions

NEARDUP_OUT_SCHEMA = "doc_id bigint, dup_of bigint"
NEARDUP_STATE_SCHEMA = "min_id bigint"


def _make_neardup_state_func(ttl_ms: int | None):
    """Per-(band, key) state machine factory: emit (doc, bucket-min-so-far)
    for every doc with an earlier collider; carry the running min doc id.
    With ``ttl_ms``, a bucket whose group saw no data for that long is
    dropped on the next micro-batch (hasTimedOut), bounding state on
    unbounded streams."""

    def func(
        key: Tuple, pdf_iter: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "dup_of": pd.Series(dtype="int64")}
            )
            return
        cur = int(state.get[0]) if state.exists else None
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        out: list[tuple[int, int]] = []
        for d in sorted(int(x) for x in pdf["_id"]):
            if cur is not None and cur < d:
                out.append((d, cur))
            cur = d if cur is None else min(cur, d)
        state.update((int(cur),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=["doc_id", "dup_of"]).astype("int64")

    return func


def streaming_neardup_matches(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 7,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-band match log over a (streaming) documents frame: one
    (doc_id, dup_of) row per band collision with an earlier document.
    ``ttl_ms`` bounds state on unbounded streams by expiring buckets idle
    for that long (processing-time timeout; trades recall for bounded
    state — see module docstring).

    Driving caveat with ``ttl_ms``: ProcessingTimeTimeout makes the
    stateful operator report shouldRunAnotherBatch unconditionally, so
    under the default ASAP trigger the engine runs continuous no-data
    micro-batches (each a state-store commit cycle) and
    ``processAllAvailable()`` never returns.  Production TTL streams
    should use a processing-time trigger (e.g. ``trigger(processingTime=
    '1 minute')``) sized to the TTL, and synchronize on progress, not on
    processAllAvailable — see tests/test_streaming_neardup.py."""
    # STAGE the signature as its own projection before banding: the band
    # struct references the signature 16 times, and Catalyst inlines (and
    # re-evaluates) non-aliased higher-order aggregates per reference — the
    # same re-inlining trap _minhash_staged documents for the batch path
    staged = docs.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n, seed).alias("sig"),
    )
    banded = staged.select(
        "_id", minhash_band_struct(F.col("sig"), num_hashes, bands).alias("bk")
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return banded.groupBy("band", "key").applyInPandasWithState(
        _make_neardup_state_func(ttl_ms),
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if ttl_ms is not None else "NoTimeout",
    )


def run_streaming_neardup(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 7,
    query_name: str = "gp_stream_neardup",
    n_files: int = 2,
) -> DataFrame:
    """Drive the documents parquet through the streaming near-dup operator:
    id-range staged arrivals (arrival order == id order, so 'earlier' is
    well-defined for the oracle), per-band match log into a parquet sink,
    then the batch min-per-doc summary of the log."""
    work = tempfile.mkdtemp(prefix="gp_stream_neardup_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False,
        table="documents", order_col="doc_id",
    )

    stream = spark.readStream.schema(schema).parquet(src)
    matches = streaming_neardup_matches(
        stream, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n, seed=seed
    )
    with _state_partitions(spark):
        q = (
            matches.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    # explicit schema: a collision-free corpus commits ZERO part files and a
    # bare read would fail schema inference instead of returning 0 rows
    log = spark.read.schema(NEARDUP_OUT_SCHEMA).parquet(sink)
    return log.groupBy("doc_id").agg(F.min("dup_of").alias("dup_of"))
