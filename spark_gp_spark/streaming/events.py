"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2.8); these operators extend
the engine with the standard stream shapes a training-data pipeline needs:
watermarked tumbling-window aggregation and gap-session windows.  For tests
and the correctness oracle, the same parquet data is driven through a real
``readStream`` → ``writeStream(memory)`` query with ``processAllAvailable``,
so the streaming plan (watermark, stateful agg) is genuinely exercised while
the result stays comparable to a batch SQL oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import normalize_event_ts


def _event_file_schema(spark: SparkSession, sf_dir: str):
    """Batch-read the events parquet footer for the stream schema — file
    sources require an explicit schema, and the corpus has shipped ``ts``
    as both nanos-longs and native timestamps (see tables.normalize_event_ts)."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet.

    Two quirks of the test corpus handled here, both invisible to callers:
    the source path is a single file (file-stream sources need a directory +
    glob), and ``ts`` arrives in whichever encoding the corpus generation
    used — normalized to UTC-instant timestamps exactly like the batch
    loader, so stream and oracle agree.
    """
    stream = (
        spark.readStream.schema(_event_file_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(spark, stream)


def windowed_event_aggregation(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event type (works on batch or stream)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_streaming_window_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", query_name: str = "gp_stream_counts"
) -> DataFrame:
    """Drive the events parquet through a real streaming query; returns the
    complete-mode result as a batch DataFrame."""
    stream = read_event_stream(spark, sf_dir)
    agg = windowed_event_aggregation(stream, window)
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_streaming_window_counts_append(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    query_name: str = "gp_stream_counts_append",
    n_files: int = 2,
) -> DataFrame:
    """Production-shaped streaming: APPEND mode + watermark + parquet file
    sink — bounded state, incremental emission of CLOSED windows only (the
    complete/memory variant above is an oracle harness and keeps unbounded
    state; this is the path that scales to an unbounded stream).

    The single-file test corpus is re-written as ``n_files`` time-ranged
    chunks whose ARRIVAL is driven explicitly (each chunk is copied into the
    source directory and fully processed before the next appears), so the
    watermark genuinely advances batch over batch.  Two chunks are the
    minimum that still exercises cross-batch watermark advancement; the
    emitted set is a pure cutoff predicate on the data, so chunk count
    never changes the result — only the micro-batch machinery cost (each
    batch pays per-partition state-store commits).  A final sentinel file
    repeats the max-ts event: it pushes the watermark to max(ts) − 1h —
    flushing every closed window — while its own window's end exceeds the
    final watermark and therefore can never be emitted, so the sentinel
    row leaves no trace in the sink.  The emitted set is then exactly
    {windows with end ≤ max(ts) − 1h}, a function of the DATA alone (not of
    file discovery order or of Spark's optional no-data batches), which a
    batch oracle states as a plain cutoff predicate.
    """
    work = tempfile.mkdtemp(prefix="gp_stream_append_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(spark, sf_dir, work, n_files)

    stream = normalize_event_ts(spark, spark.readStream.schema(schema).parquet(src))
    agg = windowed_event_aggregation(stream, window)
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    return spark.read.parquet(sink)


#: memoized staged-chunk sets, keyed by (source path, file mtime+size,
#: n_files, sentinel, order column).  The chunk files are immutable once
#: written, so every streaming query in a session reuses them — only the
#: per-query arrival dir / sink / checkpoint are fresh.  Saves one
#: repartitionByRange write (+ sentinel job) per streaming query after the
#: first (~2 s each across the streaming gate).  The mtime+size component
#: invalidates the cache when the source parquet is rewritten in place.
_STAGED_CACHE: dict[tuple, tuple[list, object]] = {}


def _staged_arrivals(
    spark: SparkSession,
    sf_dir: str,
    work: str,
    n_files: int,
    sentinel: bool = True,
    table: str = "events",
    order_col: str = "ts",
):
    """Split ``<sf_dir>/<table>.parquet`` into ``n_files`` range-ordered
    chunks on ``order_col`` (plus, by default for the events table, a max-ts
    sentinel file); returns (src_dir, ordered arrival paths, schema).
    ``ts`` keeps the file's native encoding (raw nanos-long or timestamp) —
    the returned schema is what the re-staged chunks carry, and callers
    normalize after the readStream.

    The sentinel repeats the max-ts event to push the final watermark to
    max(ts) − delay, flushing closed windows/sessions/timeouts.  Operators
    that emit ON ARRIVAL rather than on watermark flush (streaming dedup,
    inner stream-stream joins, the near-dup bucket-min machine) must pass
    ``sentinel=False``: they need no flush, and the duplicated row would
    land in their sink as data."""
    src = os.path.join(work, "src")
    os.makedirs(src)
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    source = f"{sf_dir}/{table}.parquet"
    try:
        st = os.stat(source)
        fingerprint = (st.st_mtime_ns, st.st_size)
    except OSError:  # directory-style parquet: fall back to path-only key
        fingerprint = None
    cache_key = (source, fingerprint, n_files, sentinel, order_col)
    if cache_key in _STAGED_CACHE:
        arrivals, schema = _STAGED_CACHE[cache_key]
        if all(os.path.exists(p) for p in arrivals):
            return src, list(arrivals), schema
    staged, sentinel_dir = os.path.join(work, "staged"), os.path.join(work, "sentinel")
    raw = spark.read.parquet(source)
    raw.repartitionByRange(n_files, order_col).write.parquet(staged)
    chunks = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
    arrivals = [os.path.join(staged, f) for f in chunks]
    if sentinel:
        raw.orderBy(F.desc(order_col)).limit(1).coalesce(1).write.parquet(sentinel_dir)
        sent = next(f for f in sorted(os.listdir(sentinel_dir)) if f.endswith(".parquet"))
        arrivals.append(os.path.join(sentinel_dir, sent))
    schema = spark.read.parquet(staged).schema
    _STAGED_CACHE[cache_key] = (list(arrivals), schema)
    return src, arrivals, schema


def _arrive_atomically(src: str, paths_and_names) -> None:
    """Deliver SINGLE-file arrivals into the watched source dir without the
    stream ever seeing a partial file: copy to a dot-prefixed temp name
    (the file stream source's hidden-file filter ignores names starting with
    '.' or '_'), then os.rename into place — atomic on the same filesystem,
    so a micro-batch triggered mid-arrival can never observe a half-written
    file (ADVICE r9: batch-boundary flakiness).  NOTE: with MULTIPLE files
    this only narrows the split window to consecutive rename syscalls — a
    listing between two renames can still split the arrival; multi-file
    arrivals must use _arrive_dir_atomically with a glob source instead."""
    import shutil

    staged = []
    for path, name in paths_and_names:
        tmp = os.path.join(src, f".{name}.tmp")
        shutil.copy(path, tmp)
        staged.append((tmp, os.path.join(src, name)))
    for tmp, final in staged:
        os.rename(tmp, final)


def _arrive_dir_atomically(src: str, arrival_name: str, paths) -> None:
    """Deliver a MULTI-file arrival as one atomic unit: copy every file into
    a hidden staging directory, then os.rename the DIRECTORY into place —
    one syscall, so a source watching the glob ``<src>/*`` either sees the
    whole arrival or none of it.  This closes the residual multi-file split
    window _arrive_atomically's per-file renames leave open (r10 review)."""
    import shutil

    tmp = os.path.join(src, f".{arrival_name}.tmp")
    os.makedirs(tmp)
    for i, path in enumerate(paths):
        shutil.copy(path, os.path.join(tmp, f"part-{i:03d}.parquet"))
    os.rename(tmp, os.path.join(src, arrival_name))


def _drive_append_query(q, src: str, arrivals) -> None:
    try:
        for i, path in enumerate(arrivals):
            _arrive_atomically(src, [(path, f"arrival-{i:04d}.parquet")])
            q.processAllAvailable()
    finally:
        q.stop()


class _no_nodata_batches:
    """Temporarily disable no-data micro-batches while a query that emits
    ON ARRIVAL runs (inner stream-stream / stream-static joins): those
    extra batches exist ONLY to act on an advanced watermark (flush closed
    windows, fire timeouts, evict join state), and for an on-arrival query
    their output is empty by construction — but each one still pays a full
    per-partition-per-store state commit (measured on the bounded near-dup
    join at sf0.1: a no-data batch spent 20 s of commitTimeMs evicting
    17k rows; disabling cut the entry 29.8 → 22.1 s and the unbounded twin
    21.7 → 16.2 s on the same VM).  Eviction still happens — it folds into
    the next DATA batch's state maintenance instead of a dedicated commit.
    NEVER use around watermark-FLUSH emitters (append windows/sessions,
    TTL timeouts, trending terms): they need the no-data batch to emit."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.key = "spark.sql.streaming.noDataMicroBatches.enabled"

    def __enter__(self):
        self.saved = self.spark.conf.get(self.key, "true")
        self.spark.conf.set(self.key, "false")

    def __exit__(self, *exc):
        self.spark.conf.set(self.key, self.saved)
        return False


class _state_partitions:
    """Temporarily lower ``spark.sql.shuffle.partitions`` while a streaming
    query STARTS (the value is frozen into the query's state-store layout at
    start and kept via the checkpoint thereafter).

    Stateful micro-batches pay a fixed per-partition cost — state-store
    provider init, delta-file commit, snapshot bookkeeping — per batch, per
    store (a stream-stream join keeps 4 stores per side).  At test-corpus
    batch sizes that fixed cost dominates: 32 partitions × 4 stores × 2
    sides × 4 batches ≈ 1000 store commits for 172 result rows (measured
    23 s → ~8 s at 8 partitions).  On a production cluster the state volume
    would justify many partitions — this knob belongs to the test/bench
    harness, not the operator semantics, which are partition-count
    independent."""

    def __init__(self, spark: SparkSession, n: int = 8):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)
        return False


def run_streaming_sessions_append(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    query_name: str = "gp_stream_sessions_append",
    n_files: int = 2,
) -> DataFrame:
    """APPEND-mode gap sessions through ``session_window`` + watermark into a
    parquet sink — bounded state, only CLOSED sessions emitted.  Same
    staged-arrival + max-ts sentinel protocol as
    ``run_streaming_window_counts_append``: the final watermark is
    max(ts) − 1h, so the sink holds exactly the sessions whose end
    (last event + gap) ≤ that cutoff — a pure-data predicate for the oracle.
    The sentinel row's own session ends after the cutoff and is never
    emitted."""
    work = tempfile.mkdtemp(prefix="gp_stream_sess_append_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(spark, sf_dir, work, n_files)

    stream = normalize_event_ts(spark, spark.readStream.schema(schema).parquet(src))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    return spark.read.parquet(sink)


def run_streaming_dedup(
    spark: SparkSession,
    sf_dir: str,
    delay: str = "2 hours",
    query_name: str = "gp_stream_dedup",
    n_files: int = 4,
) -> DataFrame:
    """Streaming deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keyed on (user_id, event_type, hour
    bucket) — state for a key is evicted once the watermark passes its event
    time + delay, so an unbounded stream holds a sliding window of keys
    instead of all keys ever seen (the scale difference vs plain streaming
    ``dropDuplicates``).

    Determinism contract for the oracle: WithinWatermark guarantees dedup of
    duplicates arriving within ``delay`` of each other; same-hour-bucket
    events are < 1 h apart in event time and the staged arrivals are
    ts-ordered, so with delay ≥ 1 h every duplicate lands while its key is
    still in state.  The emission is projected to the KEY COLUMNS ONLY
    (which surviving row is kept is arrival-order-dependent; the key set is
    not), making the result exactly the distinct key set — a plain batch
    ``SELECT DISTINCT``."""
    work = tempfile.mkdtemp(prefix="gp_stream_dedup_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(spark, sf_dir, work, n_files, sentinel=False)

    stream = normalize_event_ts(spark, spark.readStream.schema(schema).parquet(src))
    deduped = (
        stream.withColumn("hour_start", F.date_trunc("hour", F.col("ts")))
        .select("ts", "user_id", "event_type", "hour_start")
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "hour_start"])
        .select("user_id", "event_type", "hour_start")
    )
    # dropDuplicatesWithinWatermark emits first-seen rows ON ARRIVAL;
    # no-data batches would only pay state-eviction commits (see
    # _no_nodata_batches) — eviction folds into the next data batch
    with _state_partitions(spark), _no_nodata_batches(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
        _drive_append_query(q, src, arrivals)
    return spark.read.parquet(sink)


def run_streaming_interval_join(
    spark: SparkSession,
    sf_dir: str,
    lower: str = "30 minutes",
    delay: str = "2 hours",
    query_name: str = "gp_stream_interval_join",
    n_files: int = 2,
) -> DataFrame:
    """Stream-stream INNER interval join: each purchase matched to the same
    user's views in the preceding ``lower`` window — the streaming form of
    the attribution query ``asof_purchases_views`` answers in batch.

    Both sides are watermarked and the join condition carries the time-range
    predicate, so Spark bounds each side's state to the interval plus the
    watermark delay (the production contract for unbounded streams).  Inner
    matches emit as soon as both rows have arrived — no watermark flush is
    needed for completeness, so with the staged ts-ordered arrivals the sink
    holds exactly the full interval-join result, a plain batch range join
    for the oracle."""
    work = tempfile.mkdtemp(prefix="gp_stream_ij_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(spark, sf_dir, work, n_files, sentinel=False)

    stream = normalize_event_ts(spark, spark.readStream.schema(schema).parquet(src))
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", delay)
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", delay)
    )
    joined = purchases.join(
        views,
        F.expr(
            f"p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL {lower} AND p_ts"
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("v_ts").alias("view_ts_us"),
    )
    # a stream-stream join keeps 4 state stores PER SIDE per partition, but
    # at sf0.1 the join's shuffle parallelism dominates the fixed commit
    # cost: 8 partitions measured ~2× faster than 4 (A/B at sf0.1)
    # inner join => emits on arrival; no-data batches only pay state
    # commits (see _no_nodata_batches) — eviction folds into data batches
    with _state_partitions(spark), _no_nodata_batches(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
        _drive_append_query(q, src, arrivals)
    return spark.read.parquet(sink)


#: static event-type dimension for the stream-static enrichment join —
#: deterministic literals, restatable inline by the SQL oracle.
EVENT_TYPE_WEIGHTS = [
    ("click", 1.0),
    ("view", 0.5),
    ("purchase", 10.0),
    ("signup", 5.0),
    ("error", 0.1),
]


def run_streaming_static_enrich(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    query_name: str = "gp_stream_enrich",
    n_files: int = 2,
) -> DataFrame:
    """Stream-STATIC enrichment join + windowed aggregation into an APPEND
    parquet sink — the production dimension-lookup shape: the static side is
    broadcast into every micro-batch (stateless join, unlike stream-stream),
    then the weighted values aggregate per closed window.

    A LEFT join with a coalesced default keeps unknown event types flowing
    (dimension gaps must never drop fact rows in a pipeline).  Same staged-
    arrival + max-ts sentinel protocol as the other append harnesses: the
    sink holds exactly the windows with end ≤ max(ts) − 1h — a pure-data
    cutoff the batch oracle restates with an inline VALUES dimension."""
    work = tempfile.mkdtemp(prefix="gp_stream_enrich_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(spark, sf_dir, work, n_files)

    dim = F.broadcast(
        spark.createDataFrame(EVENT_TYPE_WEIGHTS, "event_type string, weight double")
    )
    stream = normalize_event_ts(spark, spark.readStream.schema(schema).parquet(src))
    enriched = stream.join(dim, "event_type", "left").withColumn(
        "weighted", F.col("value") * F.coalesce("weight", F.lit(1.0))
    )
    agg = (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.round(F.col("weighted") * 1e6, 0).cast("long")) / F.lit(1e6), 6).alias("weighted_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "weighted_value")
    )
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    return spark.read.parquet(sink)


def streaming_sessionization(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    query_name: str = "gp_stream_sessions",
) -> DataFrame:
    """Session windows (gap-based) on the event stream via
    ``session_window`` — Spark's native stateful session operator."""
    stream = read_event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
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
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_streaming_upsert(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "gp_stream_upsert",
    n_files: int = 4,
) -> DataFrame:
    """Streaming MERGE sink (``foreachBatch`` + operators/merge.py): each
    micro-batch of events is reduced to latest-per-user updates and upserted
    into a versioned parquet table — the lakehouse streaming-CDC write path
    (what Delta's ``foreachBatch`` + ``MERGE INTO`` idiom does), with the
    table swap done by version directory since plain parquet cannot be
    rewritten in place while being read.

    Determinism contract for the oracle: arrivals are range-staged by ts, so
    later batches carry strictly later time ranges; within a batch the
    update set is latest-wins per user ordered by (ts, event_id).  The final
    table is therefore exactly "each user's last event" — a plain batch
    window query, which is the DuckDB oracle.
    """
    work = tempfile.mkdtemp(prefix="gp_stream_upsert_")
    ckpt = os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(spark, sf_dir, work, n_files, sentinel=False)

    from pyspark.sql import Window

    from ..operators.merge import merge_upsert

    state: dict[str, str | None] = {"cur": None}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        updates = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "user_id",
                F.col("event_type").alias("last_type"),
                F.col("ts").alias("last_ts"),
                F.col("value").alias("last_value"),
            )
        )
        if state["cur"] is None:
            merged = updates
        else:
            base = batch_df.sparkSession.read.parquet(state["cur"])
            merged = merge_upsert(base, updates, key="user_id")
        nxt = os.path.join(work, f"table_v{batch_id}")
        merged.write.mode("overwrite").parquet(nxt)
        state["cur"] = nxt

    stream = normalize_event_ts(spark, spark.readStream.schema(schema).parquet(src))
    with _state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    assert state["cur"] is not None, "no micro-batch ran"
    return spark.read.parquet(state["cur"])


def run_streaming_shard_export(
    spark: SparkSession,
    sf_dir: str,
    n_shards: int = 8,
    seed: int = 3,
    query_name: str = "gp_stream_shard_export",
    n_files: int = 2,
) -> DataFrame:
    """Streaming training-shard export: documents arrive as a stream and
    append STRAIGHT into the deterministic shard layout
    (sources/sinks.py:shard_expr — dir-partitioned parquet, shard a pure
    function of the id), so the training-ready corpus builds up
    incrementally with zero state store, zero watermark, zero shuffle
    (each micro-batch is a projection + partitioned append).  Because
    shard assignment never depends on arrival order or batching, the
    accumulated layout is bit-identical to a batch export_shards run —
    proven by returning the read-back ``shard_manifest``, which the
    oracle recomputes from the SOURCE relation (same contract as the
    batch shard_export_manifest query)."""
    from ..sources.sinks import shard_expr, shard_manifest

    work = tempfile.mkdtemp(prefix="gp_stream_shard_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False,
        table="documents", order_col="doc_id",
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream.withColumn("shard", shard_expr("doc_id", n_shards, seed))
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .partitionBy("shard")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .queryName(query_name)
        .start()
    )
    _drive_append_query(q, src, arrivals)
    back = spark.read.parquet(sink)
    return shard_manifest(
        back, id_col="doc_id",
        extra={"n_chars_sum": F.sum("n_chars").cast("long")},
    )


def run_streaming_trending_terms(
    spark: SparkSession,
    sf_dir: str,
    window: str = "100 seconds",
    delay: str = "30 seconds",
    top_k: int = 3,
    query_name: str = "gp_stream_trending",
    n_files: int = 2,
) -> DataFrame:
    """Windowed TRENDING TERMS over a document stream — the streaming
    heavy-hitters verb (what's spiking this window?): per tumbling event-
    time window, the top-k tokens by DISTINCT-document frequency.

    All built-in operators: tokenize → explode distinct tokens (stateless
    projections) → watermarked APPEND windowed count (bounded state: only
    open windows' (token, count) pairs) → parquet sink of CLOSED windows →
    one batch row_number pass for the top-k (ranking happens outside the
    stream, where the window is complete by construction — ranking inside
    append mode would re-emit on every update).  Event time is the
    synthetic ts(doc) = _TS_EPOCH + doc_id of the near-dup harnesses, and
    the emitted set is the same pure cutoff predicate as
    run_streaming_window_counts_append: windows with end ≤ max(ts) − delay
    (the sentinel's duplicated max row lands only in the never-emitted
    final window)."""
    from ..operators.text import tokens as _tokens
    from .neardup import _TS_EPOCH

    work = tempfile.mkdtemp(prefix="gp_stream_trending_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=True,
        table="documents", order_col="doc_id",
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn(
            "_ts", F.timestamp_seconds(F.lit(_TS_EPOCH) + F.col("doc_id"))
        )
        .withWatermark("_ts", delay)
    )
    post = stream.select(
        "_ts", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("token")
    )
    agg = (
        post.groupBy(F.window("_ts", window).alias("w"), "token")
        .agg(F.count("*").alias("n_docs"))
        .select(F.col("w.start").alias("window_start"), "token", "n_docs")
    )
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    from pyspark.sql import Window as W

    closed = spark.read.schema(
        "window_start timestamp, token string, n_docs bigint"
    ).parquet(sink)
    rk = W.partitionBy("window_start").orderBy(F.desc("n_docs"), F.asc("token"))
    return (
        closed.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            F.unix_micros("window_start").alias("window_start_us"),
            "token",
            "n_docs",
            "rank",
        )
    )


def run_streaming_ingest_dedup(
    spark: SparkSession,
    sf_dir: str,
    hist_mod: int = 5,
    n_files: int = 2,
    query_name: str = "gp_stream_ingest_dedup",
    docs_transform=None,
) -> DataFrame:
    """Streaming twin of the nightly incremental-dedup verb
    (operators/dedup.py:dedup_against_history, registry twin
    ``dedup_incremental``): crawl documents ARRIVE as a stream (the
    doc_id % hist_mod == 0 slice in id-range files) and each micro-batch is
    screened against the STATIC retained history (the other slice) by
    content hash — "have we already trained on this text?" at ingest time.

    Spark shape: md5 projection → stream-static join against the history's
    DISTINCT-hash relation → survivors append to a parquet sink.  The join
    is LEFT OUTER + null filter (the supported stream-static rendering of a
    left anti; Structured Streaming does not list stream-static left_anti),
    and stream-static joins hold ZERO state — the bounded-state story is
    trivial: nothing accumulates, the history relation is a static build
    side reused every micro-batch.  Keep-first WITHIN the arriving crawl is
    the batch epilogue over the emitted log (min doc_id per hash — the
    streaming_neardup precedent: arrival racing inside a micro-batch must
    not decide which duplicate survives, the deterministic min does).
    Emits the SAME relation as dedup_incremental, so the SAME oracle
    states it."""
    work = tempfile.mkdtemp(prefix="gp_stream_ingest_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src = os.path.join(work, "src")
    os.makedirs(src)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if docs_transform is not None:
        # the registry twin threads the same planted-re-crawl fixture the
        # batch dedup_incremental states, so both emit the same relation
        docs = docs_transform(docs)
    batch = docs.filter(F.col("doc_id") % hist_mod == 0)
    history_hashes = (
        docs.filter(F.col("doc_id") % hist_mod != 0)
        .select(F.md5(F.col("text")).alias("text_hash"))
        .distinct()
        .withColumn("_hist", F.lit(True))
    )
    staged = os.path.join(work, "staged")
    batch.repartitionByRange(n_files, "doc_id").write.parquet(staged)
    arrivals = sorted(
        os.path.join(staged, f)
        for f in os.listdir(staged)
        if f.endswith(".parquet")
    )
    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .join(history_hashes, "text_hash", "left_outer")
        .filter(F.col("_hist").isNull())
        .select("doc_id", "text_hash")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .queryName(query_name)
        .start()
    )
    _drive_append_query(q, src, arrivals)
    log = spark.read.schema(stream.schema).parquet(sink)
    return log.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))


def run_streaming_asof_enrich(
    spark: SparkSession,
    sf_dir: str,
    lookback_us: int = 3_600_000_000,
    query_name: str = "gp_stream_asof_enrich",
    n_files: int = 2,
) -> DataFrame:
    """Stream-STATIC as-of enrichment — the feature-store online lookup at
    ingest time: each ARRIVING purchase is enriched with the latest view
    from a STATIC user-history snapshot within a bounded ``lookback_us``
    window.  Complements run_streaming_interval_join (stream-stream,
    stateful): here the history side is a batch relation, so the join is
    completely STATELESS — candidates emit on arrival, nothing is retained
    across micro-batches, the bounded-state question doesn't even arise.

    Plan shape: the interval_join time-bucket lowering (operators/asof.py)
    transplanted to stream-static — static views carry bucket
    floor(v_us/W); each arriving purchase explodes into its ≤2 covering
    buckets (a stateless projection); one equi-join on (user, bucket) +
    the window filter.  No inequality-join state, no per-row lookups; at
    100 TB the static side shuffles once per micro-batch plan and the
    candidate set per purchase is bounded by per-user view rate × W.

    The sink collects the candidate log; the LATEST-view pick is the batch
    epilogue ``max(struct(v_ts, view_id))`` per purchase — the same
    log-then-summarize discipline as the streaming near-dup family, so
    emission timing never races the summary.

    Output: (user_id, purchase_id, purchase_ts_us, view_id, view_ts_us) —
    one row per purchase that HAS an in-window prior view."""
    from ..sources.tables import load_events

    work = tempfile.mkdtemp(prefix="gp_stream_asof_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False
    )

    stream = normalize_event_ts(
        spark, spark.readStream.schema(schema).parquet(src)
    )
    w = lookback_us
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.unix_micros("ts").alias("p_us"),
        )
        .withColumn(
            "_bucket",
            F.explode(
                F.array(
                    F.floor(F.col("p_us") / w) - 1, F.floor(F.col("p_us") / w)
                )
            ),
        )
    )
    views = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.unix_micros("ts").alias("v_us"),
        )
        .withColumn("_bucket", F.floor(F.col("v_us") / w))
    )
    log = (
        purchases.join(
            views,
            on=[
                purchases["p_user"] == views["v_user"],
                purchases["_bucket"] == views["_bucket"],
            ],
        )
        .filter(
            (F.col("v_us") <= F.col("p_us"))
            & (F.col("v_us") > F.col("p_us") - w)
        )
        .select(
            F.col("p_user").alias("user_id"),
            "purchase_id",
            F.col("p_us").alias("purchase_ts_us"),
            "view_id",
            F.col("v_us").alias("view_ts_us"),
        )
    )
    with _state_partitions(spark):
        q = (
            log.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    out_schema = (
        "user_id bigint, purchase_id bigint, purchase_ts_us bigint,"
        " view_id bigint, view_ts_us bigint"
    )
    sunk = spark.read.schema(out_schema).parquet(sink)
    pick = F.max(F.struct("view_ts_us", "view_id")).alias("_m")
    return (
        sunk.groupBy("user_id", "purchase_id", "purchase_ts_us")
        .agg(pick)
        .select(
            "user_id",
            "purchase_id",
            "purchase_ts_us",
            F.col("_m.view_id").alias("view_id"),
            F.col("_m.view_ts_us").alias("view_ts_us"),
        )
    )


def run_streaming_quality_gate(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "gp_stream_quality_gate",
    n_files: int = 2,
    min_tokens: int = 20,
) -> DataFrame:
    """Quality gating AT INGEST — the Gopher rule conjunction evaluated on
    each micro-batch of arriving crawl documents, the filter every
    curation pipeline wants applied before a rejected document ever costs
    downstream dedup/index work.  Completes the ingest-time trio: content
    screened against history (run_streaming_ingest_dedup), enriched
    (run_streaming_asof_enrich), and now quality-gated.

    Spark shape: the flags relation (operators/text.py:gopher_rules) is a
    pure zero-shuffle projection, so the stream holds NO state, needs no
    watermark, and emits on arrival — scan -> flags -> append, the
    cheapest possible streaming plan.  Per-doc decisions land in the sink
    log (the log-then-summarize discipline: a dashboard reads decisions,
    the audit reads rates); the returned relation is the batch epilogue —
    per-source doc/keep counts, which must equal the BATCH gopher gate on
    the same corpus bit-for-bit because the projection is stateless.

    Output: (source, n_docs, n_kept, keep_rate) — one row per source."""
    from ..operators.text import gopher_rules

    work = tempfile.mkdtemp(prefix="gp_stream_quality_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False,
        table="documents", order_col="doc_id",
    )
    stream = spark.readStream.schema(schema).parquet(src)
    flags = gopher_rules(
        stream, min_tokens=min_tokens, extra_cols=("source",)
    ).select("doc_id", "source", "keep")
    q = (
        flags.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .queryName(query_name)
        .start()
    )
    _drive_append_query(q, src, arrivals)
    log = spark.read.schema("doc_id bigint, source string, keep boolean").parquet(sink)
    return log.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        F.round(
            F.sum(F.col("keep").cast("long")) / F.count("*"), 6
        ).alias("keep_rate"),
    )
