"""Streaming MinHash-LSH near-dup: the custom bucket-min state machine must
match across micro-batches (doc arrives long after its near-duplicate)."""

from spark_gp_spark.streaming.neardup import run_streaming_neardup


def test_streaming_neardup_matches_within_and_across_batches(spark, tmp_path):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely unrelated text about spark streaming state"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),   # dup of 0, same batch
        (3, "third distinct document mentioning entirely other things"),
        (4, "completely unrelated text about spark streaming state"),  # dup of 1, NEXT batch
        (5, "the quick brown fox jumps over the lazy dog today"),      # near-dup of 0, next batch
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "corpus")
    docs.coalesce(1).write.parquet(src + "/documents.parquet")

    out = run_streaming_neardup(spark, src, n_files=2)
    got = {r.doc_id: r.dup_of for r in out.collect()}
    # same-batch exact dup
    assert got[2] == 0
    # cross-batch matches: docs 4 and 5 arrive in the second file, their
    # earliest colliders (1 and 0) in the first — state must carry over
    assert got[4] == 1
    assert got[5] == 0
    # non-duplicates never emit
    assert 1 not in got and 3 not in got and 0 not in got


def test_streaming_neardup_ttl_expires_cold_buckets(spark, tmp_path):
    """With a processing-time TTL, a bucket idle past the deadline is
    dropped, so a later exact duplicate of an expired document emits
    NOTHING — the bounded-state recall trade, exercised end to end.

    Driving note: with ProcessingTimeTimeout the stateful operator reports
    shouldRunAnotherBatch unconditionally, so the engine spins no-data
    micro-batches and ``processAllAvailable`` never returns — progress is
    polled via recentProgress instead (same caveat documented on
    streaming_neardup_matches)."""
    import os
    import shutil
    import time

    from spark_gp_spark.streaming.events import _state_partitions
    from spark_gp_spark.streaming.neardup import (
        NEARDUP_OUT_SCHEMA,
        streaming_neardup_matches,
    )

    t_dup = "the quick brown fox jumps over the lazy dog tonight"
    batches = [
        [(0, t_dup),
         (1, "completely unrelated text about spark streaming state")],
        # the TTL no-data batches fire the timeout for batch 0's cold
        # buckets on their own; this batch just adds unrelated churn
        [(2, "third distinct document mentioning entirely other things")],
        # exact dup of 0 — its bucket state has expired, so no emission
        [(3, t_dup)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    matches = streaming_neardup_matches(stream, ttl_ms=100)
    with _state_partitions(spark):
        q = (
            matches.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def wait_input_rows(expected_total: int, timeout_s: float = 120.0) -> None:
        # recentProgress can report the SAME batchId twice (an early 0-row
        # snapshot, then the real one) — keep the max per batch
        t0, per_batch = time.time(), {}
        while time.time() - t0 < timeout_s:
            for p in q.recentProgress:
                b = p["batchId"]
                per_batch[b] = max(per_batch.get(b, 0), p["numInputRows"])
            total = sum(per_batch.values())
            if total >= expected_total:
                return
            time.sleep(0.2)
        raise AssertionError(
            f"only {sum(per_batch.values())}/{expected_total} rows processed"
        )

    try:
        fed = 0
        for i, rows in enumerate(batches):
            if i:
                time.sleep(1.0)  # let the 100 ms TTL deadline pass
            df = spark.createDataFrame(rows, "doc_id long, text string")
            staged = str(tmp_path / f"b{i}")
            df.coalesce(1).write.parquet(staged)
            part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))
            shutil.copy(
                os.path.join(staged, part),
                os.path.join(src, f"arrival-{i:04d}.parquet"),
            )
            fed += len(rows)
            wait_input_rows(fed)
    finally:
        q.stop()
    log = spark.read.schema(NEARDUP_OUT_SCHEMA).parquet(sink)
    got = {r.doc_id: r.dup_of for r in log.collect()}
    assert got == {}, f"expired bucket still matched: {got}"


def test_streaming_neardup_event_time_ttl_expiry(spark, tmp_path):
    """EVENT-time TTL: a bucket expires when the WATERMARK passes its last
    event time + ttl — a pure function of the data and batch boundaries,
    so the test needs no wall-clock sleeps and no recentProgress polling:
    EventTimeTimeout only reruns batches while the watermark advances, so
    ``processAllAvailable`` terminates normally.

    Scenario (ttl = 500 ms of EVENT time, watermark delay 0):
    - batch 0: doc 0 (dup-bait, t=10 s), doc 1 (unrelated, t=11 s)
    - batch 1: doc 2 (unrelated churn, t=11.4 s) → watermark advances to
      11 s: bucket(doc 0) deadline 10.5 s < 11 s fires (expired); bucket
      (doc 1) deadline 11.5 s survives
    - batch 2: doc 3 = exact dup of doc 0 (t=30 s) → its bucket state is
      GONE, no emission; doc 4 = exact dup of doc 1 (t=30 s) → bucket
      alive, emits dup_of=1.
    """
    import os
    import shutil

    from spark_gp_spark.streaming.events import _state_partitions
    from spark_gp_spark.streaming.neardup import (
        NEARDUP_OUT_SCHEMA,
        streaming_neardup_matches,
    )

    t_dup = "the quick brown fox jumps over the lazy dog tonight"
    t_keep = "completely unrelated text about spark streaming state"
    base = 1_700_000_000
    batches = [
        [(0, t_dup, base + 10.0), (1, t_keep, base + 11.0)],
        [(2, "third distinct document mentioning entirely other things",
          base + 11.4)],
        [(3, t_dup, base + 30.0), (4, t_keep, base + 30.0)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    matches = streaming_neardup_matches(stream, ttl_ms=500, ts_col="ts")
    with _state_partitions(spark):
        q = (
            matches.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
    try:
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(
                [(d, t, __import__("datetime").datetime.fromtimestamp(
                    ts, __import__("datetime").timezone.utc)) for d, t, ts in rows],
                schema,
            )
            staged = str(tmp_path / f"b{i}")
            df.coalesce(1).write.parquet(staged)
            part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))
            shutil.copy(
                os.path.join(staged, part),
                os.path.join(src, f"arrival-{i:04d}.parquet"),
            )
            q.processAllAvailable()
    finally:
        q.stop()
    log = spark.read.schema(NEARDUP_OUT_SCHEMA).parquet(sink)
    got = {r.doc_id: r.dup_of for r in log.collect()}
    assert got == {4: 1}, f"expected only the surviving bucket to match: {got}"


def test_streaming_embedding_neardup_across_batches(spark, tmp_path):
    """Vector twin of the MinHash state machine: an exact-duplicate
    embedding arriving in a LATER batch must match its earlier original
    (state carries across micro-batches), and the emitted dup_of is the
    EARLIEST collider."""
    import numpy as np

    from spark_gp_spark.streaming.neardup import run_streaming_embedding_neardup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(6, 16))
    vecs = {i: base[i] for i in range(6)}
    vecs[6] = base[2].copy()          # exact dup of 2, lands in file 2
    vecs[7] = base[2].copy()          # second dup -> earliest collider still 2
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(src + "/embeddings.parquet")

    # bits=12: a random pair collides in one table w.p. 0.5^12 (~0.2%
    # across 8 tables), while the identical planted vectors share EVERY
    # bucket — so the earliest collider is the planted original (seed
    # fixed, fully deterministic)
    out = run_streaming_embedding_neardup(spark, src, dim=16, bits=12, n_files=2)
    got = {r.vec_id: r.dup_of for r in out.collect()}
    assert got[6] == 2
    assert got[7] == 2
    assert 0 not in got and 1 not in got and 2 not in got


def test_streaming_embedding_neardup_event_time_ttl(spark, tmp_path):
    """Event-time TTL on the VECTOR state machine: a bucket whose
    watermark-relative deadline passes is dropped, so a later exact
    duplicate of the expired vector emits nothing while a still-live
    bucket matches — same contract as the MinHash variant, driven without
    sleeps or polling."""
    import datetime as dt
    import os
    import shutil

    import numpy as np

    from spark_gp_spark.streaming.events import _state_partitions
    from spark_gp_spark.streaming.neardup import (
        NEARDUP_OUT_SCHEMA,
        streaming_embedding_neardup_matches,
    )

    rng = np.random.default_rng(9)
    v_expire = [float(x) for x in rng.normal(size=16)]
    v_keep = [float(x) for x in rng.normal(size=16)]
    v_churn = [float(x) for x in rng.normal(size=16)]
    base = 1_700_000_000
    batches = [
        [(0, v_expire, base + 10.0), (1, v_keep, base + 11.0)],
        [(2, v_churn, base + 11.4)],   # advances watermark to 11 s: bucket(0)
                                       # deadline 10.5 s fires, bucket(1) lives
        [(3, v_expire, base + 30.0), (4, v_keep, base + 30.0)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<double>, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(src)
    matches = streaming_embedding_neardup_matches(
        stream, dim=16, bits=12, ttl_ms=500, ts_col="ts"
    )
    with _state_partitions(spark):
        q = (
            matches.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
    try:
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(
                [(d, v, dt.datetime.fromtimestamp(ts, dt.timezone.utc))
                 for d, v, ts in rows],
                schema,
            )
            staged = str(tmp_path / f"b{i}")
            df.coalesce(1).write.parquet(staged)
            part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))
            shutil.copy(
                os.path.join(staged, part),
                os.path.join(src, f"arrival-{i:04d}.parquet"),
            )
            q.processAllAvailable()
    finally:
        q.stop()
    log = spark.read.schema(NEARDUP_OUT_SCHEMA).parquet(sink)
    got = {r.doc_id: r.dup_of for r in log.collect()}
    assert got == {4: 1}, f"expected only the surviving bucket to match: {got}"


def test_state_func_late_batch_never_moves_deadline_backwards():
    """ADVICE r6: a micro-batch containing only LATE (older-event-time) rows
    must not shrink the bucket's expiry deadline.  The state tuple carries
    the bucket's RUNNING max event time, so the deadline after a late batch
    still derives from the earlier (newer) timestamp.  Driven with a fake
    GroupState — no streaming query needed."""
    import pandas as pd

    from spark_gp_spark.streaming.neardup import _make_neardup_state_func

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self.get = None
            self.deadlines = []

        def update(self, tup):
            self.exists = True
            self.get = tup

        def remove(self):
            self.exists = False

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            self.deadlines.append(ms)

    ttl_ms = 10_000
    func = _make_neardup_state_func(ttl_ms, event_time=True)
    state = FakeState()

    def batch(ids, ts_seconds):
        return [pd.DataFrame({
            "_id": pd.Series(ids, dtype="int64"),
            "_ts": pd.to_datetime(pd.Series(ts_seconds), unit="s"),
        })]

    # batch 1: event time 100s -> deadline 100_000 + ttl
    list(func(("b", "k"), iter(batch([5], [100])), state))
    assert state.deadlines[-1] == 100_000 + ttl_ms
    assert state.get == (5, 100_000)
    # batch 2: ONLY late rows (event time 40s) -> deadline must NOT regress
    list(func(("b", "k"), iter(batch([7], [40])), state))
    assert state.deadlines[-1] == 100_000 + ttl_ms
    assert state.get == (5, 100_000)
    # batch 3: newer event time advances the deadline again
    list(func(("b", "k"), iter(batch([9], [200])), state))
    assert state.deadlines[-1] == 200_000 + ttl_ms
    assert state.get == (5, 200_000)


def test_streaming_neardup_expiry_fires_and_matches_session_oracle(spark, sf_dir):
    """The dual assertion from the SURVEY worked design: the expiry entry's
    output must (1) DIFFER from the no-TTL banding oracle on a NONEMPTY set
    — proof GroupState EventTimeTimeout actually fired inside the official
    registry harness, not just in a synthetic fixture — and (2) match the
    bucket-session oracle exactly (the driver re-checks (2) at sf0.01; this
    gates it at the test scale too)."""
    import duckdb

    from spark_gp_spark.queries import (
        _STREAM_NEARDUP_EXPIRY_SQL,
        _STREAM_NEARDUP_SQL,
        streaming_neardup_expiry,
    )

    got = streaming_neardup_expiry(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    session_oracle = con.execute(_STREAM_NEARDUP_EXPIRY_SQL).df()
    no_ttl_oracle = con.execute(_STREAM_NEARDUP_SQL).df()

    got_map = dict(zip(got["doc_id"], got["dup_of"]))
    assert got_map == dict(
        zip(session_oracle["doc_id"], session_oracle["dup_of"])
    )
    no_ttl_map = dict(zip(no_ttl_oracle["doc_id"], no_ttl_oracle["dup_of"]))
    assert got_map != no_ttl_map, "TTL produced no observable expiry"
    # the difference must include at least one SUPPRESSED emission (a doc
    # whose only prior collider expired) — the unambiguous expiry signature
    assert set(no_ttl_map) - set(got_map), "no emission was suppressed by expiry"


def test_streaming_neardup_join_matches_state_machine_and_oracle(spark, sf_dir):
    """The JVM-native stream-stream join twin (staged for r10) must emit
    the exact relation of the custom-state machine and the shared no-TTL
    banding oracle."""
    import duckdb

    from spark_gp_spark.queries import _STREAM_NEARDUP_SQL, streaming_neardup_join

    got = {
        r.doc_id: r.dup_of
        for r in streaming_neardup_join(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = dict(
        con.execute(_STREAM_NEARDUP_SQL).df()[["doc_id", "dup_of"]].itertuples(
            index=False, name=None
        )
    )
    assert got == want and want


class _FakeShardState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self.get = None
        self.deadlines = []
        self.wm = 0

    def update(self, tup):
        self.exists = True
        self.get = tup

    def remove(self):
        self.exists = False

    def getCurrentWatermarkMs(self):
        return self.wm

    def setTimeoutTimestamp(self, ms):
        self.deadlines.append(ms)


def _shard_batch(rows):
    """rows: list of (id, bucket, ts_seconds)."""
    import pandas as pd

    return [pd.DataFrame({
        "_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "_bkt": pd.Series([r[1] for r in rows], dtype="object"),
        "_ts": pd.to_datetime(pd.Series([r[2] for r in rows]), unit="s"),
    })]


def _shard_dict(state):
    g = state.get
    return {b: (m, l, d) for b, m, l, d in zip(g[0], g[1], g[2], g[3])}


def test_sharded_state_late_batch_never_moves_deadline_backwards():
    """The per-bucket deadline clamp of the old machine, replicated per
    bucket inside the shard: a late-only batch must not regress a bucket's
    deadline, and the shard's group timeout arms at the min live deadline."""
    from spark_gp_spark.streaming.neardup import _make_sharded_neardup_state_func

    ttl = 10_000
    func = _make_sharded_neardup_state_func(ttl, event_time=True)
    state = _FakeShardState()
    list(func((1,), iter(_shard_batch([(5, "A", 100)])), state))
    assert _shard_dict(state)["A"] == (5, 100_000, 100_000 + ttl)
    # late rows only (older event time): deadline stays
    list(func((1,), iter(_shard_batch([(7, "A", 40)])), state))
    assert _shard_dict(state)["A"] == (5, 100_000, 100_000 + ttl)
    # newer event time advances it
    list(func((1,), iter(_shard_batch([(9, "A", 200)])), state))
    assert _shard_dict(state)["A"] == (5, 200_000, 200_000 + ttl)
    assert state.deadlines[-1] == 200_000 + ttl


def test_sharded_state_prunes_expired_bucket_on_other_buckets_data():
    """Prune-on-data: once the watermark strictly passes bucket A's
    deadline, ANY invocation of its shard drops A — so A's later re-arrival
    emits fresh (no dup_of), exactly when the per-bucket machine's timeout
    would have removed it in the preceding timeout-only batch.  A bucket at
    deadline == watermark (non-strict) must SURVIVE."""
    from spark_gp_spark.streaming.neardup import _make_sharded_neardup_state_func

    ttl = 10_000
    func = _make_sharded_neardup_state_func(ttl, event_time=True)
    state = _FakeShardState()
    out = list(func((1,), iter(_shard_batch([(5, "A", 100), (6, "B", 100)])), state))
    assert len(out[0]) == 0
    # watermark exactly AT A's deadline: strict rule -> survives
    state.wm = 100_000 + ttl
    out = list(func((1,), iter(_shard_batch([(20, "B", 300)])), state))
    d = _shard_dict(state)
    assert "A" in d and d["B"][0] == 6
    assert [tuple(r) for r in out[0].itertuples(index=False)] == [(20, 6)]
    # watermark strictly past A's deadline: pruned on B's data
    state.wm = 100_000 + ttl + 1
    list(func((1,), iter(_shard_batch([(30, "B", 400)])), state))
    assert "A" not in _shard_dict(state)
    # A's re-arrival starts a fresh session: no emission against old min 5
    out = list(func((1,), iter(_shard_batch([(40, "A", 500)])), state))
    assert len(out[0]) == 0
    assert _shard_dict(state)["A"][0] == 40


def test_sharded_state_group_timeout_prunes_and_rearms():
    from spark_gp_spark.streaming.neardup import _make_sharded_neardup_state_func

    ttl = 10_000
    func = _make_sharded_neardup_state_func(ttl, event_time=True)
    state = _FakeShardState()
    list(func((1,), iter(_shard_batch([(5, "A", 100), (6, "B", 500)])), state))
    # group timeout with wm past A's deadline but not B's: A pruned, shard
    # survives, re-armed at B's deadline
    state.wm = 100_000 + ttl + 1
    state.hasTimedOut = True
    out = list(func((1,), iter([]), state))
    assert len(out[0]) == 0
    assert state.exists and list(_shard_dict(state)) == ["B"]
    assert state.deadlines[-1] == 500_000 + ttl
    # group timeout with everything expired: state removed entirely
    state.wm = 500_000 + ttl + 1
    out = list(func((1,), iter([]), state))
    assert not state.exists


def test_streaming_neardup_join_bounded_matches_oracle_and_evicts(spark, sf_dir):
    """The bounded-horizon join variant (VERDICT r10 next #3) must (a) emit
    exactly the horizon-scoped relation — dup_of(d) = min earlier partner
    within 200 event-time seconds sharing >= 1 band — and (b) actually
    EVICT prior-side state as the watermark advances (numRowsRemoved > 0):
    sf0.001 spans ids 0..499 over 2 arrival batches, so after batch 1 the
    watermark sits ~249 and priors below ~49 fall outside every future
    row's [n_ts-200, n_ts) window."""
    import duckdb

    from spark_gp_spark.queries import (
        _STREAM_NEARDUP_BOUNDED_SQL,
        streaming_neardup_join_bounded,
    )
    from spark_gp_spark.streaming import neardup as N

    got = {
        r.doc_id: r.dup_of
        for r in streaming_neardup_join_bounded(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = dict(
        con.execute(_STREAM_NEARDUP_BOUNDED_SQL)
        .df()[["doc_id", "dup_of"]]
        .itertuples(index=False, name=None)
    )
    assert got == want
    assert N.LAST_JOIN_STATE_METRICS["horizon_s"] == 200
    assert N.LAST_JOIN_STATE_METRICS["num_rows_removed"] > 0
