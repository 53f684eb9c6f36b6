"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming surface (SURVEY §2.8); the engine's other
streaming operators (events.py) are built from Spark's native stateful
primitives (windowed agg, ``session_window``).  This module adds the shape
those primitives CANNOT express: a per-key custom state machine.  The
concrete operator is gap-sessionization that tracks the set of distinct
event types per session — exact distinct aggregation is unsupported inside
Structured Streaming aggregations, so ``n_types`` genuinely requires custom
state (a per-session seen-set carried in the state row).

Scale shape: state is partitioned by key across executors (one shuffle on
``user_id``), each state row is O(1) + the distinct-type set, and sessions
are flushed by event-time timeout as the watermark passes — bounded state on
an unbounded stream, the same contract as ``session_window``.

Emission semantics (what the batch oracle states as a pure-data predicate):
- a session closed by a LATER event of the same user is emitted in the
  micro-batch that event arrives in — i.e. every non-final session per user
  is always emitted;
- a user's final session is emitted iff its event-time timeout
  (last event + gap) is strictly passed by the final watermark
  (max(ts) − delay); Spark fires event-time timeouts on the
  ``timeout < watermark`` strict inequality
  (FlatMapGroupsWithStateExec's timed-out-state scan).

The test corpus is driven with the staged-arrival + max-ts sentinel
protocol from events.py, so the final watermark is max(ts) − delay exactly
and the emitted set is a deterministic function of the data alone.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import normalize_event_ts
from .events import _drive_append_query, _staged_arrivals

SESSION_OUT_SCHEMA = (
    "session_start_us bigint, session_end_us bigint, user_id bigint, "
    "n_events bigint, n_types bigint, total_value double"
)
# state: running session of one user.  Distinct event types ride along as a
# \x1f-joined string (state rows must be flat Spark SQL types).  The value
# total accumulates in EXACT integer cents (events.value is 2-dp money by
# construction; r13 fold-order sweep) so the emitted total_value is
# independent of arrival batching and identical to the oracle's integer
# cents sum — a float accumulator here would tie the 6-dp rounding to the
# micro-batch split.
SESSION_STATE_SCHEMA = (
    "start_us bigint, last_us bigint, n bigint, total_c bigint, types string"
)

_SEP = "\x1f"


def _session_state_func(gap_us: int):
    """Build the (key, pdf_iter, state) function for applyInPandasWithState."""

    cols = [
        "session_start_us",
        "session_end_us",
        "user_id",
        "n_events",
        "n_types",
        "total_value",
    ]
    dtypes = {
        "session_start_us": "int64",
        "session_end_us": "int64",
        "user_id": "int64",
        "n_events": "int64",
        "n_types": "int64",
        "total_value": "float64",
    }

    def func(key: Tuple, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        out: list[tuple] = []

        def emit(start_us: int, last_us: int, n: int, total_c: int, types: set) -> None:
            out.append(
                (
                    int(start_us),
                    int(last_us) + gap_us,
                    user_id,
                    int(n),
                    len(types),
                    round(int(total_c) / 100.0, 6),
                )
            )

        if state.hasTimedOut:
            start_us, last_us, n, total_c, types_s = state.get
            emit(start_us, last_us, n, total_c, set(types_s.split(_SEP)))
            state.remove()
        else:
            pdf = pd.concat(list(pdf_iter), ignore_index=True)
            # normalize datetime64[ns|us] → epoch micros; sort for in-batch order
            pdf["_ts_us"] = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            pdf = pdf.sort_values(["_ts_us", "event_id"])

            if state.exists:
                start_us, last_us, n, total_c, types_s = state.get
                types = set(types_s.split(_SEP))
            else:
                start_us = None

            for ts_us, etype, value in zip(
                pdf["_ts_us"], pdf["event_type"], pdf["value"]
            ):
                if start_us is not None and ts_us - last_us > gap_us:
                    emit(start_us, last_us, n, total_c, types)
                    start_us = None
                if start_us is None:
                    start_us, last_us, n, total_c, types = ts_us, ts_us, 0, 0, set()
                last_us = ts_us
                n += 1
                # 2-dp money: v*100 is within an ulp of an integer, so the
                # tie-rule difference between python round and the engines'
                # half-away rounding can never bind
                total_c += int(round(float(value) * 100))
                types.add(str(etype))

            state.update(
                (int(start_us), int(last_us), int(n), int(total_c), _SEP.join(sorted(types)))
            )
            # flush via event-time timeout once the watermark passes the gap
            state.setTimeoutTimestamp((int(last_us) + gap_us) // 1000)

        yield pd.DataFrame(out, columns=cols).astype(dtypes)

    return func


#: shard count for the sharded session machine — bounds applyInPandasWithState
#: GROUP invocations per micro-batch (the fixed ~0.9 ms/group Arrow cost the
#: near-dup machine's sharding amortizes; ~1500 distinct users at sf0.1 →
#: ~23 users per shard, per-batch invocations drop ~23×) while per-user state
#: volume is unchanged (parallel arrays over the shard's users).
SESSION_SHARDS = 64

#: sharded state: one row per shard — parallel arrays over its live users.
SESSION_SHARD_STATE_SCHEMA = (
    "users array<bigint>, starts array<bigint>, lasts array<bigint>, "
    "ns array<bigint>, totals array<bigint>, types array<string>"
)


def _sharded_session_state_func(gap_us: int):
    """SHARDED gap-session machine: one group per ``pmod(crc32(user), S)``
    shard holding {user → (start, last, n, total_c, types)} as parallel
    state arrays.  Emission semantics are IDENTICAL to the per-user
    machine (proven by the twin-equality test + the shared oracle):

    - rows apply per user in (ts, event_id) order; a gap > ``gap_us``
      closes and emits the running session — exactly the per-user fold;
    - final-session flush rides event-time expiry: a user whose deadline
      ((last_us + gap_us) // 1000, the per-user machine's
      setTimeoutTimestamp) is STRICTLY below the watermark is emitted and
      dropped (a) on every data invocation of its shard BEFORE rows
      apply — under the staged-arrival driver the per-user engine fires
      those timeouts in the preceding no-data batch, which runs with the
      SAME watermark (the new chunk hasn't advanced it yet) — and (b) on
      the shard's own event-time timeout, armed at
      max(min live deadline, wm + 1) (the near-dup machine's late-data
      clamp), which is what flushes after the sentinel pushes the final
      watermark.  The emitted ROW is a pure function of the session
      state, so WHICH invocation emits it cannot change the sink."""

    cols = [
        "session_start_us",
        "session_end_us",
        "user_id",
        "n_events",
        "n_types",
        "total_value",
    ]
    dtypes = {
        "session_start_us": "int64",
        "session_end_us": "int64",
        "user_id": "int64",
        "n_events": "int64",
        "n_types": "int64",
        "total_value": "float64",
    }

    def func(key: Tuple, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            g = state.get
            st = {
                int(u): [int(s), int(l), int(n), int(t), set(ty.split(_SEP))]
                for u, s, l, n, t, ty in zip(g[0], g[1], g[2], g[3], g[4], g[5])
            }
        else:
            st = {}
        out: list[tuple] = []

        def emit(user_id: int, v: list) -> None:
            out.append(
                (
                    int(v[0]),
                    int(v[1]) + gap_us,
                    int(user_id),
                    int(v[2]),
                    len(v[4]),
                    round(int(v[3]) / 100.0, 6),
                )
            )

        # expire users whose event-time deadline the watermark strictly
        # passed (both on data arrival and on the shard timeout)
        expired = [u for u, v in st.items() if (v[1] + gap_us) // 1000 < wm]
        for u in expired:
            emit(u, st.pop(u))

        if not state.hasTimedOut:
            pdf = pd.concat(list(pdf_iter), ignore_index=True)
            pdf["_ts_us"] = (
                pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            )
            pdf = pdf.sort_values(["_ts_us", "event_id"])
            for user, ts_us, etype, value in zip(
                pdf["user_id"], pdf["_ts_us"], pdf["event_type"], pdf["value"]
            ):
                u = int(user)
                v = st.get(u)
                if v is not None and ts_us - v[1] > gap_us:
                    emit(u, v)
                    v = None
                if v is None:
                    v = st[u] = [ts_us, ts_us, 0, 0, set()]
                v[1] = ts_us
                v[2] += 1
                # 2-dp money (see the per-user machine): exact cents
                v[3] += int(round(float(value) * 100))
                v[4].add(str(etype))

        if st:
            users = sorted(st)
            state.update(
                (
                    users,
                    [st[u][0] for u in users],
                    [st[u][1] for u in users],
                    [st[u][2] for u in users],
                    [st[u][3] for u in users],
                    [_SEP.join(sorted(st[u][4])) for u in users],
                )
            )
            state.setTimeoutTimestamp(
                max(min((v[1] + gap_us) // 1000 for v in st.values()), wm + 1)
            )
        elif state.exists:
            state.remove()

        yield pd.DataFrame(out, columns=cols).astype(dtypes)

    return func


def stateful_session_stats(events: DataFrame, gap: str = "30 minutes",
                           delay: str = "1 hour",
                           sharded: bool = True) -> DataFrame:
    """Gap sessions with exact distinct-type counts over a (streaming) events
    frame — ``applyInPandasWithState`` custom state machine.  Default is the
    SHARDED machine (one group per user-hash shard — r13; the per-group
    Arrow invocation cost with ~unique user keys dominated the entry);
    ``sharded=False`` keeps the per-user state machine as the parity twin
    the sharded one is tested against."""
    gap_us = _duration_us(gap)
    if sharded:
        sharded_in = events.withColumn(
            "_shard",
            F.pmod(F.crc32(F.col("user_id").cast("string")), F.lit(SESSION_SHARDS)),
        )
        return (
            sharded_in.withWatermark("ts", delay)
            .groupBy("_shard")
            .applyInPandasWithState(
                _sharded_session_state_func(gap_us),
                outputStructType=SESSION_OUT_SCHEMA,
                stateStructType=SESSION_SHARD_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="EventTimeTimeout",
            )
        )
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_state_func(gap_us),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def _duration_us(s: str) -> int:
    qty, unit = s.split()
    mult = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
    }[unit]
    return int(qty) * mult


def run_stateful_session_stats(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    query_name: str = "gp_stream_stateful_sessions",
    n_files: int = 2,
    sharded: bool = True,
) -> DataFrame:
    """Drive the events parquet through the custom stateful operator with the
    staged-arrival + sentinel protocol (events.py) into a parquet sink."""
    work = tempfile.mkdtemp(prefix="gp_stream_stateful_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(spark, sf_dir, work, n_files)

    stream = normalize_event_ts(
        spark, spark.readStream.schema(schema).parquet(src)
    ).select("ts", "event_id", "user_id", "event_type", "value")
    out = stateful_session_stats(stream, gap=gap, sharded=sharded)
    from .events import _state_partitions

    with _state_partitions(spark):
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    return spark.read.parquet(sink)
