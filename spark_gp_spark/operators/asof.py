"""As-of (point-in-time) join and sessionization — operators Spark lacks
natively, composed from built-in DataFrame ops (no UDFs).

- ``asof_join``: for each left row, the most recent right row with
  ``right.ts <= left.ts`` within the same key.  Implemented with the
  union + last_value(ignore nulls) window trick: both sides are tagged and
  interleaved in time order per key, so one shuffle on the key + one sort
  within partitions produces the match — the same plan shape a native asof
  join would pick.  DuckDB's native ``ASOF JOIN`` serves as the correctness
  oracle.
- ``sessionize``: classic gap-based session ids via lag + running sum over a
  per-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left rows enriched with the nearest right row's payload.

    ``direction='backward'`` (default): latest right row with
    ``right.ts <= left.ts`` — point-in-time enrichment.
    ``direction='forward'``: earliest right row with ``right.ts >= left.ts``
    — next-event attribution.  Both match ties (DuckDB ASOF ``>=`` / ``<=``).
    ``direction='nearest'`` (pandas ``merge_asof(direction='nearest')``):
    whichever of the backward/forward matches is closer in time, ties to
    the BACKWARD row — sensor/quote alignment where the closest reading
    wins regardless of side.  Same one-shuffle plan: both directional
    window frames run over the SAME partitioning and sort order, so
    Catalyst reuses a single exchange+sort for the pair.

    ``tolerance_seconds`` (pandas ``merge_asof``-style): the match is
    nulled when the nearest qualifying row is farther than the tolerance —
    since "nearest" is already the extremal qualifying row, this is exactly
    "nearest within tolerance".  Stale point-in-time data is often worse
    than no data (feature stores cap lookback for this reason).

    ``tiebreak_col``: a right-side payload column that breaks ties among
    right rows sharing the same (key, ts) DETERMINISTICALLY (the smallest
    value wins on both sides) — without it the window's pick among
    equal-ts right rows depends on physical row order after the shuffle.
    Pass it whenever the right relation can carry duplicate timestamps
    per key (the r12 review found this latent nondeterminism; the
    nearest-view oracle ties by min view_event_id).

    Output: all left columns + ``payload_cols`` (null when no right row
    qualifies).  One shuffle on the key either way.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in payload_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas: left gets null payloads, right gets null left-columns
    left_cols = [c for c in left.columns]
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    for c in left_cols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    unioned = lt.select(*left_cols, *payload_cols, "__ts", "__side").unionByName(
        rt.select(*left_cols, *payload_cols, "__ts", "__side")
    )
    # Tie ordering makes the equal-ts right row visible to the left row's
    # window frame: backward scans the past (right first at equal ts),
    # forward scans the future (right last at equal ts).
    payload_struct = F.when(
        F.col("__side") == 0,
        F.struct(F.col("__ts").alias("__mts"), *[F.col(c) for c in payload_cols]),
    )
    # Carry the matched right row as ONE struct (non-null for every right row
    # even when its payload fields are null), then project the fields.  A
    # per-column last(ignorenulls) would skip a matched row's NULL payload and
    # substitute an older row's value — diverging from true as-of semantics
    # (DuckDB ASOF returns the matched row's NULL).
    # Deterministic tie order among right rows sharing (key, ts): the
    # backward frame takes last() -> the smallest tiebreak value must sort
    # LAST; the forward frame takes first() -> it must sort FIRST.  Left
    # rows carry a null tiebreak and are already separated by __side.
    b_tail = [F.col(tiebreak_col).desc()] if tiebreak_col else []
    f_tail = [F.col(tiebreak_col).asc()] if tiebreak_col else []
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), *b_tail)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    match_b = F.last(payload_struct, ignorenulls=True).over(wb)
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc(), *f_tail)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    match_f = F.first(payload_struct, ignorenulls=True).over(wf)
    if direction == "backward":
        match = match_b
    elif direction == "forward":
        match = match_f
    else:
        # nearest: closer of the two one-sided matches; ties (equal
        # distance) and a missing forward match resolve BACKWARD.  The two
        # window specs differ only in the __side tie column of the sort,
        # which the equal-ts tie rule needs on BOTH sides (the backward
        # frame must see an equal-ts right row, the forward frame likewise)
        # — Catalyst still plans one exchange; the second sort is a
        # partition-local re-sort of an already-sorted run.  Distances
        # compare in EXACT integer microseconds (unix_micros) — a double
        # epoch-seconds cast has ~0.5 us ulp at current epochs, enough to
        # flip the closer-side pick against the oracle's integer
        # epoch_us arithmetic (interval_join documents the same hazard).
        delta_b = F.abs(
            F.unix_micros(F.col(left_ts)) - F.unix_micros(match_b["__mts"])
        )
        delta_f = F.abs(
            F.unix_micros(F.col(left_ts)) - F.unix_micros(match_f["__mts"])
        )
        match = F.when(
            match_b.isNull(), match_f
        ).when(
            match_f.isNull() | (delta_b <= delta_f), match_b
        ).otherwise(match_f)
    filled = unioned.select(*left_cols, "__side", match.alias("__match"))
    if tolerance_seconds is None:
        in_tol = F.lit(True)
    else:
        delta = F.abs(
            F.col(left_ts).cast("double") - F.col("__match.__mts").cast("double")
        )
        in_tol = delta <= F.lit(float(tolerance_seconds))
    return filled.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.when(in_tol, F.col(f"__match.{c}")).alias(c) for c in payload_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs with the same ``key`` and
    ``right_ts - left_ts`` in ``[lower_seconds, upper_seconds]`` — the batch
    twin of a stream-stream interval join (streaming/events.py).

    A naive inequality join lowers to BroadcastNestedLoopJoin / cartesian —
    a non-starter at corpus scale.  This lowers to one EQUI-join instead:
    bucket time by ``W = upper - lower`` (right rows into bucket
    ``floor(ts/W)``, each left row into the ≤2 distinct buckets covering
    ``[ts+lower, ts+upper]``), shuffle both sides on ``(key, bucket)``, then
    apply the exact interval predicate.  Candidate blowup is ≤2× the left
    side regardless of data; tests/test_asof.py asserts the physical plan
    contains no nested-loop join.

    Output: ``key, left_cols, right_cols, us_between`` (integer
    microseconds), one row per qualifying pair (bucket candidates are
    distinct, so no dedup needed).
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    # All arithmetic in integer MICROseconds: exact (no double-epoch rounding
    # at the interval boundary, where `cast(ts as double)` is inexact).
    lo_us = int(round(lower_seconds * 1_000_000))
    hi_us = int(round(upper_seconds * 1_000_000))
    w_us = hi_us - lo_us
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    lt = left.select(
        F.col(key),
        *[F.col(c) for c in left_cols],
        l_us.alias("__lus"),
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((l_us + F.lit(lo_us)) / F.lit(w_us)),
                    F.floor((l_us + F.lit(hi_us)) / F.lit(w_us)),
                )
            )
        ).alias("__bucket"),
    )
    rt = right.select(
        F.col(key),
        *[F.col(c) for c in right_cols],
        r_us.alias("__rus"),
        F.floor(r_us / F.lit(w_us)).alias("__bucket"),
    )
    delta_us = F.col("__rus") - F.col("__lus")
    return (
        lt.join(rt, [key, "__bucket"])
        .filter((delta_us >= F.lit(lo_us)) & (delta_us <= F.lit(hi_us)))
        .select(
            key,
            *left_cols,
            *right_cols,
            delta_us.alias("us_between"),
        )
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same key exceeds ``gap_minutes``.  One shuffle on key."""
    w = Window.partitionBy(key).orderBy(F.col(ts))
    gap = F.col(ts).cast("double") - F.lag(F.col(ts)).over(w).cast("double")
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates over the sessionized stream."""
    s = sessionize(events, key, ts, gap_minutes)
    return (
        s.groupBy(key, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0), 6).alias("total_value"),
        )
    )


def gap_fill(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Time-bucketed gap filling with last-observation-carried-forward — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` verb.

    Per key, a dense spine of buckets spans that key's [min, max] bucket
    (sequence + explode — per-key bounds keep the spine linear in observed
    span, not global range × keys); observed buckets left-join on, empty
    buckets get ``n_events = 0``, and ``filled_value`` carries the last
    observed per-bucket mean forward.  Two shuffles on the key (bounds agg +
    join; the final window reuses the join's partitioning).

    Output: (key, bucket_start, n_events, bucket_value, filled_value) where
    bucket_value is NULL on gap rows and filled_value is LOCF.

    ``bucket`` must be a simple ``"<n> <unit>"`` duration (seconds/minutes/
    hours/days) — validated before it reaches ``F.expr``, since the string
    is interpolated into the INTERVAL step expression.
    """
    import re

    if not re.fullmatch(
        r"\d+ (?:microsecond|millisecond|second|minute|hour|day|week)s?", bucket
    ):
        raise ValueError(
            f"bucket {bucket!r} must be '<n> <unit>' with unit in microseconds/"
            "milliseconds/seconds/minutes/hours/days/weeks (the F.window duration"
            " grammar), e.g. '30 minutes' / '1 hour' / '2 days'"
        )
    b = F.date_trunc("hour", F.col(ts)) if bucket == "1 hour" else F.window(
        F.col(ts), bucket
    )["start"]
    observed = (
        events.select(F.col(key), b.alias("bucket_start"), F.col(value))
        .groupBy(key, "bucket_start")
        .agg(
            F.count("*").alias("n_events"),
            # exact-integer mean (r13 fold-order sweep): the value
            # quantizes per-row to 1e-6 units, the per-bucket sum is
            # exact at any partitioning, one double division on
            # identical integers in both engines
            # scale-0 close on the exact integer quotient (the sum/count
            # can land exactly on half a micro-unit; see text.doc_logprob)
            (
                F.round(
                    F.sum(F.round(F.col(value) * 1e6, 0).cast("long"))
                    / F.count("*"),
                    0,
                )
                / F.lit(1e6)
            ).alias("bucket_value"),
        )
    )
    step = F.expr(f"INTERVAL {bucket}")
    spine = (
        observed.groupBy(key)
        .agg(F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi"))
        .select(
            key,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(
                "bucket_start"
            ),
        )
    )
    joined = spine.join(observed, [key, "bucket_start"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "bucket_value",
        F.last("bucket_value", ignorenulls=True).over(w).alias("filled_value"),
    )
