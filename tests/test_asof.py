"""As-of join semantics tests, including the NULL-payload case: a matched
right row whose payload is NULL must yield NULL (DuckDB ASOF semantics), not
an older row's non-null payload."""

from __future__ import annotations

from datetime import datetime

from spark_gp_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_matched_row_null_payload_is_preserved(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 08:00:00"), 7.0),   # older, non-null payload
            (10, _ts("2024-01-01 09:00:00"), None),  # the match — NULL payload
        ],
        "user_id bigint, view_ts timestamp, view_value double",
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="view_ts",
        payload_cols=["view_value"],
    ).collect()
    assert len(out) == 1
    assert out[0]["view_value"] is None  # not 7.0 from the older row


def test_asof_no_preceding_row_gives_nulls(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 07:00:00"))], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:00:00"), 7.0)],
        "user_id bigint, view_ts timestamp, view_value double",
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="view_ts",
        payload_cols=["view_value"],
    ).collect()
    assert len(out) == 1 and out[0]["view_value"] is None


def test_asof_tie_matches_equal_timestamp(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 09:00:00"))], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:00:00"), 5.0)],
        "user_id bigint, view_ts timestamp, view_value double",
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="view_ts",
        payload_cols=["view_value"],
    ).collect()
    assert out[0]["view_value"] == 5.0


def test_asof_tolerance_nulls_stale_matches(spark):
    from spark_gp_spark.operators.asof import asof_join
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(9), "near"), (1, t(5), "far")], "k long, rts timestamp, tag string"
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["tag"], tolerance_seconds=120,
    )
    got = {r.ts.minute: r.tag for r in out.collect()}
    # ts=10 matches rts=9 (60s <= 120s); ts=30's nearest is rts=9 (21 min) -> null
    assert got[10] == "near"
    assert got[30] is None


# ---------------------------------------------------------------------------
# interval_join (batch bucketed interval self-join)


def test_interval_join_matches_naive_inequality_join(spark):
    rows = [
        # user 1: views at 10:00, 10:30; purchases at 10:20, 11:05, 12:30
        (1, 10, _ts("2024-01-01 10:00:00"), "view"),
        (2, 10, _ts("2024-01-01 10:30:00"), "view"),
        (3, 10, _ts("2024-01-01 10:20:00"), "purchase"),
        (4, 10, _ts("2024-01-01 11:05:00"), "purchase"),
        (5, 10, _ts("2024-01-01 12:30:00"), "purchase"),
        # user 2: boundary case — purchase exactly 1h after the view
        (6, 20, _ts("2024-01-01 09:00:00"), "view"),
        (7, 20, _ts("2024-01-01 10:00:00"), "purchase"),
        # user 3: purchase before the view (no match)
        (8, 30, _ts("2024-01-01 09:00:00"), "view"),
        (9, 30, _ts("2024-01-01 08:59:00"), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string"
    )
    from spark_gp_spark.operators.asof import interval_join

    views = ev.filter("event_type = 'view'").select(
        "user_id", ev.event_id.alias("view_id"), ev.ts.alias("v_ts")
    )
    purch = ev.filter("event_type = 'purchase'").select(
        "user_id", ev.event_id.alias("purchase_id"), ev.ts.alias("p_ts")
    )
    out = interval_join(
        views, purch, key="user_id", left_ts="v_ts", right_ts="p_ts",
        lower_seconds=0, upper_seconds=3600,
        left_cols=["view_id"], right_cols=["purchase_id"],
    )
    got = {(r.view_id, r.purchase_id, r.us_between) for r in out.collect()}
    naive = (
        views.join(purch, "user_id")
        .filter("p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 3600 SECONDS")
        .selectExpr("view_id", "purchase_id", "unix_micros(p_ts) - unix_micros(v_ts) AS us")
    )
    want = {(r.view_id, r.purchase_id, r.us) for r in naive.collect()}
    assert got == want
    # the 1h-boundary pair must be included (closed interval)
    assert (6, 7, 3600 * 1_000_000) in got


def test_interval_join_plan_has_no_nested_loop(spark):
    from spark_gp_spark.operators.asof import interval_join

    ev = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    out = interval_join(
        ev.selectExpr("user_id", "event_id AS view_id", "ts AS v_ts"),
        ev.selectExpr("user_id", "event_id AS purchase_id", "ts AS p_ts"),
        key="user_id", left_ts="v_ts", right_ts="p_ts",
        lower_seconds=0, upper_seconds=3600,
        left_cols=["view_id"], right_cols=["purchase_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# gap_fill (dense spine + LOCF)


def test_gap_fill_spine_zero_fill_and_locf(spark):
    from spark_gp_spark.operators.asof import gap_fill

    rows = [
        (1, 10, _ts("2024-01-01 10:15:00"), 4.0),
        (2, 10, _ts("2024-01-01 10:45:00"), 6.0),   # hour 10: avg 5.0
        (3, 10, _ts("2024-01-01 13:30:00"), 9.0),   # hours 11, 12 are gaps
        (4, 20, _ts("2024-01-01 09:00:00"), 1.0),   # single-bucket key
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    out = {
        (r.user_id, r.bucket_start.hour): (r.n_events, r.bucket_value, r.filled_value)
        for r in gap_fill(ev).collect()
    }
    assert len(out) == 5  # hours 10-13 for user 10, hour 9 for user 20
    assert out[(10, 10)] == (2, 5.0, 5.0)
    assert out[(10, 11)] == (0, None, 5.0)  # gap: zero events, LOCF value
    assert out[(10, 12)] == (0, None, 5.0)
    assert out[(10, 13)] == (1, 9.0, 9.0)
    assert out[(20, 9)] == (1, 1.0, 1.0)


def test_gap_fill_non_hour_bucket(spark):
    # exercises the F.window + INTERVAL-step branch (the '1 hour' fast path
    # uses date_trunc instead)
    from spark_gp_spark.operators.asof import gap_fill

    rows = [
        (1, 10, _ts("2024-01-01 10:05:00"), 4.0),   # bucket 10:00
        (2, 10, _ts("2024-01-01 11:40:00"), 8.0),   # bucket 11:30; 3 gaps between
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    out = {
        (r.bucket_start.hour, r.bucket_start.minute): (r.n_events, r.filled_value)
        for r in gap_fill(ev, bucket="30 minutes").collect()
    }
    assert out == {
        (10, 0): (1, 4.0),
        (10, 30): (0, 4.0),
        (11, 0): (0, 4.0),
        (11, 30): (1, 8.0),
    }


def test_gap_fill_rejects_malformed_bucket(spark):
    import pytest

    from spark_gp_spark.operators.asof import gap_fill

    ev = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"), 1.0)],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="bucket"):
        gap_fill(ev, bucket="1 hour); DROP TABLE x; --")


def test_asof_nearest_picks_closer_side(spark):
    """direction='nearest' (pandas merge_asof third direction): whichever
    one-sided match is closer in time wins — a backward as-of would pick
    the stale 08:00 row here even though 10:05 is 55 minutes nearer."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 08:00:00"), 7.0),   # backward, 2 h away
            (10, _ts("2024-01-01 10:05:00"), 9.0),   # forward, 5 min away
        ],
        "user_id bigint, view_ts timestamp, view_value double",
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="view_ts",
        payload_cols=["view_value"], direction="nearest",
    ).collect()
    assert len(out) == 1
    assert out[0]["view_value"] == 9.0


def test_asof_nearest_tie_resolves_backward(spark):
    """Equal distance both sides -> the BACKWARD row wins (the documented
    tie rule, matched by the oracle's side-preference sort key)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:30:00"), 7.0),   # 30 min before
            (10, _ts("2024-01-01 10:30:00"), 9.0),   # 30 min after
        ],
        "user_id bigint, view_ts timestamp, view_value double",
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="view_ts",
        payload_cols=["view_value"], direction="nearest",
    ).collect()
    assert out[0]["view_value"] == 7.0


def test_asof_nearest_one_sided_and_no_match(spark):
    """A left row with only-forward candidates matches forward; a key with
    no right rows at all yields NULL payload (the branch the registry
    fixture cannot exercise — every purchase user there has views)."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # only forward rows exist
            (2, 99, _ts("2024-01-01 10:00:00")),  # no right rows for user 99
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 12:00:00"), 5.0)],
        "user_id bigint, view_ts timestamp, view_value double",
    )
    out = {
        r["event_id"]: r["view_value"]
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="view_ts",
            payload_cols=["view_value"], direction="nearest",
        ).collect()
    }
    assert out[1] == 5.0
    assert out[2] is None


def test_asof_nearest_tolerance_nulls_far_matches(spark):
    """tolerance composes with nearest: the closest row is still too far."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 11:00:00"), 5.0)],
        "user_id bigint, view_ts timestamp, view_value double",
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="view_ts",
        payload_cols=["view_value"], direction="nearest",
        tolerance_seconds=600,
    ).collect()
    assert out[0]["view_value"] is None


def test_asof_nearest_microsecond_margin_and_id_ties(spark):
    """Two r12-review hazards, locked: (a) the closer-side pick compares
    EXACT integer microseconds — a view 1 us after beats a view 2 us
    before, where a double epoch-seconds cast (ulp ~0.5 us at 2024
    epochs) could round both deltas equal and pick backward; (b) two
    right rows at the IDENTICAL (key, ts) resolve to the smallest
    tiebreak value deterministically, under any input partitioning."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 10, 0, 0, 500000)
    left = spark.createDataFrame(
        [(1, 10, base)], "event_id bigint, user_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, base - datetime.timedelta(microseconds=2), 100, 7.0),
            (10, base + datetime.timedelta(microseconds=1), 200, 9.0),
        ],
        "user_id bigint, view_ts timestamp, view_event_id bigint,"
        " view_value double",
    )
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="view_ts",
        payload_cols=["view_event_id", "view_value"], direction="nearest",
        tiebreak_col="view_event_id",
    ).collect()
    assert out[0]["view_event_id"] == 200  # 1 us forward beats 2 us back

    dup = spark.createDataFrame(
        [
            (10, base, 300, 1.0),
            (10, base, 250, 2.0),
            (10, base, 400, 3.0),
        ],
        "user_id bigint, view_ts timestamp, view_event_id bigint,"
        " view_value double",
    )
    for parts in (1, 2, 5):
        out = asof_join(
            left, dup.repartition(parts), key="user_id", left_ts="ts",
            right_ts="view_ts", payload_cols=["view_event_id", "view_value"],
            direction="nearest", tiebreak_col="view_event_id",
        ).collect()
        assert out[0]["view_event_id"] == 250, parts  # min id wins, always
