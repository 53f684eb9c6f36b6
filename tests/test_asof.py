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
