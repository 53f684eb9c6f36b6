"""SCD2 change-log compression semantics."""

from __future__ import annotations

from datetime import datetime

from spark_gp_spark.operators.scd import scd2_history


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_scd2_compresses_and_versions(spark):
    rows = [
        (1, 10, _ts("2024-01-01 10:00:00"), "A"),
        (2, 10, _ts("2024-01-01 11:00:00"), "A"),  # no change — compressed away
        (3, 10, _ts("2024-01-01 12:00:00"), "B"),  # change
        (4, 10, _ts("2024-01-01 13:00:00"), "A"),  # change back — new version
        (5, 20, _ts("2024-01-01 09:00:00"), "X"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, status string"
    )
    out = scd2_history(
        df, key="user_id", ts="ts", attr_cols=["status"], tiebreak="event_id"
    )
    got = sorted(
        (r.user_id, r.version, r.status, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    )
    assert got == [
        (10, 1, "A", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"), False),
        (10, 2, "B", _ts("2024-01-01 12:00:00"), _ts("2024-01-01 13:00:00"), False),
        (10, 3, "A", _ts("2024-01-01 13:00:00"), None, True),
        (20, 1, "X", _ts("2024-01-01 09:00:00"), None, True),
    ]


def test_scd2_null_attr_is_not_a_change(spark):
    rows = [
        (1, 10, _ts("2024-01-01 10:00:00"), None),
        (2, 10, _ts("2024-01-01 11:00:00"), None),  # NULL == NULL: compressed
        (3, 10, _ts("2024-01-01 12:00:00"), "B"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, status string"
    )
    out = scd2_history(
        df, key="user_id", ts="ts", attr_cols=["status"], tiebreak="event_id"
    ).collect()
    assert len(out) == 2


def test_scd2_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"), "A")],
        "event_id bigint, user_id bigint, ts timestamp, status string",
    )
    out = scd2_history(
        df, key="user_id", ts="ts", attr_cols=["status"], tiebreak="event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both window passes share the user_id partitioning: exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1
