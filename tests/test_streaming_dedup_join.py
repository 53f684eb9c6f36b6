"""Streaming dedup (dropDuplicatesWithinWatermark) and stream-stream
interval join vs their batch equivalents on the same data.

Both operators emit on arrival (no watermark flush), so with the staged
ts-ordered arrival protocol the sink must equal the batch result exactly.
"""

from pyspark.sql import functions as F

from spark_gp_spark.sources.tables import load_events
from spark_gp_spark.streaming.events import (
    run_streaming_dedup,
    run_streaming_interval_join,
)


def test_streaming_dedup_equals_batch_distinct(spark, sf_dir):
    got = {
        (r.user_id, r.event_type, r.hour_start)
        for r in run_streaming_dedup(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.event_type, r.hour_start)
        for r in load_events(spark, sf_dir)
        .select("user_id", "event_type", F.date_trunc("hour", "ts").alias("hour_start"))
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_interval_join_equals_batch_range_join(spark, sf_dir):
    got = {
        (r.user_id, r.purchase_id, r.view_id)
        for r in run_streaming_interval_join(spark, sf_dir, lower="30 minutes").collect()
    }
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    want = {
        (r.p_user, r.purchase_id, r.view_id)
        for r in p.join(
            v,
            F.expr("p_user = v_user AND v_ts BETWEEN p_ts - INTERVAL 30 MINUTES AND p_ts"),
        ).collect()
    }
    assert got == want


def test_streaming_asof_enrich_equals_batch_bounded_asof(spark, sf_dir):
    """The stream-static as-of enrichment (stateless time-bucketed
    equi-join + batch latest-pick epilogue) must equal the plain batch
    bounded as-of: per purchase, the latest view within 1 hour."""
    from spark_gp_spark.streaming.events import run_streaming_asof_enrich

    got = {
        (r.purchase_id, r.view_id, r.view_ts_us)
        for r in run_streaming_asof_enrich(spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.unix_micros("ts").alias("v_us"),
    )
    j = p.join(
        v,
        F.expr(
            "p_user = v_user AND v_us <= p_us AND v_us > p_us - 3600000000"
        ),
    )
    want = {
        (r.purchase_id, r["_m"].view_id, r["_m"].view_ts_us)
        for r in j.groupBy("purchase_id")
        .agg(
            F.max(
                F.struct(
                    F.col("v_us").alias("view_ts_us"),
                    F.col("view_id").alias("view_id"),
                )
            ).alias("_m")
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_quality_gate_equals_batch_gate(spark, sf_dir):
    """The ingest-time Gopher gate (stateless flags projection per
    micro-batch + per-source count epilogue) must equal the BATCH gate on
    the same corpus exactly, and both accept and reject branches must
    fire."""
    from spark_gp_spark.operators.text import gopher_rules
    from spark_gp_spark.sources.tables import load_table
    from spark_gp_spark.streaming.events import run_streaming_quality_gate

    got = {
        (r.source, r.n_docs, r.n_kept, r.keep_rate)
        for r in run_streaming_quality_gate(spark, sf_dir).collect()
    }
    flags = gopher_rules(
        load_table(spark, sf_dir, "documents"),
        min_tokens=20,
        extra_cols=("source",),
    )
    want = {
        (r.source, r.n_docs, r.n_kept, r.keep_rate)
        for r in flags.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
            F.round(
                F.sum(F.col("keep").cast("long")) / F.count("*"), 6
            ).alias("keep_rate"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
    assert any(r[2] < r[1] for r in got)   # some rejections
    assert any(r[2] > 0 for r in got)      # some survivors
