"""Streaming foreachBatch MERGE sink: final table == batch latest-per-user."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_gp_spark.sources.tables import load_table
from spark_gp_spark.streaming.events import run_streaming_upsert

SF = "/root/testdata/sf0.001"


def test_streaming_upsert_equals_batch_latest_per_user(spark):
    out = run_streaming_upsert(spark, SF)
    got = {
        r.user_id: (r.last_type, r.last_ts, round(r.last_value, 6))
        for r in out.collect()
    }
    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r.user_id: (r.event_type, r.ts, round(r.value, 6))
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want
    # upsert table is unique per key
    assert out.count() == out.select("user_id").distinct().count()
