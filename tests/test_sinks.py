"""Sink-layout guarantees: bucketed joins run without a shuffle, and
directory partitions prune at scan time."""

import os

import pytest
from pyspark.sql import functions as F

from spark_gp_spark.sources.sinks import read_bucketed, write_bucketed, write_partitioned
from spark_gp_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.select("l_orderkey", "l_extendedprice"),
        "lineitem_b",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    # at sf0.001 the tables are broadcast-size; forbid broadcast so the plan
    # is the sort-merge join a fact-fact join takes at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            read_bucketed(spark, "orders_b")
            .join(
                read_bucketed(spark, "lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle: the only exchange allowed is the
        # one the final (non-bucketed) groupBy introduces
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part
        # cross-check against the plain-parquet plan, which must shuffle
        plain = (
            orders.join(
                lineitem.select("l_orderkey", "l_extendedprice"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plain
        # and the answer is unchanged vs the unbucketed join
        expected = (
            orders.join(
                lineitem.select("l_orderkey", "l_extendedprice"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_dir, "events")
    write_partitioned(events, out, ["event_type"])

    types = [r[0] for r in spark.read.parquet(out).select("event_type").distinct().collect()]
    assert len(types) > 1
    # directory layout: one subdir per type
    subdirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(subdirs) == len(types)

    one = spark.read.parquet(out).filter(F.col("event_type") == types[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan.replace("#", " #").replace(
        "event_type #", "event_type#"
    ) or "PartitionFilters" in plan
    # pruned scan reads only the matching partition's rows
    n_all = spark.read.parquet(out).count()
    n_one = one.count()
    assert 0 < n_one < n_all
