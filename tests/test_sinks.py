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


# ---------------------------------------------------------------------------
# z-order layout


def test_zorder_key_is_bijective_interleave(spark):
    from pyspark.sql import functions as F

    from spark_gp_spark.sources.sinks import zorder_key

    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 128, 65535)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    out = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=16).alias("z")
    ).collect()
    for r in out:
        # de-interleave: even bit positions rebuild a, odd rebuild b
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)
    zs = {r.z for r in out}
    assert len(zs) == len(rows)  # injective on the grid


def test_write_zordered_files_cover_disjoint_key_ranges(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from spark_gp_spark.sources.sinks import write_zordered, zorder_key

    rng = random.Random(7)
    rows = [(i, rng.randrange(1 << 12), rng.randrange(1 << 12)) for i in range(5000)]
    df = spark.createDataFrame(rows, "row_id bigint, x bigint, y bigint")
    zc = zorder_key([F.col("x"), F.col("y")], bits=12)
    path = str(tmp_path / "zordered")
    write_zordered(df, path, zc, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 5000
    spans = (
        back.withColumn("z", zorder_key([F.col("x"), F.col("y")], bits=12))
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    assert len(spans) == 8
    ordered = sorted((r.lo, r.hi) for r in spans)
    for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
        assert hi1 <= lo2  # range partitioning: files are disjoint in z


def test_export_shards_one_file_per_shard_and_manifest(spark, tmp_path):
    """export_shards writes one parquet file per shard directory, shard
    assignment is a pure function of the id (stable under input
    repartitioning), and the read-back manifest equals the manifest
    computed directly on the source — the content proof."""
    from spark_gp_spark.sources.sinks import export_shards, shard_expr, shard_manifest

    docs = spark.createDataFrame(
        [(i, f"text {i}", 10 * i) for i in range(400)],
        "doc_id bigint, text string, n_chars bigint",
    )
    path = str(tmp_path / "shards")
    export_shards(docs, path, n_shards=8, id_col="doc_id", seed=3)

    # one file per shard dir
    import glob

    for d in glob.glob(f"{path}/shard=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d

    back = spark.read.parquet(path)
    assert back.count() == 400

    got = {
        r.shard: (r.n_rows, r.id_checksum)
        for r in shard_manifest(back, id_col="doc_id").collect()
    }
    src = docs.withColumn("shard", shard_expr("doc_id", 8, 3))
    want = {
        r.shard: (r.n_rows, r.id_checksum)
        for r in shard_manifest(src, id_col="doc_id").collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == 400
    assert len(got) == 8  # 400 hashed docs hit all 8 shards

    # pure function of the id: a different input layout cannot move rows
    moved = docs.repartition(13).withColumn("shard", shard_expr("doc_id", 8, 3))
    assert {
        r.shard: r.n_rows for r in shard_manifest(moved).collect()
    } == {k: v[0] for k, v in want.items()}


def test_compact_partitioned_heals_small_files(spark, tmp_path):
    """The full maintenance loop: a dataset written under a tiny 16-row
    cap fragments into many small files (the audit shows it); compacting
    to a 128-row cap heals the layout to exactly the predicted
    ceil(n/128) files per partition value, verified by re-running the
    SAME audit on the compacted copy."""
    from spark_gp_spark.sources.sinks import (
        compact_partitioned,
        storage_layout_report,
        write_layout_controlled,
    )

    rows = [(i, "a") for i in range(300)] + [(i, "b") for i in range(40)]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string")
    frag, healed = str(tmp_path / "frag"), str(tmp_path / "healed")
    write_layout_controlled(df, frag, "event_type", 16)
    before = {
        r["event_type"]: r
        for r in storage_layout_report(spark, frag, "event_type", 16).collect()
    }
    assert before["a"]["n_files"] == 19  # ceil(300/16): fragmented
    compact_partitioned(spark, frag, healed, "event_type", 128)
    after = {
        r["event_type"]: r
        for r in storage_layout_report(
            spark, healed, "event_type", 128
        ).collect()
    }
    assert after["a"]["n_rows"] == 300 and after["a"]["n_files"] == 3
    assert (after["a"]["min_file_rows"], after["a"]["max_file_rows"]) == (44, 128)
    assert after["b"]["n_files"] == 1 and after["b"]["small_files"] == 1


def test_parallel_layout_write_matches_serial_layout(spark, tmp_path):
    """The order_col (parallel) strategy of write_layout_controlled must
    produce the exact audited layout the serial one-task-per-value
    strategy does — ceil(n/cap) files, cap-row fulls plus one n%cap
    remainder per value — while actually spreading a hot value over more
    than one write task.  Values chosen to cover: multiple full groups +
    remainder (a), exact multiple of cap (b), fewer rows than cap (c)."""
    from spark_gp_spark.sources.sinks import (
        storage_layout_report,
        write_layout_controlled,
    )

    rows = (
        [(i, "a") for i in range(1000)]       # 7 full files + 104 remainder
        + [(i, "b") for i in range(256)]      # exactly 2 full files
        + [(i, "c") for i in range(37)]       # single sub-cap file
    )
    df = spark.createDataFrame(rows, "event_id bigint, event_type string")
    serial, par = str(tmp_path / "serial"), str(tmp_path / "par")
    write_layout_controlled(df, serial, "event_type", 128)
    write_layout_controlled(df, par, "event_type", 128, order_col="event_id")

    audit = lambda p: sorted(
        tuple(r) for r in storage_layout_report(
            spark, p, "event_type", 128
        ).collect()
    )
    got, want = audit(par), audit(serial)
    assert got == want
    by_type = {t[0]: t for t in got}
    assert by_type["a"][2] == 8 and by_type["a"][3] == 104   # n_files, min
    assert by_type["b"][2] == 2 and by_type["b"][3] == 128
    assert by_type["c"][2] == 1 and by_type["c"][3] == 37

    # the parallel path really parallelizes: the hot value's 8 file
    # groups spread over >1 task => >1 distinct written file would hold
    # them even if tasks were merged; assert the physical task spread via
    # the exchange in the plan (hash on value AND file group, not value
    # alone)
    import os

    a_files = [
        f for f in os.listdir(os.path.join(par, "event_type=a"))
        if f.endswith(".parquet")
    ]
    task_ids = {f.split("-")[1] for f in a_files}  # part-<task>-<uuid>...
    assert len(task_ids) > 1, task_ids

    # row content survives the regrouped write byte-for-byte
    back = spark.read.parquet(par).groupBy().sum("event_id").first()[0]
    assert back == sum(r[0] for r in rows)
