"""MERGE upsert semantics: update-replaces-wholesale, insert, tombstone."""

from __future__ import annotations

from spark_gp_spark.operators.merge import merge_upsert


def test_merge_upsert_update_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k bigint, s string, v bigint"
    )
    updates = spark.createDataFrame(
        [
            (2, "B", None, False),   # matched: replace wholesale (NULL v wins)
            (3, None, None, True),   # tombstone: delete key 3
            (9, "z", 90, False),     # not matched: insert
        ],
        "k bigint, s string, v bigint, dead boolean",
    )
    out = {r.k: (r.s, r.v) for r in merge_upsert(base, updates, "k", "dead").collect()}
    assert out == {1: ("a", 10), 2: ("B", None), 9: ("z", 90)}


def test_merge_without_tombstones(spark):
    base = spark.createDataFrame([(1, "a")], "k bigint, s string")
    updates = spark.createDataFrame([(1, "A"), (2, "b")], "k bigint, s string")
    out = {r.k: r.s for r in merge_upsert(base, updates, "k").collect()}
    assert out == {1: "A", 2: "b"}
