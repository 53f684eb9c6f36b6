"""Data-quality rules: one-pass fusion and per-rule counting semantics."""

from __future__ import annotations

from spark_gp_spark.operators import dq


def test_dq_report_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "A", 5.0),
            (2, 10, "B", -1.0),   # range violation
            (2, None, "A", 3.0),  # dup key + null cust
            (3, 99, "Z", 2.0),    # set violation + orphan fk
        ],
        "k bigint, cust bigint, status string, price double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "c bigint")
    rules = [
        dq.not_null("cust"),
        dq.in_range("price", 0.0, 10.0),
        dq.in_set("status", ["A", "B"]),
        dq.unique("k"),
        dq.foreign_key("cust", dim, "c"),
    ]
    out = {r.rule: r.violations for r in dq.dq_report(df, rules).collect()}
    assert out == {
        "not_null(cust)": 1,
        "in_range(price,0.0,10.0)": 1,
        "in_set(status)": 1,
        "unique(k)": 1,
        "foreign_key(cust)": 1,
    }


def test_dq_row_rules_fuse_into_one_aggregate(spark):
    df = spark.createDataFrame([(1, 2.0)], "k bigint, v double")
    rules = [dq.not_null("k"), dq.in_range("v", 0, 10), dq.unique("k")]
    plan = dq.dq_report(df, rules)._jdf.queryExecution().executedPlan().toString()
    # no union of separate scans for row-level rules: a single aggregate
    assert plan.count("Union") == 0


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "k bigint, s string"
    )
    out = {r.col: r for r in dq.profile_table(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_nulls == 0 and out["k"].n_distinct == 2
    assert out["k"].min_val == "1" and out["k"].max_val == "2"
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
