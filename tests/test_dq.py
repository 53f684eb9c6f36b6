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
    out = {r.col: r for r in dq.profile_table(df, ["k", "s"], exact=True).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_nulls == 0 and out["k"].n_distinct == 2
    assert out["k"].min_val == "1" and out["k"].max_val == "2"
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2


def test_profile_table_approx_default(spark):
    # HLL++ is exact at tiny cardinalities; the point here is the API default
    # and that the approx plan has NO Expand node (exact multi-distinct
    # multiplies the scan by the number of distinct aggregates)
    df = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(100)], "k bigint, s string"
    )
    prof = dq.profile_table(df, ["k", "s"])  # exact defaults to False
    out = {r.col: r for r in prof.collect()}
    assert out["k"].n_rows == 100
    assert abs(out["k"].n_distinct - 100) <= 5  # rsd=0.05
    assert abs(out["s"].n_distinct - 7) <= 1
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        dq.profile_table(df, ["k", "s"], exact=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # documents exactly what approx avoids


def test_rule_no_generated_eq():
    # eq=False: a generated __eq__/__hash__ over the Column field would raise
    r1, r2 = dq.not_null("a"), dq.not_null("a")
    assert (r1 == r2) is False and (r1 == r1) is True  # identity, not field eq
    assert len({r1, r2}) == 2  # hashable


def test_approx_percentiles_close_to_exact(spark):
    import math

    df = spark.createDataFrame(
        [(("a" if i % 2 else "b"), float(i)) for i in range(1000)], "g string, v double"
    )
    approx = {
        r.g: (r.p50, r.p99)
        for r in dq.approx_percentiles(df, "v", [0.5, 0.99], ["g"]).collect()
    }
    exact = {
        r.g: (r.p50, r.p99)
        for r in dq.approx_percentiles(df, "v", [0.5, 0.99], ["g"], exact=True).collect()
    }
    for g in ("a", "b"):
        # GK with accuracy 10k on n=500 is rank-exact; exact is interpolated,
        # so allow one inter-element step of slack
        assert math.isclose(approx[g][0], exact[g][0], abs_tol=2.5)
        assert math.isclose(approx[g][1], exact[g][1], abs_tol=2.5)
    # ungrouped path + column naming
    row = dq.approx_percentiles(df, "v", [0.25]).first()
    assert abs(row.p25 - 249.75) < 3
