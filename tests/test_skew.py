"""Salting utilities: results must be identical to the unsalted plans."""

from pyspark.sql import functions as F

from spark_gp_spark.operators import skew as K


def test_salted_join_equals_plain_join(spark):
    # skewed fact: 90% of rows share key 0
    fact = spark.range(2000).select(
        (F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50)).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val"))
    plain = {(r.k, r.fact_id, r.dim_val) for r in fact.join(dim, "k").collect()}
    salted = {(r.k, r.fact_id, r.dim_val) for r in K.salted_join(fact, dim, "k").collect()}
    assert salted == plain and len(plain) == 2000


def test_salted_count_distinct_exact(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 257).alias("v")
    )
    plain = {
        r.g: r.n for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {
        r.g: r.n_distinct
        for r in K.salted_count_distinct(df, "g", "v", n_salts=8).collect()
    }
    assert salted == plain
    # the salted plan spreads distinct state across (g, salt) cells
    cells = (
        df.select("g", (F.col("v") % 8).alias("s")).distinct().count()
    )
    assert cells > len(plain)  # more cells than groups → state is sharded


def test_salted_join_rejects_non_identity_how(spark):
    import pytest

    fact = spark.range(10).select(F.col("id").alias("k"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "right_outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="not identity-preserving"):
            K.salted_join(fact, dim, "k", how=how)
    # left family still accepted
    assert K.salted_join(fact, dim, "k", how="left_semi").count() == 10


def test_salted_distinct_plan_spreads_state(spark):
    from spark_gp_spark.queries import event_distinct_users_salted

    plan = (
        event_distinct_users_salted(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the first-level distinct state must be hash-spread over (type, salt)
    assert "__salt" in plan
    assert "hashpartitioning(event_type" in plan
