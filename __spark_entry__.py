"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship GP-regression query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — the full operator inventory of
spark_gp_spark (SURVEY §2 + the LLM-pipeline extension operators), each
checked against a DuckDB oracle at sf0.01 where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Gaussian Process regression on the lineitem table at
    sf0.001 — fit (BCM experts + L-BFGS hyperparameter search + projected
    process) and transform (vectorized O(m)-per-row predict)."""
    from spark_gp_spark.queries import gpr_lineitem

    return gpr_lineitem(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_gp_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spark_gp_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
