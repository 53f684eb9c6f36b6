"""Sources for the test star schema and the reference's CSV inputs.

Parquet is the default scan path (columnar, predicate pushdown, partition
pruning all free via Catalyst).  The CSV loaders mirror the reference's
headerless string-typed reads with manual casts
(regression/examples/Airfoil.scala:26-32, classification/examples/Iris.scala:18-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _widen(spark, load_events(spark, sf_dir))
    return _widen(spark, spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _widen(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Single-rowgroup parquet files scan as ONE partition, serializing every
    downstream operator.  When the scan is narrower than the cluster, insert
    one cheap round-robin exchange so per-row work parallelizes.  On real
    multi-file/multi-rowgroup tables (the 100 TB case) the scan is already
    wide and this is a no-op."""
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(parallelism, 8):
        return df.repartition(parallelism)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    Spark's vectorized reader rejects.  Read them as raw nanos
    (``nanosAsLong``) and truncate to microsecond timestamps — the same
    truncation DuckDB applies on read, so oracle comparisons stay exact."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_labeled_csv(
    spark: SparkSession, path: str, n_features: int, label_idx: int | None = None
) -> DataFrame:
    """Headerless CSV → (label double, features array<double>).

    ``label_idx`` defaults to the column after the features."""
    if label_idx is None:
        label_idx = n_features
    df = spark.read.csv(path)
    return df.select(
        F.col(f"_c{label_idx}").cast("double").alias("label"),
        F.array(*[F.col(f"_c{i}").cast("double") for i in range(n_features)]).alias("features"),
    )


def read_iris_csv(spark: SparkSession, path: str) -> DataFrame:
    """Iris CSV with the reference's species→index map (Iris.scala:16-24)."""
    name2idx = {"Iris-versicolor": 0.0, "Iris-setosa": 1.0, "Iris-virginica": 2.0}
    df = spark.read.csv(path)
    mapping = F.create_map(*[F.lit(x) for kv in name2idx.items() for x in kv])
    return df.select(
        mapping[F.col("_c4")].alias("label"),
        F.array(*[F.col(f"_c{i}").cast("double") for i in range(4)]).alias("features"),
    )
