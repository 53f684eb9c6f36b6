"""Sources for the test star schema and the reference's CSV inputs.

Parquet is the default scan path (columnar, predicate pushdown, partition
pruning all free via Catalyst).  The CSV loaders mirror the reference's
headerless string-typed reads with manual casts
(regression/examples/Airfoil.scala:26-32, classification/examples/Iris.scala:18-24).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: Dimension tables are broadcast-joined by every consumer — widening them
#: would add a shuffle that AQE then has to undo.
_DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

#: Tables whose consumers run EXPENSIVE per-row work straight off the scan
#: (tokenize → shingle → MinHash regex chains on documents; Arrow-batched
#: vector math on embeddings).  Only these get the single-file widening
#: exchange below: for the cheap-per-row fact tables (lineitem, orders,
#: events — decimal arithmetic, timestamps, case/when) the round-robin
#: exchange moves every full row once to save per-row work worth less than
#: the move, and their downstream aggregates/joins/windows re-parallelize
#: at their first natural shuffle anyway.  Measured at sf0.1 (r13, warm
#: A/B): orders_dq_report 1.0-1.4 -> 0.75 s, session_stats 0.8,
#: asof_purchases_views 1.1 -> 0.83, orders_upsert_merge 1.2 -> 0.81
#: without the widen.  ``lineitem`` STAYS widened: its hot consumers
#: (revenue_rollup and friends) immediately shuffle all 600 k rows into a
#: fact-fact join, and the widen is what parallelizes that shuffle's map
#: side (rollup regressed 1.7-2.6 -> 2.5-3.5 s when lineitem lost it).
#: At production scale (directory inputs) the widen is a no-op either
#: way, so this only removes a local-harness artifact where it was a net
#: loss.
_WIDEN_TABLES = frozenset({"documents", "embeddings", "lineitem"})


#: Catalyst's InferFiltersFromGenerate turns every `explode(expr)` into an
#: extra `size(expr) > 0 AND expr IS NOT NULL` filter and PUSHES it through
#: projects down to the scan side.  For this engine's generates the exploded
#: expression is an expensive higher-order chain (tokenize → n-gram shingles,
#: MinHash bands, LSH buckets), so the inference (a) re-evaluates the whole
#: chain a second time per row and (b) lands it BELOW the widening exchange,
#: where a single-file scan runs it on ONE task.  Measured on the sf0.1
#: contamination scan: 24.2 s with the rule, 0.85 s without (28×) — this was
#: the r7 "plan-identical 16× session degradation" (VERDICT r7 #2): whether
#: the duplicated filter ran single-task depended on whether the corpus
#: relation happened to be cached (a cache materializes post-exchange), which
#: shifted with stage order — not a codegen pathology.  The rule's upside
#: (pruning rows with empty arrays before a shuffle) never applies here:
#: documents virtually always have ≥ 1 shingle and the generates sit before
#: broadcast joins, so the exclusion is engine-wide session hygiene, set
#: once like the nanosAsLong conf in load_events.
_INFER_FROM_GENERATE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def exclude_infer_filters_from_generate(spark: SparkSession) -> None:
    cur = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    if not cur:
        spark.conf.set("spark.sql.optimizer.excludedRules", _INFER_FROM_GENERATE)
    elif _INFER_FROM_GENERATE not in cur:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules", f"{cur},{_INFER_FROM_GENERATE}"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    exclude_infer_filters_from_generate(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = load_events(spark, sf_dir) if name == "events" else spark.read.parquet(path)
    return _widen(spark, df, name, path)


def _widen(spark: SparkSession, df: DataFrame, name: str, path: str) -> DataFrame:
    """Single-file single-rowgroup parquet scans as ONE partition, serializing
    every downstream operator.  For tables whose consumers do expensive
    per-row work straight off the scan (``_WIDEN_TABLES``), insert one cheap
    round-robin exchange so that work parallelizes; for cheap-per-row fact
    tables the exchange costs more than it saves (see ``_WIDEN_TABLES``).
    Real production tables are directories of many files — the scan is
    already wide and this is a no-op.  Decided from the filesystem layout,
    not ``df.rdd`` (which would build a Python RDD conversion on every
    load)."""
    if name not in _WIDEN_TABLES:
        return df
    if os.path.isfile(path):
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with a normalized TIMESTAMP ``ts`` column.

    The corpus has shipped ``ts`` in two encodings across generations:
    TIMESTAMP(NANOS) (which Spark's vectorized reader only surfaces as raw
    longs via ``nanosAsLong``) and plain TIMESTAMP(MICROS) / TIMESTAMP_NTZ.
    Both are normalized to microsecond-instant timestamps whose
    ``unix_micros`` equals DuckDB's ``epoch_us`` on the same file, so oracle
    comparisons stay exact regardless of the file's encoding.

    ``nanosAsLong`` is a session SQLConf (Spark exposes no per-reader
    option for it); it is set once and only when missing, rather than
    mutated on every load."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(spark, raw)


def normalize_event_ts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Normalize an events frame's ``ts`` to TimestampType UTC instants.

    - BIGINT (legacy nanos-as-long read): truncate nanos → micros, exactly
      the truncation DuckDB applies on read.
    - TIMESTAMP_NTZ (native micros parquet): reinterpret the naive value as
      UTC.  The session timezone is pinned to UTC first so the NTZ→TIMESTAMP
      cast is a pure reinterpretation — ``unix_micros(ts)`` then equals
      DuckDB's ``epoch_us`` of the same naive value.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


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
