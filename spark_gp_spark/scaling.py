"""Feature standardization as a single declarative pass.

Parity: util/Scaling.scala:9-26 — z-scale the feature columns (population
variance, zero-variance dimensions mapped to 1 so they divide by 1), labels
passed through untouched.  The reference needs two RDD reduce passes plus a
positional zip; here one ``agg`` computes every mean/variance JVM-side and the
transform is a codegen'd column expression — no shuffle, no zip, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scale_features(df: DataFrame, features_col: str = "features") -> DataFrame:
    """Returns df with ``features_col`` replaced by its z-scaled version."""
    d = df.select(F.size(features_col).alias("d")).first()["d"]
    stats = df.agg(
        *[F.avg(F.col(features_col)[i]).alias(f"m{i}") for i in range(d)],
        *[F.var_pop(F.col(features_col)[i]).alias(f"v{i}") for i in range(d)],
    ).first()
    means = [float(stats[f"m{i}"]) for i in range(d)]
    # var == 0 → divide by 1 (Scaling.scala:18)
    stds = [float(stats[f"v{i}"]) ** 0.5 if stats[f"v{i}"] and stats[f"v{i}"] > 0 else 1.0 for i in range(d)]
    scaled = F.array(
        *[((F.col(features_col)[i] - F.lit(means[i])) / F.lit(stds[i])) for i in range(d)]
    )
    return df.withColumn(features_col, scaled)
