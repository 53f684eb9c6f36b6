"""Embedding compression: per-dimension scalar quantization (int8-style).

At 100 TB the embedding column is typically the single largest thing in the
lake; 8-bit scalar quantization cuts it 4× (float32 → uint8 codes) with
near-lossless retrieval quality, and is the standard first rung of the
vector-compression ladder (below product quantization).  No reference
counterpart (the reference is a GP library, /root/reference); this is a
north-star extension operator over the `embeddings` table.

Plan shape (scale-first):
- per-dimension min/max = ONE global aggregate of 2·d partially-aggregated
  expressions — map-side combine, a single-row result, no wide shuffle;
- the tiny (2, d) stats vector returns to the driver and re-enters the plan
  as LITERAL arrays (same broadcast discipline as the GP active set);
- quantize / dequantize / reconstruction error are pure column expressions
  (transform / aggregate over zipped arrays) — whole-stage codegen, zero
  Python, zero shuffle.

Min/max (rather than mean/std) calibration keeps the DuckDB oracle exact:
extrema are summation-order-insensitive, so both engines compute identical
scales and hence identical integer codes bit-for-bit.  `floor(x + 0.5)` is
the rounding on both sides — Spark's `round` (HALF_UP) and DuckDB's `round`
(banker's in some builds) disagree on ties, `floor` never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vector_dim(df: DataFrame, vec_col: str) -> int:
    """Fallback dimension probe — costs one tiny Spark job (first());
    callers on the hot path should pass ``dim`` explicitly instead."""
    return len(df.select(vec_col).first()[0])


def dim_min_max(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus as two driver-side lists.

    One job, O(1) plan expressions at ANY dimension: ``Summarizer`` folds
    the whole vector per row into one (min, max) vector pair with map-side
    partial aggregation.  (The previous 2·d named-aggregate form compiled
    thousands of expressions at modern embedding dims of 1-4k.)  min/max
    are summation-order-insensitive, so the DuckDB-oracle parity of the
    downstream integer codes is unaffected.  ``dim`` is accepted for API
    compatibility; the vector width is discovered by the aggregate itself.
    """
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    v = array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    row = (
        df.select(v.alias("_v"))
        .select(Summarizer.metrics("min", "max").summary(F.col("_v")).alias("s"))
        .select(F.col("s.min").alias("mn"), F.col("s.max").alias("mx"))
        .first()
    )
    mins = [float(x) for x in row["mn"]]
    maxs = [float(x) for x in row["mx"]]
    if dim is not None and len(mins) != dim:
        raise ValueError(f"vector width {len(mins)} != declared dim {dim}")
    return mins, maxs


def scalar_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
    dim: int | None = None,
    stats: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Per-dimension scalar quantization with reconstruction error.

    code_i = floor((v_i − min_i) · levels / (max_i − min_i) + 0.5), an
    integer in [0, levels]; constant dimensions (max == min) code to 0 and
    reconstruct to their constant.  Output:

    - ``id_col``
    - ``qvec``: array<int> codes (the 4×-smaller stored representation)
    - ``mse``: mean squared reconstruction error over dimensions (round 9)
    - ``max_abs_err``: worst-dimension absolute error (round 9)

    Everything after the one stats aggregate is a zero-shuffle projection.
    """
    if stats is None:
        stats = dim_min_max(df, vec_col, dim)
    mins, maxs = stats
    d = len(mins)
    mn = F.array(*[F.lit(m) for m in mins])
    scale = F.array(
        *[
            F.lit((maxs[i] - mins[i]) / levels if maxs[i] > mins[i] else 0.0)
            for i in range(d)
        ]
    )
    v = F.col(vec_col)
    # zip (value, min, scale) per dimension; scale == 0 marks constant dims
    zipped = F.arrays_zip(
        F.transform(v, lambda x: x.cast("double")).alias("x"),
        mn.alias("mn"),
        scale.alias("sc"),
    )
    code = F.transform(
        zipped,
        lambda s: F.when(s["sc"] > 0.0, F.floor((s["x"] - s["mn"]) / s["sc"] + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    staged = df.select(F.col(id_col), zipped.alias("_z"), code.alias("qvec"))
    err = F.zip_with(
        "_z",
        "qvec",
        lambda s, q: s["x"] - (s["mn"] + q.cast("double") * s["sc"]),
    )
    return staged.select(
        id_col,
        "qvec",
        F.round(
            F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e * e) / F.lit(float(d)),
            9,
        ).alias("mse"),
        F.round(
            F.array_max(F.transform(err, F.abs)),
            9,
        ).alias("max_abs_err"),
    )
