"""Slowly-changing-dimension (type 2) history from a change log.

The standard lakehouse CDC pattern: an append-only change log (one row per
observed state of an entity) becomes a versioned dimension with
``valid_from`` / ``valid_to`` intervals and consecutive no-change rows
compressed away.  Downstream point-in-time joins against the result are
exactly ``operators/asof.py:asof_join``.

No reference counterpart (the reference is a GP library, /root/reference);
this is a north-star extension operator.

Scale shape: ONE shuffle on the entity key; both window passes (change
detection, then interval assignment over the compressed rows) share the same
partitioning, so the second pass re-sorts within partitions but never
re-shuffles.  No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str,
    ts: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Compress a change log into SCD2 validity intervals.

    For each ``key``, order observations by ``ts`` (then ``tiebreak`` for
    deterministic total order on ts ties), drop rows whose ``attr_cols`` all
    equal the previous observation's, and emit one row per retained version:

    - all of ``key``, ``attr_cols``
    - ``valid_from``: the version's observation time
    - ``valid_to``: the next version's time (NULL for the current version)
    - ``version``: 1-based version number per key
    - ``is_current``: valid_to IS NULL

    NULL attribute values compare as equal to NULL (SQL ``IS DISTINCT
    FROM`` semantics), matching what a MERGE-based SCD2 pipeline does.
    """
    order_cols = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    state = F.struct(*[F.col(c) for c in attr_cols])
    # null-safe "state changed since previous row" (first row always changes)
    prev = F.lag(state).over(w)
    changed = prev.isNull() | ~prev.eqNullSafe(state)
    compressed = (
        df.withColumn("__chg", changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    w2 = Window.partitionBy(key).orderBy(*order_cols)
    return compressed.select(
        key,
        *attr_cols,
        F.col(ts).alias("valid_from"),
        F.lead(F.col(ts)).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead(F.col(ts)).over(w2).isNull().alias("is_current"),
    )
