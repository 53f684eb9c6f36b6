"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join handles storage-level skew at runtime, but two patterns
still need explicit salting at 100 TB:

- ``salted_join``: a replicated-dimension join where a handful of fact keys
  dominate.  The fact side gets a uniform salt, the dimension side is
  replicated once per salt value, and the join key becomes (key, salt) — a
  hot key's rows spread over ``n_salts`` reducers.  Salt values never reach
  the output, so the result is identical to the plain join.
- ``salted_count_distinct``: exact COUNT(DISTINCT) whose per-key distinct
  sets are huge.  Distinct values are partitioned across salts by HASHING
  THE VALUE (disjoint value sets per salt), each (key, salt) cell counts
  its own distinct set, and the per-key total is the SUM of cell counts —
  exact by disjointness, with the heavy distinct state spread over
  ``n_salts`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import h32


#: join types for which salting preserves fact.join(dim, key, how) exactly:
#: the dimension side is replicated once per salt, so any variant that can
#: emit UNMATCHED dim rows (right/full outer) would emit them n_salts times.
_IDENTITY_SAFE_HOW = {
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi",
    "left_anti", "leftanti", "anti",
}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the dimension replicated per salt; result is identical
    to ``fact.join(dim, key, how)`` for row-level semantics (the salt is an
    internal column, dropped before return).

    Only fact-preserving join types are accepted: for right/full outer the
    replicated dimension would emit every unmatched dim row ``n_salts``
    times, silently diverging from the plain join — those raise."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _IDENTITY_SAFE_HOW}:
        raise ValueError(
            f"salted_join(how={how!r}) is not identity-preserving: the dim "
            "side is replicated per salt, so right/full outer joins would "
            "duplicate unmatched dim rows. Use inner/left/left_semi/left_anti."
        )
    salted_fact = fact.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(salted_dim, [key, "__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    n_salts: int = 8,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-group distinct count with the distinct state sharded by a
    hash of the VALUE (engine-portable md5 hash, so an oracle can replay the
    sharding if it cares — though the result equals a plain
    COUNT(DISTINCT) by construction)."""
    salt = (h32(F.col(distinct_col)) % n_salts).alias("__salt")
    cell = (
        df.select(group_col, F.col(distinct_col), salt)
        .groupBy(group_col, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__part"))
    )
    return cell.groupBy(group_col).agg(F.sum("__part").cast("long").alias(out_col))


def key_skew_report(
    df: DataFrame, key_cols: list[str], top_k: int = 10
) -> DataFrame:
    """Key-skew diagnostic — the relation that decides WHETHER a join/agg
    key needs salting (salted_join), a posting cap (max_band_size /
    max_posting_size), or AQE skew handling before a corpus-sized run: the
    ``top_k`` hottest keys, each with its row count, share of all rows, and
    skew factor (count ÷ mean rows per key; 1.0 = perfectly uniform).

    Output: (*key_cols, n_rows, share, skew_factor, rank), rank 1..top_k,
    ties broken on the key columns.

    Scale shape: one hash aggregate over the keys (map-side combine), a
    1-row stats aggregate broadcast back, and the top-k taken by
    ``orderBy().limit()`` — Spark compiles that to TakeOrderedAndProject
    (per-partition heaps + one k-row merge), so the corpus-sized count
    relation is never globally sorted; the rank window runs over the
    ALREADY-LIMITED k rows."""
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_total"), F.count("*").alias("_nkeys")
    )
    order = [F.desc("n_rows"), *[F.asc(k) for k in key_cols]]
    top = counts.orderBy(*order).limit(top_k)
    w = Window.orderBy(*order)
    return (
        top.join(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            # double BEFORE the multiply: n_rows·_nkeys as int64·int64
            # overflows near 9.2e18 row·keys (reachable at 100 TB).  The
            # DuckDB oracle keeps the product in BIGINT and only goes
            # DOUBLE at the division — it would raise on true int64
            # overflow rather than silently diverge, so at test scales
            # (product far below 2^63) the two engines round identically
            F.round(
                F.col("n_rows").cast("double")
                * F.col("_nkeys")
                / F.col("_total"),
                6,
            ).alias("skew_factor"),
            "rank",
        )
    )
