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
