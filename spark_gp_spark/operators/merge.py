"""Batch MERGE (upsert): apply a changes relation onto a base relation.

The lakehouse write-path verb (Delta/Iceberg ``MERGE INTO``) as a plain
DataFrame composition: rows present in ``updates`` replace their base rows
(matched → update), rows only in ``updates`` are appended (not matched →
insert), all other base rows pass through.  Deletes are the ``tombstone``
variant: an updates row carrying a tombstone marker removes the key.

Scale shape: ONE shuffle — a full-outer equi-join on the key (AQE handles
skew); no window, no driver state.  With both sides bucketed on the key
(sources/sinks.py:write_bucketed) even that exchange disappears.

No reference counterpart (the reference is a GP library, /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key``.

    Schemas must match (minus the optional ``tombstone_col``, which only
    ``updates`` carries; a TRUE tombstone deletes the key).  A matched
    update row replaces its base row WHOLESALE (``WHEN MATCHED THEN UPDATE
    SET *`` semantics — update NULLs win, they are not coalesced away);
    unmatched update rows insert; untouched base rows pass through.

    ``updates`` must be unique per ``key`` (the MERGE precondition engines
    enforce with "multiple source rows matched" errors) — deduplicate
    upstream (e.g. latest-wins via dedup_keep_first / a window) first;
    duplicate update keys here would fan out the join.
    """
    cols = [c for c in base.columns if c != key]
    u = updates
    if tombstone_col is None:
        u = u.withColumn("__dead", F.lit(False))
    else:
        u = u.withColumnRenamed(tombstone_col, "__dead").withColumn(
            "__dead", F.coalesce(F.col("__dead"), F.lit(False))
        )
    u = u.select(
        F.col(key),
        F.col("__dead"),
        *[F.col(c).alias(f"__u_{c}") for c in cols],
    )
    joined = base.join(u, key, "full_outer")
    merged = joined.filter(
        F.col("__dead").isNull() | ~F.col("__dead")
    ).select(
        key,
        *[
            F.when(F.col("__dead").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in cols
        ],
    )
    return merged


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    fingerprint,
) -> DataFrame:
    """Snapshot-to-snapshot DIFF — the crawl-over-crawl audit verb: classify
    every key across two corpus versions as ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, content fingerprint moved) or
    ``unchanged``.  The input to incremental re-processing decisions: only
    added ∪ changed re-enter the pipeline, removed tombstones downstream
    artifacts.

    ``fingerprint`` is a Column expression evaluated on BOTH sides (e.g.
    ``F.md5("text")``) — content identity, not row identity.

    Scale shape: each side reduces to (key, fingerprint) at the scan (two
    narrow projections), then ONE full-outer sort-merge join on the key —
    the same single-shuffle discipline as merge_upsert; with both snapshots
    bucketed on the key the exchange disappears.  No window, no driver
    state, output one row per key in either snapshot."""
    o = old.select(F.col(key), fingerprint.alias("_fp_old"))
    n = new.select(F.col(key), fingerprint.alias("_fp_new"))
    return (
        o.join(n, key, "full_outer")
        .select(
            key,
            F.when(F.col("_fp_old").isNull(), F.lit("added"))
            .when(F.col("_fp_new").isNull(), F.lit("removed"))
            .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
