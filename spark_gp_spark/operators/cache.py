"""Session-scoped persisted-relation retirement.

Several operators persist a thin multi-consumer relation (shingle
postings, value counts, norm projections) and must free the PREVIOUS
invocation's cache when a new one supersedes it — without evicting a
handle Spark's CacheManager has semantically deduplicated onto the new
plan.  ``make_cache_registry()`` returns one ``retire(new)`` closure per
call site; dedup._retire_shingle_caches pioneered the discipline and
five clones of its body had accumulated by r12 (review finding) — new
call sites should take a registry from here instead.
"""

from __future__ import annotations


def make_cache_registry():
    """A per-call-site retirement closure: ``retire(new)`` unpersists
    every previously registered frame whose plan differs from all of
    ``new`` (sameSemantics-deduplicated repeats must survive), then
    tracks ``new``.  Stale handles from a stopped SparkSession are
    ignored."""
    registry: list = []

    def retire(new: list) -> None:
        for old in registry:
            try:
                if not any(old.sameSemantics(nw) for nw in new):
                    old.unpersist()
            except Exception:
                # a stale handle from a stopped SparkSession: nothing to free
                pass
        registry.clear()
        registry.extend(new)

    return retire
