"""Incremental dedup against a historical corpus (operators/dedup.py:
dedup_against_history / neardup_against_history) — the nightly-batch
hygiene verbs: planted exact and near duplicates straddling the
history/batch split must be caught, batch-internal dups keep-first, and
the plans must never shuffle or cartesian the history side."""

from __future__ import annotations

import pytest

from spark_gp_spark.operators.dedup import (
    dedup_against_history,
    neardup_against_history,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def split_corpus(spark):
    """History ids 0..49; batch ids 100..109, all texts 12 seeded-random
    tokens over a 50-word vocab (cross-doc 3-shingle collisions are
    Jaccard ≪ 0.5 noise at worst).  Planted:
    - batch 100 = exact copy of history 3's text
    - batch 101 and 102 = identical fresh text (batch-internal dup)
    - batch 103 = history 7's text with its LAST word changed (3-shingle
      Jaccard 9/11 ≈ 0.82: a near-dup, not an exact one)
    - batch 104..109 = fresh unique texts
    """
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = [f"w{k}" for k in range(50)]
    rand_text = lambda: " ".join(rng.choice(vocab, 12).tolist())
    hist = [(i, rand_text()) for i in range(50)]
    near7 = hist[7][1].rsplit(" ", 1)[0] + " zulu"
    fresh_dup = rand_text()
    batch = [
        (100, hist[3][1]),
        (101, fresh_dup),
        (102, fresh_dup),
        (103, near7),
    ] + [(100 + i, rand_text()) for i in range(4, 10)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    return mk(batch), mk(hist)


def test_exact_incremental_dedup(split_corpus):
    batch, hist = split_corpus
    out = dedup_against_history(batch, hist)
    kept = {r.doc_id for r in out.collect()}
    assert 100 not in kept  # exact history collision dropped
    assert 101 in kept and 102 not in kept  # batch-internal keep-first
    assert 103 in kept  # near-dup is NOT an exact dup
    assert {100 + i for i in range(4, 10)} <= kept
    # appending the output to history is idempotent: a second pass over the
    # survivors (as the new batch) against history+survivors drops them all
    survivors = batch.join(out.select("doc_id"), "doc_id", "left_semi")
    again = dedup_against_history(survivors, hist.union(survivors))
    assert again.count() == 0


def test_neardup_incremental_flags(split_corpus):
    batch, hist = split_corpus
    out = neardup_against_history(batch, hist, threshold=0.5)
    flagged = {r.doc_id: r for r in out.collect()}
    assert 100 in flagged and flagged[100].dup_of == 3
    assert flagged[100].best_jaccard == 1.0  # identical shingle sets
    assert 103 in flagged and flagged[103].dup_of == 7
    assert 0.5 <= flagged[103].best_jaccard < 1.0
    # fresh docs and batch-internal dups (no HISTORY partner) are absent
    assert not ({101, 102} | {100 + i for i in range(4, 10)}) & set(flagged)


def test_incremental_plans_never_shuffle_history(split_corpus):
    batch, hist = split_corpus
    for df in (
        dedup_against_history(batch, hist),
        neardup_against_history(batch, hist),
    ):
        plan = _plan(df)
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
