"""Training-data selection operators (operators/selection.py): SemDeDup and
DSIR — semantic gates (brute-force numpy replay of the keep rule; weight
ordering responds to target-likeness and multiplicity) plus the physical-plan
properties the 100 TB shape relies on (cell equi-join only; broadcast
log-ratio table)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
TAU = 0.35


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def semdedup_result(spark):
    from spark_gp_spark.operators.ivf import train_centroids_from_parquet
    from spark_gp_spark.operators.selection import semdedup
    from spark_gp_spark.queries import _IVF_K, _IVF_SAMPLE, _IVF_SEED, load_table

    cents = train_centroids_from_parquet(
        f"{SF}/embeddings.parquet", _IVF_K, _IVF_SEED, _IVF_SAMPLE
    )
    emb = load_table(spark, SF, "embeddings")
    out = semdedup(emb, cents, tau=TAU).toPandas()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    return out, vecs, cents


def test_semdedup_matches_bruteforce_replay(semdedup_result):
    """Exact replay of the paper's upper-triangular rule per cell: item i is
    dropped iff some earlier item j (farther from the centroid, ties by id)
    of the SAME cell has round(cos(i, j), 6) >= tau."""
    out, vecs, cents = semdedup_result
    assert len(out) == len(vecs)

    d2 = {
        vid: ((v[None, :] - cents) ** 2).sum(axis=1) for vid, v in vecs.items()
    }
    for vid, row in zip(out["vec_id"], out.itertuples()):
        assert row.cell == int(np.argmin(d2[vid])) + 1

    by_cell = {}
    for row in out.itertuples():
        by_cell.setdefault(row.cell, []).append(row.vec_id)
    for cell, ids in by_cell.items():
        order = sorted(ids, key=lambda i: (-d2[i].min(), i))
        kept_map = dict(zip(out["vec_id"], out["keep"]))
        for pos, i in enumerate(order):
            prior_cos = [
                round(
                    float(
                        vecs[i] @ vecs[j]
                        / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j]))
                    ),
                    6,
                )
                for j in order[:pos]
            ]
            expect_keep = not prior_cos or max(prior_cos) < TAU
            assert kept_map[i] == expect_keep, (cell, i)


def test_semdedup_monotone_in_tau(spark, semdedup_result):
    from spark_gp_spark.operators.selection import semdedup
    from spark_gp_spark.queries import load_table

    _, _, cents = semdedup_result
    emb = load_table(spark, SF, "embeddings")
    lo = semdedup(emb, cents, tau=0.25).toPandas()
    hi = semdedup(emb, cents, tau=0.45).toPandas()
    kept_lo = set(lo[lo["keep"]]["vec_id"])
    kept_hi = set(hi[hi["keep"]]["vec_id"])
    assert kept_lo < kept_hi  # higher tau keeps strictly more on this data


def test_semdedup_plan_is_cell_equijoin_only(spark, semdedup_result):
    from spark_gp_spark.operators.selection import semdedup
    from spark_gp_spark.queries import load_table

    _, _, cents = semdedup_result
    plan = _plan(semdedup(load_table(spark, SF, "embeddings"), cents, tau=TAU))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_orders_by_target_likeness(spark):
    """Docs written in the target slice's vocabulary outscore docs written
    in the off-target vocabulary; repeating a target-distinctive token
    raises the weight (weights are multiset sums)."""
    from spark_gp_spark.operators.selection import dsir_doc_weights

    rows = (
        [Row(doc_id=i, text="alpha beta gamma", lang="en") for i in range(20)]
        + [Row(doc_id=100 + i, text="delta epsilon zeta", lang="fr") for i in range(20)]
        + [
            Row(doc_id=200, text="alpha beta gamma", lang="fr"),
            Row(doc_id=201, text="delta epsilon zeta", lang="fr"),
            Row(doc_id=202, text="alpha beta gamma alpha beta gamma", lang="fr"),
            Row(doc_id=203, text="alpha beta gamma", lang="fr"),
        ]
    )
    df = spark.createDataFrame(rows)
    w = dsir_doc_weights(df, F.col("lang") == "en", buckets=256, alpha=1.0)
    got = {r["doc_id"]: r["weight"] for r in w.collect()}
    assert len(got) == len(rows)
    assert got[200] > got[201]  # target-vocab doc beats off-target doc
    assert got[202] > got[203]  # multiplicity compounds the evidence


def test_dsir_logratio_is_broadcast_and_single_token_docs_safe(spark):
    from spark_gp_spark.operators.selection import (
        dsir_doc_weights,
        unigram_bigram_feats,
    )

    df = spark.createDataFrame(
        [Row(doc_id=0, text="solo", lang="en"), Row(doc_id=1, text="a b", lang="fr")]
    )
    feats = df.select(unigram_bigram_feats(F.col("text")).alias("f")).collect()
    assert feats[0]["f"] == ["solo"]  # no descending-sequence bigram artifact
    assert feats[1]["f"] == ["a", "b", "a b"]

    plan = _plan(dsir_doc_weights(df, F.col("lang") == "en", buckets=64))
    assert "BroadcastHashJoin" in plan  # the ≤buckets-row log-ratio join
    assert "CartesianProduct" not in plan


def test_dsir_registry_topk_never_ranks_full_corpus(spark):
    """The global top-k is TakeOrdered (orderBy+limit); the rank window runs
    over the already-reduced k rows, so no corpus-sized single-partition
    exchange appears below the limit."""
    from spark_gp_spark.queries import _DSIR_TOPK, dsir_select

    df = dsir_select(spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    out = df.toPandas()
    assert len(out) == min(_DSIR_TOPK, 100)
    assert list(out["rank"]) == sorted(out["rank"])


def test_hard_negatives_excludes_planted_dups(spark):
    """The near-dup twin of a query must NOT appear among its hard
    negatives even though it tops the raw similarity ranking; the
    next-most-similar non-dup is promoted into the freed slot, and every
    returned cosine sits below the dup threshold for the planted pair."""
    import numpy as np

    from spark_gp_spark.operators.selection import hard_negatives

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # vec 30 = near-copy of query 0 (cosine ~ 1); everything else far
    dup = base[0] + 0.01 * rng.normal(size=16)
    vecs = np.vstack([base, dup[None, :]])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    queries = df.filter("vec_id = 0")

    out = hard_negatives(
        df, queries, k=5, threshold=0.9, bits=4, tables=8, seed=11, dim=16
    ).collect()
    neighbors = {r.neighbor_id for r in out}
    assert 40 not in neighbors          # the planted twin is excluded
    assert len(out) == 5
    ranks = sorted(r.rank for r in out)
    assert ranks == [1, 2, 3, 4, 5]
    # without the exclusion, the twin wins rank 1
    from spark_gp_spark.operators.similarity import cosine_topk

    raw = cosine_topk(df, queries, k=1).collect()
    assert raw[0].neighbor_id == 40


def test_hard_negatives_queries_outside_corpus(spark):
    """The unlabeled-positive filter must hold when the anchor set is a
    SEPARATE relation in its own id space (the standard retrieval-training
    setup): a corpus row that is a near-dup of the external anchor is
    excluded even though no corpus-internal pair involves the anchor's id."""
    import numpy as np

    from spark_gp_spark.operators.selection import hard_negatives

    rng = np.random.default_rng(9)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    anchor = base[7] + 0.01 * rng.normal(size=16)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    # anchor id 999 exists nowhere in the corpus, so the id-inequality in
    # the scoring join cannot be what hides its twin — only the two-sided
    # LSH exclusion can
    queries = spark.createDataFrame(
        [(999, [float(x) for x in anchor])], "vec_id bigint, embedding array<double>"
    )
    out = hard_negatives(
        corpus, queries, k=5, threshold=0.9, bits=4, tables=8, seed=11, dim=16
    ).collect()
    neighbors = {r.neighbor_id for r in out}
    assert 7 not in neighbors           # the near-dup of the anchor is filtered
    assert len(out) == 5
    assert all(r.cosine < 0.9 for r in out)


def test_query_corpus_neardup_foreign_id_space_collision(spark):
    """A contamination screen with foreign query ids: corpus row 7 is a
    near-copy of EXTERNAL anchor id 7 (equal ids by coincidence, different
    objects).  distinct_ids=False must report the (7, 7) duplicate; the
    within-relation default would hide it as a self-pair."""
    import numpy as np

    from spark_gp_spark.operators.dedup import query_corpus_neardup_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    anchor = base[7] + 0.01 * rng.normal(size=16)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(7, [float(x) for x in anchor])], "vec_id bigint, embedding array<double>"
    )
    kw = dict(threshold=0.9, bits=4, tables=8, seed=11, dim=16)
    hidden = query_corpus_neardup_pairs(corpus, queries, **kw).collect()
    assert (7, 7) not in {(r.query_id, r.neighbor_id) for r in hidden}
    found = query_corpus_neardup_pairs(
        corpus, queries, distinct_ids=False, **kw
    ).collect()
    pairs = {(r.query_id, r.neighbor_id) for r in found}
    assert (7, 7) in pairs


def test_cluster_exemplars_are_nearest_to_centroid(spark):
    """Each cell's exemplars must be its population's true per_cell nearest
    vectors to the centroid (numpy replay), ranked ascending; output is
    bounded by |cells| * per_cell."""
    import numpy as np

    from spark_gp_spark.operators.ivf import train_centroids_from_parquet
    from spark_gp_spark.operators.selection import cluster_exemplars

    cents = train_centroids_from_parquet(f"{SF}/embeddings.parquet", 16, 5, 4000)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cluster_exemplars(emb, cents, per_cell=2).collect()
    X = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    # numpy replay of assignment + ranking
    C = np.asarray(cents, dtype=np.float64)
    byc = {}
    for vid, v in X.items():
        d = ((v[None, :] - C) ** 2).sum(axis=1)
        cell = int(np.argmin(d)) + 1
        byc.setdefault(cell, []).append((float(d.min()), vid))
    want = {
        cell: [vid for _, vid in sorted(rows)[:2]] for cell, rows in byc.items()
    }
    got = {}
    for r in sorted(out, key=lambda r: (r.cell, r.rank)):
        got.setdefault(r.cell, []).append(r.vec_id)
        assert 1 <= r.rank <= 2
    assert got == {c: v for c, v in want.items() if v}
    assert len(out) <= 16 * 2


def test_cluster_exemplars_rejects_bad_per_cell(spark):
    import numpy as np
    import pytest as _pytest

    from spark_gp_spark.operators.selection import cluster_exemplars

    df = spark.createDataFrame([(0, [0.0, 1.0])], "vec_id bigint, embedding array<double>")
    with _pytest.raises(ValueError, match="per_cell"):
        cluster_exemplars(df, np.zeros((2, 2)), per_cell=0)


def test_hard_negatives_planted_registry_fixture_fires(spark):
    """The REGISTRY fixture must exercise the LSH exclusion at the
    official correctness scale — the r12 audit measured the unplanted
    corpus firing it ZERO times at sf0.01 (VERDICT r11 #5), which is why
    the registered entry plants an exact copy of every query vector under
    vec_id + 1_000_000.  Both directions gated: with the exclusion none of
    the 20 copies survives; with it disabled every query's rank-1 row IS
    its own copy at cosine 1.0."""
    from pyspark.sql import functions as F

    from spark_gp_spark.operators.selection import hard_negatives
    from spark_gp_spark.queries import hard_negatives_planted, load_table

    out = hard_negatives_planted(spark, SF).collect()
    planted_ids = {r.neighbor_id for r in out if r.neighbor_id >= 1_000_000}
    own_copies = {
        r.neighbor_id for r in out if r.neighbor_id == r.query_id + 1_000_000
    }
    assert own_copies == set()  # every query's own copy is excluded
    # foreign copies may legitimately rank (they are copies of OTHER
    # queries, excluded only when the anchor pair is near-dup) — but the
    # exclusion itself must have fired for all 20 queries, shown by the
    # disabled-threshold twin ranking each copy first:
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 20)
    planted = queries.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    raw = hard_negatives(
        emb.unionByName(planted), queries,
        k=1, threshold=float("inf"), bits=6, tables=8, seed=11, dim=64,
    ).collect()
    assert len(raw) == 20
    assert all(r.neighbor_id == r.query_id + 1_000_000 for r in raw)
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in raw)
