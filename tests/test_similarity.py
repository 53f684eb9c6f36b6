"""Recall and correctness tests for the sign-LSH similarity/near-dup path.

The test corpus plants true near-duplicates (cosine ≈ 0.995) among random
vectors — the distribution the LSH parameters are designed for (the synthetic
``embeddings`` test table is pure noise with max pair cosine ≈ 0.51, where no
sub-quadratic method can have high recall; planted duplicates measure what
matters at corpus scale).
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_DIR

from spark_gp_spark.operators.dedup import embedding_neardup_pairs
from spark_gp_spark.operators.similarity import cosine_topk, lsh_bucketed_topk

DIM = 32
N_BASE = 150
N_DUP = 20


@pytest.fixture(scope="module")
def planted(spark):
    """(df, truth) — base vectors + planted near-dups; truth = set of planted
    (base_id, dup_id) pairs, every one at cosine ≥ 0.98."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(N_BASE, DIM))
    dups = base[:N_DUP] + 0.03 * rng.normal(size=(N_DUP, DIM))
    vecs = np.vstack([base, dups])
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    truth = {(i, N_BASE + i) for i in range(N_DUP)}
    cos = np.array(
        [
            float(base[i] @ dups[i] / (np.linalg.norm(base[i]) * np.linalg.norm(dups[i])))
            for i in range(N_DUP)
        ]
    )
    assert cos.min() > 0.98  # the plant is a genuine near-dup set
    return df, truth


def test_lsh_neardup_recall_vs_exact(spark, planted):
    """LSH-candidate near-dup must recover ≥90% of true high-cosine pairs
    AND agree with brute force on every pair it does emit."""
    df, truth = planted
    approx = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(df, threshold=0.9).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(df, threshold=0.9, exact=True).collect()
    }
    assert truth <= set(exact)  # sanity: brute force sees every planted pair
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.9, f"near-dup recall {recall:.2f} < 0.9"
    for pair, c in approx.items():
        assert c == exact[pair]  # verification is exact on candidates


def test_lsh_topk_recall_vs_exact(spark, planted):
    """Top-1 neighbour of each planted dup is its base vector; the bucketed
    top-k must find it ≥90% of the time."""
    df, truth = planted
    queries = df.filter(f"vec_id >= {N_BASE}")
    approx = lsh_bucketed_topk(df, queries, k=5, bits=6, tables=6).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    hits = sum(1 for b, d in truth if top1.get(d) == b)
    assert hits / len(truth) >= 0.9, f"top-1 recall {hits}/{len(truth)}"


def test_ivf_topk_recall_vs_exact(spark, planted):
    """IVF-Flat: top-1 neighbour of each planted dup is its base vector; a
    near-duplicate lands in the same (or a probed) k-means cell essentially
    always, so recall must be ≥0.9."""
    import numpy as np

    from spark_gp_spark.active_set import _local_kmeans
    from spark_gp_spark.operators.ivf import ivf_topk

    df, truth = planted
    X = np.asarray(
        [r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    cents = np.round(_local_kmeans(X, 8, seed=5), 6)
    queries = df.filter(f"vec_id >= {N_BASE}")
    approx = ivf_topk(df, queries, cents, k=5, nprobe=2).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    hits = sum(1 for b, d in truth if top1.get(d) == b)
    assert hits / len(truth) >= 0.9, f"IVF top-1 recall {hits}/{len(truth)}"


def test_lsh_topk_matches_exact_on_candidates(spark, planted):
    """Where the LSH top-k returns a neighbour, its cosine must equal the
    exact computation (verification is never approximate)."""
    df, _ = planted
    queries = df.filter("vec_id < 10")
    ex = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(df, queries, k=N_BASE + N_DUP).collect()
    }
    ap = lsh_bucketed_topk(df, queries, k=5, bits=6, tables=6).collect()
    for r in ap:
        assert ex[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_lsh_dim_param_skips_probe_job(spark, monkeypatch):
    """With dim passed explicitly, building the LSH plan must not launch the
    one-row dimension-probe Spark job (a needless job per call at scale)."""
    from spark_gp_spark.operators import similarity as S

    def _boom(*a, **k):
        raise AssertionError("dimension probe job launched despite explicit dim")

    monkeypatch.setattr(S, "_vector_dim", _boom)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = S.lsh_candidate_pairs(emb, dim=64)
    assert pairs.columns == ["id_a", "id_b"]
    topk = S.lsh_bucketed_topk(emb, emb.limit(3), k=2, dim=64)
    assert "rank" in topk.columns


def test_hash_sample_is_layout_independent(tmp_path):
    # the training sample must be a pure function of the DATA, not of the
    # file's physical row order (a head-slice sample is not)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_gp_spark.operators.ivf import hash_sample_vectors

    rng = np.random.default_rng(0)
    ids = np.arange(100, dtype=np.int64)
    vecs = rng.normal(size=(100, 4))
    perm = rng.permutation(100)
    for name, order in [("a.parquet", np.arange(100)), ("b.parquet", perm)]:
        t = pa.table(
            {"vec_id": ids[order], "embedding": list(vecs[order])}
        )
        pq.write_table(t, str(tmp_path / name))
    sa = hash_sample_vectors(str(tmp_path / "a.parquet"), 10)
    sb = hash_sample_vectors(str(tmp_path / "b.parquet"), 10)
    assert np.array_equal(sa, sb)
    assert sa.shape == (10, 4)


def test_ivf_topk_with_spark_trained_centroids(spark, planted):
    """The distributed trainer (pyspark.ml KMeans → (k, d) array) must plug
    into the same ivf_topk contract and keep planted-dup recall — the
    on-cluster index-build path for evolving corpora, where the
    deterministic pyarrow trainer's driver-side sample is not wanted."""
    from spark_gp_spark.operators.ivf import ivf_topk, train_centroids_spark

    df, truth = planted
    cents = train_centroids_spark(df, n_centroids=8, seed=5)
    assert cents.shape == (8, DIM)
    queries = df.filter(f"vec_id >= {N_BASE}")
    approx = ivf_topk(df, queries, cents, k=5, nprobe=2).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    hits = sum(1 for b, d in truth if top1.get(d) == b)
    assert hits / len(truth) >= 0.9, f"spark-KMeans IVF recall {hits}/{len(truth)}"


def test_hash_sample_spark_twin_matches_pyarrow(spark):
    """The executor-side sampler must return the BIT-IDENTICAL sample as
    the pyarrow trainer path — same Knuth-hash constants, same (hash, id)
    order — so indexes trained either way are interchangeable and
    oracle-reproducible."""
    import numpy as np

    from spark_gp_spark.operators.ivf import (
        _hash_sample_vectors_scan,
        hash_sample_vectors_spark,
    )

    path = "/root/testdata/sf0.01/embeddings.parquet"
    df = spark.read.parquet(path)
    got = hash_sample_vectors_spark(df, 64)
    want = _hash_sample_vectors_scan(path, 64, "embedding", "vec_id")
    np.testing.assert_array_equal(got, want)
    # oversampled case too (sample_rows > n): full corpus in (h, id) order
    got_all = hash_sample_vectors_spark(df, 10_000)
    want_all = _hash_sample_vectors_scan(path, 10_000, "embedding", "vec_id")
    np.testing.assert_array_equal(got_all, want_all)


def test_hash_sample_retry_on_adversarial_ids(tmp_path):
    """The pushed-down threshold can undershoot when the id population's
    hashes are skewed high; the doubling retry must still deliver EXACTLY
    the global smallest-(hash, id) sample.  Ids here are chosen so every
    hash sits in the top decile of the hash range — the initial ~2x-rate
    threshold matches zero rows and the loop must double up to the full
    range."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as paq

    from spark_gp_spark.operators.ivf import (
        _HASH_MASK,
        _hash_sample_vectors_scan,
        sample_hash_np,
    )

    ids, i = [], 0
    while len(ids) < 100:
        if sample_hash_np(np.array([i]))[0] > 0.9 * _HASH_MASK:
            ids.append(i)
        i += 1
    ids = np.asarray(ids, dtype=np.int64)
    vecs = [[float(x), float(x) + 0.5] for x in ids]
    path = str(tmp_path / "adversarial.parquet")
    paq.write_table(
        pa.table({"vec_id": ids, "embedding": pa.array(vecs, pa.list_(pa.float64()))}),
        path,
    )
    got = _hash_sample_vectors_scan(path, 10, "embedding", "vec_id")
    order = np.lexsort((ids, sample_hash_np(ids)))[:10]
    want = np.asarray(vecs, dtype=np.float64)[order]
    np.testing.assert_array_equal(got, want)


def test_jl_project_preserves_planted_neighbor(spark):
    """JL geometry check: a planted near-copy must stay its anchor's
    nearest neighbor by cosine AFTER the 64 -> 16 projection, and the
    projection must equal the numpy left-to-right fold exactly."""
    import numpy as np

    from spark_gp_spark.operators.similarity import (
        jl_project,
        random_hyperplanes,
    )

    rng = np.random.default_rng(17)
    base = rng.normal(size=(30, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    twin = base[0] + 0.02 * rng.normal(size=64)
    vecs = np.vstack([base, twin[None, :]])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id bigint, embedding array<double>",
    )
    got = {r.vec_id: np.array(r.projected) for r in jl_project(df, out_dim=16).collect()}
    P = random_hyperplanes(64, 16, 23)
    for i in range(len(vecs)):
        acc = np.zeros(16)
        for j in range(64):                     # replay the UDF's fold order
            acc = acc + vecs[i, j] * P[:, j]
        # F.round ties half-away (np.round ties to even) — compare at the
        # 6-dp grain instead of replaying the engine's tie-break
        assert np.abs(got[i] - acc).max() <= 5.01e-7, i
    # nearest neighbor of anchor 0 in projected space is still the twin
    proj = np.vstack([got[i] for i in range(len(vecs))])
    proj = proj / np.linalg.norm(proj, axis=1, keepdims=True)
    sims = proj @ proj[0]
    sims[0] = -2.0
    assert int(np.argmax(sims)) == 30


def test_jl_project_plan_is_single_arrow_projection(spark):
    from spark_gp_spark.operators.similarity import jl_project

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = jl_project(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_jl_project_rejects_bad_out_dim(spark):
    import pytest as _pytest

    from spark_gp_spark.operators.similarity import jl_project

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with _pytest.raises(ValueError, match="out_dim"):
        jl_project(emb, out_dim=0)
