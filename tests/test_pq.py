"""Product quantization: encoding invariants and ADC recall on planted
near-duplicates (random vectors are PQ's worst case — see
tests/test_similarity.py's rationale for planting)."""

from __future__ import annotations

import numpy as np
import pytest

from spark_gp_spark.operators.pq import (
    adc_luts,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)

DIM = 32
M, K = 4, 16
N_BASE = 150
N_DUP = 20


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(N_BASE, DIM))
    dups = base[:N_DUP] + 0.03 * rng.normal(size=(N_DUP, DIM))
    vecs = np.vstack([base, dups])
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    books = train_pq_codebooks(vecs, m=M, k=K, seed=5)
    return df, vecs, books


def test_pq_encode_invariants(spark, corpus):
    df, vecs, books = corpus
    out = pq_encode(df, books).collect()
    assert len(out) == len(vecs)
    for r in out:
        assert len(r.codes) == M
        assert all(0 <= c < K for c in r.codes)
        assert r.mse >= 0.0
    # codes match a direct numpy argmin (first-min ties)
    ds = DIM // M
    by_id = {r.vec_id: list(r.codes) for r in out}
    for i in (0, 57, N_BASE + 3):
        want = [
            int(np.argmin(((vecs[i, s * ds : (s + 1) * ds] - books[s]) ** 2).sum(1)))
            for s in range(M)
        ]
        assert by_id[i] == want


def test_pq_adc_recall_on_planted_dups(spark, corpus):
    """Each planted dup, used as a query, must place its base vector in the
    ADC top-5 — quantization noise is far smaller than the inter-point
    distances that matter at dedup scale."""
    df, vecs, books = corpus
    codes = pq_encode(df, books).select("vec_id", "codes")
    qids = list(range(N_BASE, N_BASE + N_DUP))
    luts = adc_luts(vecs[qids], books)
    query_luts = [(qid, luts[i].tolist()) for i, qid in enumerate(qids)]
    out = pq_topk(codes, query_luts, k=5)
    top = {}
    for r in out.collect():
        top.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for i, qid in enumerate(qids) if (qid - N_BASE) in top[qid])
    recall = hits / N_DUP
    assert recall >= 0.9, f"planted-dup ADC recall {recall:.2f} < 0.9"


def test_pq_topk_rank_determinism(spark, corpus):
    df, vecs, books = corpus
    codes = pq_encode(df, books).select("vec_id", "codes")
    luts = adc_luts(vecs[:2], books)
    query_luts = [(0, luts[0].tolist()), (1, luts[1].tolist())]
    a = pq_topk(codes, query_luts, k=5).collect()
    b = pq_topk(codes, query_luts, k=5).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.neighbor_id, r.adc_dist) for r in rows)
    assert key(a) == key(b)
    for r in a:
        assert 1 <= r.rank <= 5 and r.neighbor_id != r.query_id


@pytest.fixture(scope="module")
def residual_index(corpus):
    """Coarse centroids + residual codebooks over the planted corpus."""
    from spark_gp_spark.active_set import _local_kmeans
    from spark_gp_spark.operators.pq import assign_cells_np

    _, vecs, _ = corpus
    cents = np.round(_local_kmeans(vecs, 16, 5), 6)
    R = vecs - cents[assign_cells_np(vecs, cents)]
    books = train_pq_codebooks(R, m=M, k=K, seed=5)
    return cents, books


def test_ivfadc_residual_recall_on_planted_dups(spark, corpus, residual_index):
    """Residual IVFADC (4/16 cells probed) must keep each planted base
    vector in its near-dup query's top-5: IVF pruning must not lose the
    base's cell, and residual quantization noise must stay far below the
    planted 0.03σ perturbation."""
    from spark_gp_spark.operators.ivf import ivf_probe_frame
    from spark_gp_spark.operators.pq import (
        adc_luts_residual,
        ivfadc_topk,
        pq_encode_residual,
        probe_cells_np,
    )

    df, vecs, _ = corpus
    cents, books = residual_index
    vec = F_col_array()
    qids = list(range(N_BASE, N_BASE + N_DUP))
    probe_lists = probe_cells_np(vecs[qids], cents, 4)
    luts = adc_luts_residual(vecs[qids], probe_lists, cents, books)
    query_cell_luts = [(qids[r], cell, lut) for r, cell, lut in luts]
    probes = ivf_probe_frame(
        df.filter(vec("vec_id") < N_BASE + N_DUP).filter(vec("vec_id") >= N_BASE),
        vec("vec_id"), vec("embedding"), cents, 4, "query_id",
    )
    codes = pq_encode_residual(df, books, cents)
    out = ivfadc_topk(codes, probes, query_cell_luts, k=5)
    top = {}
    for r in out.collect():
        top.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for qid in qids if (qid - N_BASE) in top.get(qid, set()))
    assert hits / N_DUP >= 0.9, f"ivfadc planted recall {hits / N_DUP:.2f} < 0.9"


def test_residual_encoding_cuts_reconstruction_error(spark, corpus, residual_index):
    """The point of residual PQ: quantizing (v − centroid[cell]) with the
    same (m, k) budget reconstructs strictly better than quantizing raw
    vectors, because residuals concentrate near zero (Jégou 2011 §IV)."""
    from spark_gp_spark.operators.pq import pq_encode_residual

    df, vecs, books_raw = corpus
    cents, books_res = residual_index
    raw_mse = (
        pq_encode(df, books_raw).agg({"mse": "avg"}).first()[0]
    )
    res_mse = (
        pq_encode_residual(df, books_res, cents).agg({"mse": "avg"}).first()[0]
    )
    assert res_mse < raw_mse, f"residual mse {res_mse:.5f} !< raw {raw_mse:.5f}"
    # cells are 1-based and every row gets one
    cells = [r.cell for r in pq_encode_residual(df, books_res, cents).collect()]
    assert min(cells) >= 1 and max(cells) <= 16


def F_col_array():
    from pyspark.sql import functions as F

    def _c(name):
        col = F.col(name)
        return col.cast("array<double>") if name == "embedding" else col

    return _c


def test_ann_index_save_load_roundtrip(tmp_path):
    """Persisted index artifacts (operators/ann_index.py): centroids and
    codebooks round-trip through the parquet artifact bit-for-bit (parquet
    doubles are exact), params survive, and the trainers' process cache
    returns the SAME object on a repeat call (train-once discipline)."""
    import numpy as np

    from spark_gp_spark.operators.ann_index import load_ann_index, save_ann_index
    from spark_gp_spark.operators.ivf import train_centroids_from_parquet
    from spark_gp_spark.operators.pq import train_pq_codebooks_residual_from_parquet

    path = "/root/testdata/sf0.001/embeddings.parquet"
    cents = train_centroids_from_parquet(path, 8, seed=5, sample_rows=200)
    books = train_pq_codebooks_residual_from_parquet(
        path, cents, m=8, k=8, seed=5, sample_rows=200
    )
    # repeat call hits the process cache: identical object, no retrain
    assert train_centroids_from_parquet(path, 8, seed=5, sample_rows=200) is cents

    art = str(tmp_path / "ann" / "index.parquet")
    save_ann_index(
        art, centroids=cents, codebooks=books, params={"nprobe": 4, "metric": "l2"}
    )
    loaded = load_ann_index(art)
    np.testing.assert_array_equal(loaded["centroids"], cents)
    np.testing.assert_array_equal(loaded["codebooks"], books)
    assert loaded["params"] == {"nprobe": 4, "metric": "l2"}


def test_hash_sample_pushdown_matches_global_selection():
    """The pushed-down h(id) < T scan must select EXACTLY the global
    sample_rows smallest (hash, id) rows — compare against a brute-force
    full read."""
    import numpy as np
    import pyarrow.parquet as pq

    from spark_gp_spark.operators.ivf import (
        _hash_sample_vectors_scan,
        sample_hash_np,
    )

    path = "/root/testdata/sf0.01/embeddings.parquet"
    got = _hash_sample_vectors_scan(path, 64, "embedding", "vec_id")
    table = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(table.column("embedding").to_pylist(), dtype=np.float64)
    order = np.lexsort((ids, sample_hash_np(ids)))[:64]
    np.testing.assert_array_equal(got, X[order])


def test_ann_index_load_rejects_corrupt_lattice(tmp_path):
    """A hand-damaged artifact (missing codebook cell / gapped centroid
    rows) must fail loudly, not KeyError or silently mis-shape."""
    import numpy as np
    import pyarrow.parquet as paq
    import pytest

    from spark_gp_spark.operators.ann_index import load_ann_index, save_ann_index

    art = str(tmp_path / "index.parquet")
    save_ann_index(
        art,
        centroids=np.arange(8.0).reshape(4, 2),
        codebooks=np.arange(24.0).reshape(2, 3, 4),
    )
    table = paq.read_table(art)
    # drop one codebook cell -> incomplete (subspace, centroid) lattice
    damaged = table.slice(0, table.num_rows - 1)
    paq.write_table(damaged, art)
    with pytest.raises(ValueError, match="lattice"):
        load_ann_index(art)


def test_probe_parity_numpy_vs_spark_full_fixture(spark):
    """The ivfadc probe-agreement check (pq.ivfadc_topk) treats numpy
    (probe_cells_np) and Spark (ivf_probe_frame) cell assignment parity as
    load-bearing: any (query, cell) divergence is a hard failure.  Pin that
    parity explicitly over the FULL sf0.001 embeddings fixture — every
    vector as a query — so a drift in either side's accumulation order or
    tie-break surfaces here first, not as a registry-query crash."""
    import numpy as np
    import pyarrow.parquet as paq
    from pyspark.sql import functions as F

    from spark_gp_spark.operators.ivf import (
        ivf_probe_frame,
        train_centroids_from_parquet,
    )
    from spark_gp_spark.operators.pq import probe_cells_np

    path = "/root/testdata/sf0.001/embeddings.parquet"
    cents = train_centroids_from_parquet(path, 16, seed=5, sample_rows=400)
    table = paq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(table.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    nprobe = 4
    want = {
        (int(i), int(c))
        for i, cells in zip(ids, probe_cells_np(X, cents, nprobe))
        for c in cells
    }
    df = spark.read.parquet(path)
    got = {
        (int(r.query_id), int(r.cell))
        for r in ivf_probe_frame(
            df, F.col("vec_id"), F.col("embedding").cast("array<double>"),
            cents, nprobe, "query_id",
        ).collect()
    }
    assert got == want


def test_ann_artifact_cache_evicts_superseded_fingerprints(tmp_path):
    """_cached_artifact drops entries whose (kind, path) matches a new
    insert but whose file fingerprint is stale: two fixture rewrites leave
    exactly one cache generation per (kind, path)."""
    import shutil
    import time

    from spark_gp_spark.operators import ivf

    src = "/root/testdata/sf0.001/embeddings.parquet"
    path = str(tmp_path / "emb.parquet")

    def rewrite():
        shutil.copyfile(src, path)
        # ensure a distinct mtime_ns fingerprint even on coarse clocks
        now = time.time_ns()
        rewrite.tick += 1
        import os

        os.utime(path, ns=(now + rewrite.tick, now + rewrite.tick))

    rewrite.tick = 0
    before = dict(ivf._ANN_ARTIFACT_CACHE)
    try:
        ivf._ANN_ARTIFACT_CACHE.clear()
        for _ in range(2):
            rewrite()
            ivf.train_centroids_from_parquet(path, 4, seed=5, sample_rows=50)
            ivf.hash_sample_vectors(path, 50)
        by_kind_path = {}
        for k in ivf._ANN_ARTIFACT_CACHE:
            by_kind_path.setdefault((k[0], k[1]), []).append(k)
        for (kind, p), keys in by_kind_path.items():
            assert len(keys) == 1, f"{kind}@{p} kept {len(keys)} generations"
    finally:
        ivf._ANN_ARTIFACT_CACHE.clear()
        ivf._ANN_ARTIFACT_CACHE.update(before)


# -------------------------------------------------------------------- OPQ


def test_opq_rotation_cuts_mse_on_correlated_data():
    """The OPQ objective, directly: on anisotropic cross-subspace-correlated
    data (the case PQ's independence assumption breaks on), the learned
    rotation must cut total quantization error vs plain PQ at identical
    code size, and R must stay orthonormal up to the 1e-6 literal
    rounding."""
    from spark_gp_spark.operators.pq import (
        _encode_batch,
        _rotate_batch,
        train_opq,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(7)
    n, d, r = 2000, 32, 6
    A = rng.normal(size=(d, r)) * np.array([4, 3, 2, 1.5, 1, 0.5])
    X = rng.normal(size=(n, r)) @ A.T + 0.1 * rng.normal(size=(n, d))

    books_pq = train_pq_codebooks(X, m=M, k=K, seed=5)
    _, sq_pq = _encode_batch(X, books_pq)
    R, books_opq = train_opq(X, m=M, k=K, seed=5, iters=8)
    _, sq_opq = _encode_batch(_rotate_batch(X, R), books_opq)

    assert np.abs(R @ R.T - np.eye(d)).max() < 1e-4
    assert sq_opq.mean() < 0.6 * sq_pq.mean(), (sq_opq.mean(), sq_pq.mean())


def test_opq_rotate_batch_is_left_to_right_fold():
    """_rotate_batch must fold input dims left-to-right (the oracle-parity
    association), bit-identical to a scalar replay — np.dot's pairwise/BLAS
    order would diverge in the last ulps."""
    from spark_gp_spark.operators.pq import _rotate_batch

    rng = np.random.default_rng(1)
    X = rng.normal(size=(5, 8))
    R = rng.normal(size=(8, 8))
    Z = _rotate_batch(X, R)
    for r in range(5):
        for j in range(8):
            acc = 0.0
            for i in range(8):
                acc = acc + X[r, i] * R[j, i]
            assert Z[r, j] == acc  # bitwise, not approx


def test_opq_adc_recall_on_planted_dups(spark, corpus):
    """OPQ end-to-end through Spark: every planted dup's base vector must
    land in its ADC top-5, matching the plain-PQ gate at identical code
    size (recall can only improve — the rotation lowers quantization
    noise)."""
    from spark_gp_spark.operators.pq import (
        _rotate_batch,
        opq_encode,
        train_opq,
    )

    df, vecs, _ = corpus
    R, books = train_opq(vecs, m=M, k=K, seed=5, iters=8)
    codes = opq_encode(df, R, books).select("vec_id", "codes")
    qids = list(range(N_BASE, N_BASE + N_DUP))
    luts = adc_luts(_rotate_batch(vecs[qids], R), books)
    query_luts = [(qid, luts[i].tolist()) for i, qid in enumerate(qids)]
    top = pq_topk(codes, query_luts, k=5).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(1 for i, qid in enumerate(qids) if (qid - N_BASE) in by_q[qid])
    assert hits / N_DUP >= 0.9, f"OPQ planted-dup recall {hits / N_DUP:.2f} < 0.9"


def test_ann_index_rotation_roundtrip_exact(tmp_path):
    """The OPQ rotation persists float64-exact alongside codebooks, and a
    non-square / row-gapped rotation fails loudly on load."""
    import pyarrow.parquet as paq

    from spark_gp_spark.operators.ann_index import load_ann_index, save_ann_index
    from spark_gp_spark.operators.pq import train_opq

    rng = np.random.default_rng(4)
    X = rng.normal(size=(300, 16))
    R, books = train_opq(X, m=4, k=8, seed=5, iters=3)
    art = str(tmp_path / "opq.parquet")
    save_ann_index(art, codebooks=books, rotation=R, params={"m": 4, "k": 8})
    got = load_ann_index(art)
    assert (got["rotation"] == R).all()       # bitwise, not approx
    assert (got["codebooks"] == books).all()
    assert got["params"] == {"m": 4, "k": 8}

    # drop one rotation row -> gapped rows must raise
    table = paq.read_table(art)
    kinds = table.column("kind").to_pylist()
    drop = kinds.index("rotation")
    damaged = table.take([i for i in range(table.num_rows) if i != drop])
    paq.write_table(damaged, art)
    with pytest.raises(ValueError, match="rotation"):
        load_ann_index(art)


def test_ivfadc_probe_check_tolerates_tie_shape_and_rejects_miswiring(
    spark, corpus, residual_index
):
    """The eager probe/LUT wiring check (ADVICE r7e): a tie-compatible
    divergence — same query ids, same per-query pair counts, symmetric
    per-query swaps — must WARN and proceed (scoring follows the LUTs);
    a count-asymmetric disagreement (different nprobe or query set) must
    still raise."""
    import warnings

    from spark_gp_spark.operators.pq import (
        adc_luts_residual,
        ivfadc_topk,
        pq_encode_residual,
        probe_cells_np,
    )

    df, vecs, _ = corpus
    cents, books = residual_index
    qids = [N_BASE, N_BASE + 1]
    probe_lists = probe_cells_np(vecs[qids], cents, 4)
    luts = adc_luts_residual(vecs[qids], probe_lists, cents, books)
    query_cell_luts = [(qids[r], cell, lut) for r, cell, lut in luts]
    codes = pq_encode_residual(df, books, cents).select("vec_id", "cell", "codes")

    pairs = [(q, c) for q, c, _ in query_cell_luts]
    # tie shape: swap ONE cell of query qids[0] for a cell outside its LUT
    # set — per-query counts stay equal on both sides
    q0_cells = {c for q, c in pairs if q == qids[0]}
    other = next(c for c in range(1, 17) if c not in q0_cells)
    drop = max(q0_cells)
    tie_pairs = [(q, other if (q == qids[0] and c == drop) else c) for q, c in pairs]
    probe_tie = spark.createDataFrame(tie_pairs, "query_id bigint, cell int")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = ivfadc_topk(codes, probe_tie, query_cell_luts, k=3)
        rows = out.collect()
    assert any("tie-compatible" in str(w.message) for w in caught)
    assert rows and all(r.query_id in qids for r in rows)

    # miswired shape: one query lost a probed cell entirely (count asymmetry)
    probe_short = spark.createDataFrame(pairs[:-1], "query_id bigint, cell int")
    with pytest.raises(ValueError, match="disagree on the probed"):
        ivfadc_topk(codes, probe_short, query_cell_luts, k=3)
