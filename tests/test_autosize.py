"""ANN parameter auto-sizing (operators/ivf.auto_ivf_params /
operators/pq.auto_pq_params) — the r7→r8 promotion of the bench's
`ann_param_scaling` cell to the operator default (VERDICT r7 #1).

Covers: the sizing rules themselves (pure functions of N), the None-default
resolution in the trainers, and — on the planted-structure fixture — that
the auto-sized index is at least as good as the frozen small-corpus
configuration while the frozen entries stay pinned to their oracles.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_gp_spark.operators.ivf import (
    auto_ivf_params,
    ivf_topk,
    parquet_num_rows,
    train_centroids_from_parquet,
)
from spark_gp_spark.operators.pq import (
    auto_pq_params,
    exact_rerank,
    train_pq_codebooks_from_parquet,
)


def test_auto_ivf_params_scaling_rule():
    # floor regime: a tiny corpus keeps the minimum viable inverted file
    small = auto_ivf_params(100)
    assert small == {
        "cells": 16, "nprobe": 8, "nprobe_adc": 11, "sample_rows": 4000,
    }
    # sqrt regime: cells ~ sqrt(N); nprobe = cells/2 and nprobe_adc =
    # 2cells/3 are the r11 recall/time knees (tools/ann_knee_sweep.py),
    # CAPPED at 128 / 170 (ADVICE r11: a constant cells/2 FRACTION scans
    # ~N/2 candidates per query at 100 TB — near brute force — so the
    # absolute cap bounds the scan at ~128*sqrt(N); the fraction below
    # the cap is the bench-corpus calibration); >= 40 training rows/cell
    big = auto_ivf_params(1_000_000)
    assert big["cells"] == 1000
    assert big["nprobe"] == 128
    assert big["nprobe_adc"] == 170
    assert big["sample_rows"] == 40_000
    # below the cap threshold (N ~ 65k) the knee fractions are untouched,
    # so every test/bench corpus keeps its r11-green outputs
    mid = auto_ivf_params(50_000)
    assert mid["nprobe"] == round(mid["cells"] / 2) == 112
    assert mid["nprobe_adc"] == round(2 * mid["cells"] / 3) == 149
    # monotone in N (no weird plateaus from rounding)
    cells = [auto_ivf_params(n)["cells"] for n in (500, 2000, 50_000, 1_000_000)]
    assert cells == sorted(cells)


def test_auto_pq_params_scaling_rule():
    # training-sample-bounded codebooks: >= 20 points per centroid (the
    # r11 sweep knee — each subspace k-means fits only d/m dims)
    assert auto_pq_params(300)["k"] == 16          # floor
    assert auto_pq_params(2000)["k"] == 100        # min(n, sample)//20
    assert auto_pq_params(1_000_000)["k"] == 256   # one-byte-code cap
    # above the k=16 floor, the training budget keeps >= 19 points/centroid
    for n in (2000, 50_000, 1_000_000):
        p = auto_pq_params(n)
        assert min(n, p["sample_rows"]) // p["k"] >= 19


def test_trainer_none_defaults_resolve_to_auto(sf_dir):
    path = f"{sf_dir}/embeddings.parquet"
    n = parquet_num_rows(path)
    auto = auto_ivf_params(n)
    cents_default = train_centroids_from_parquet(path)
    cents_explicit = train_centroids_from_parquet(
        path, auto["cells"], 5, auto["sample_rows"]
    )
    assert cents_default.shape[0] == auto["cells"]
    np.testing.assert_array_equal(cents_default, cents_explicit)
    books = train_pq_codebooks_from_parquet(path)
    assert books.shape[1] == auto_pq_params(n)["k"]


def test_auto_ivf_beats_frozen_on_planted_duplicates(spark, sf_dir):
    """Planted near-duplicates (vec + tiny noise) must be retrieved at
    rank 1 by the auto-sized index — the retrieval-quality contract the
    frozen IVFADC configuration failed at bench scale."""
    rng = np.random.default_rng(11)
    n, d = 600, 64
    X = rng.normal(size=(n, d))
    dup_src = np.arange(0, 40)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    # ids n..n+39 duplicate ids 0..39 with small noise
    for j, s in enumerate(dup_src):
        v = X[s] + 0.01 * rng.normal(size=d)
        rows.append((n + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "emb.parquet")
        df.toPandas().to_parquet(path)
        cents = train_centroids_from_parquet(path)  # auto cells/sample
        queries = df.filter(F.col("vec_id") >= n)
        out = ivf_topk(df, queries, cents, k=1, nprobe=None).toPandas()
    hits = sum(
        1 for _, r in out.iterrows()
        if r["rank"] == 1 and r["neighbor_id"] == dup_src[int(r["query_id"]) - n]
    )
    assert hits / len(dup_src) >= 0.9


def test_exact_rerank_matches_exact_topk(spark, sf_dir):
    """Rerank of a shortlist that CONTAINS the true top-k must equal the
    exact brute-force ranking (refine changes ordering only, never adds)."""
    from spark_gp_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5)
    # shortlist = exact top-20 pairs; rerank to top-5 must reproduce exact
    short = cosine_topk(emb, queries, k=20).select("query_id", "neighbor_id")
    rr = exact_rerank(short, emb, k=5).toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    ex = exact.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    ex["rank"] = ex["rank"].astype("int64")
    rr["rank"] = rr["rank"].astype("int64")
    assert rr[["query_id", "neighbor_id", "rank"]].equals(
        ex[["query_id", "neighbor_id", "rank"]]
    )
    assert np.allclose(rr["cosine"], ex["cosine"], atol=1e-9)


def test_multiprobe_frame_probes_hamming1_flips(spark):
    """Multi-probe contract: per (row, table) the probe list is the row's
    own bucket plus n_flip buckets at Hamming distance exactly 1, all
    distinct, and the single-probe bucket relation is a subset of it."""
    import pandas as pd

    from spark_gp_spark.operators.similarity import (
        hyperplane_tables,
        lsh_bucket_frame,
        lsh_multiprobe_frame,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    planes = hyperplane_tables(16, 6, 3, seed=11)
    vec = F.col("embedding").cast("array<double>")
    single = lsh_bucket_frame(df, F.col("vec_id"), vec, planes, "vec_id").toPandas()
    multi = lsh_multiprobe_frame(
        df, F.col("vec_id"), vec, planes, n_flip=2, id_name="vec_id"
    ).toPandas()
    own = {(r.vec_id, r.tbl): r.bucket for r in single.itertuples()}
    grouped = multi.groupby(["vec_id", "tbl"])["bucket"].apply(list)
    for (vid, tbl), probes in grouped.items():
        assert len(probes) == 3 and len(set(probes)) == 3
        b0 = own[(vid, tbl)]
        assert probes[0] == b0  # own bucket first
        for b in probes[1:]:
            assert bin(b ^ b0).count("1") == 1  # exactly one flipped bit


def test_multiprobe_beats_single_probe_on_planted_duplicates(spark):
    """The recall point of multi-probe: planted near-duplicates that
    single-probe LSH misses (signs flipped by the noise on low-margin
    planes) are recovered by probing the 1-bit flips."""
    from spark_gp_spark.operators.similarity import (
        lsh_bucketed_topk,
        lsh_multiprobe_topk,
    )

    rng = np.random.default_rng(5)
    n, d = 400, 32
    X = rng.normal(size=(n, d))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    dup_src = np.arange(40)
    for j, s in enumerate(dup_src):
        v = X[s] + 0.05 * rng.normal(size=d)
        rows.append((n + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    queries = df.filter(F.col("vec_id") >= n)

    def hits(out):
        pdf = out.toPandas()
        top1 = pdf[pdf["rank"] == 1]
        return sum(
            1 for r in top1.itertuples()
            if r.neighbor_id == dup_src[int(r.query_id) - n]
        )

    single = hits(lsh_bucketed_topk(df, queries, k=1, bits=10, tables=2, dim=d))
    multi = hits(
        lsh_multiprobe_topk(df, queries, k=1, bits=10, tables=2, n_flip=4, dim=d)
    )
    assert multi > single
    assert multi >= 0.9 * len(dup_src)
