"""Recall-vs-wall-time knee sweep for the auto-ANN family (VERDICT r10
next #4): measure recall@5 against the exact cosine top-5 and steady-state
wall time at bench scale for a grid over the auto-sizer's dials —

  - IVF:    nprobe fraction of cells (auto rule: cells/4)
  - IVFADC: nprobe fraction x exact-rerank shortlist R (auto: cells/4, 50)
  - PQ:     codewords-per-subspace k x shortlist R (auto: sample/40, 50)
  - OPQ:    same dials as PQ, learned rotation on top

Each cell re-builds the exact query-entry shape (train -> encode -> probe
-> shortlist -> exact rerank -> top-5) with the dial overridden, times the
SECOND run (artifact caches warm, matching the bench's steady-state
protocol), and scores strict recall: |approx top-5 ∩ exact top-5| / |exact
top-5| over the 20 bench queries.  Prints one JSON document; the knee
chosen from it becomes the new auto rule (operators/ivf.py /
operators/pq.py) — single source of truth, so the DuckDB oracles derive
the identical configuration.

Usage:  python tools/ann_knee_sweep.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_gp_spark.queries import (
        _IVF_SEED,
        _PQ_M,
        _PQ_SEED,
        cosine_topk,
    )
    from spark_gp_spark.operators.ivf import (
        auto_ivf_params,
        ivf_probe_frame,
        ivf_topk as _ivf_topk,
        parquet_num_rows,
        train_centroids_from_parquet,
    )
    from spark_gp_spark.operators.pq import (
        adc_luts,
        adc_luts_residual,
        auto_pq_params,
        exact_rerank,
        ivfadc_topk as _ivfadc_topk,
        train_opq_from_parquet,
        _rotate_batch,
        opq_encode,
        pq_encode as _pq_encode,
        pq_encode_residual,
        pq_topk as _pq_topk,
        probe_cells_np,
        read_query_vectors,
        train_pq_codebooks_from_parquet,
        train_pq_codebooks_residual_from_parquet,
    )
    from spark_gp_spark.sources.tables import load_table

    path = f"{sf_dir}/embeddings.parquet"
    n = parquet_num_rows(path)
    ivf_p, pq_p = auto_ivf_params(n), auto_pq_params(n)
    cells = ivf_p["cells"]

    exact_pairs = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(spark, sf_dir).collect()
    }

    def score(df) -> float:
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return round(len(got & exact_pairs) / len(exact_pairs), 4)

    def timed(build):
        # run twice; report the warm (artifact-cache-hit) second run,
        # matching bench.py's steady-state protocol
        build().write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3), score(build())

    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    qs = read_query_vectors(path, max_id=20)
    Q = np.stack([v for _, v in qs])
    out: dict = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "auto_params": {**ivf_p, "k": pq_p["k"]},
        "grid": {},
    }

    # ---- IVF: nprobe fraction -------------------------------------------
    ivf_grid = []
    for frac_name, nprobe in [
        ("cells/4", max(4, round(cells / 4))),
        ("cells/3", max(4, round(cells / 3))),
        ("cells/2", max(4, round(cells / 2))),
        ("2cells/3", max(4, round(2 * cells / 3))),
    ]:
        cents = train_centroids_from_parquet(
            path, cells, _IVF_SEED, ivf_p["sample_rows"]
        )

        def build():
            queries = emb.filter(F.col("vec_id") < 20)
            return _ivf_topk(emb, queries, cents, k=5, nprobe=nprobe)

        t, r = timed(build)
        ivf_grid.append(
            {"nprobe": nprobe, "frac": frac_name, "time_s": t, "recall": r}
        )
        print(f"ivf {frac_name} nprobe={nprobe}: {t}s recall={r}", flush=True)
    out["grid"]["ivf"] = ivf_grid

    # ---- IVFADC: nprobe fraction x rerank shortlist ---------------------
    adc_grid = []
    cents = train_centroids_from_parquet(path, cells, _IVF_SEED, ivf_p["sample_rows"])
    books_res = train_pq_codebooks_residual_from_parquet(
        path, cents, _PQ_M, pq_p["k"], _PQ_SEED, pq_p["sample_rows"]
    )
    for frac_name, nprobe in [
        ("cells/4", max(4, round(cells / 4))),
        ("cells/2", max(4, round(cells / 2))),
        ("2cells/3", max(4, round(2 * cells / 3))),
    ]:
        for rerank in (50, 100):

            def build():
                probe_lists = probe_cells_np(Q, cents, nprobe)
                luts = adc_luts_residual(Q, probe_lists, cents, books_res)
                qcl = [(qs[r][0], cell, lut) for r, cell, lut in luts]
                probes = ivf_probe_frame(
                    emb.filter(F.col("vec_id") < 20), F.col("vec_id"), vec,
                    cents, nprobe, "query_id",
                )
                codes = pq_encode_residual(emb, books_res, cents)
                short = _ivfadc_topk(codes, probes, qcl, k=rerank)
                return exact_rerank(short, emb, k=5)

            t, r = timed(build)
            adc_grid.append(
                {"nprobe": nprobe, "frac": frac_name, "rerank": rerank,
                 "time_s": t, "recall": r}
            )
            print(f"ivfadc {frac_name} R={rerank}: {t}s recall={r}", flush=True)
    out["grid"]["ivfadc"] = adc_grid

    # ---- flat PQ: k x rerank --------------------------------------------
    pq_grid = []
    for k_books in (pq_p["k"], min(256, 2 * pq_p["k"])):
        for rerank in (50, 100):
            books = train_pq_codebooks_from_parquet(
                path, _PQ_M, k_books, _PQ_SEED, pq_p["sample_rows"]
            )

            def build():
                luts = adc_luts(Q, books)
                qls = [(qid, luts[i].tolist()) for i, (qid, _) in enumerate(qs)]
                codes = _pq_encode(emb, books).select("vec_id", "codes")
                short = _pq_topk(codes, qls, k=rerank)
                return exact_rerank(short, emb, k=5)

            t, r = timed(build)
            pq_grid.append(
                {"k": k_books, "rerank": rerank, "time_s": t, "recall": r}
            )
            print(f"pq k={k_books} R={rerank}: {t}s recall={r}", flush=True)
    out["grid"]["pq"] = pq_grid

    # ---- OPQ: k x rerank -------------------------------------------------
    from spark_gp_spark.queries import _OPQ_ITERS

    opq_grid = []
    for k_books in (pq_p["k"], min(256, 2 * pq_p["k"])):
        for rerank in (50, 100):
            R_rot, books = train_opq_from_parquet(
                path, _PQ_M, k_books, _PQ_SEED, pq_p["sample_rows"], _OPQ_ITERS
            )

            def build():
                luts = adc_luts(_rotate_batch(Q, R_rot), books)
                qls = [(qid, luts[i].tolist()) for i, (qid, _) in enumerate(qs)]
                codes = opq_encode(emb, R_rot, books).select("vec_id", "codes")
                short = _pq_topk(codes, qls, k=rerank)
                return exact_rerank(short, emb, k=5)

            t, r = timed(build)
            opq_grid.append(
                {"k": k_books, "rerank": rerank, "time_s": t, "recall": r}
            )
            print(f"opq k={k_books} R={rerank}: {t}s recall={r}", flush=True)
    out["grid"]["opq"] = opq_grid

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
