"""Isolated per-query timing + plan capture for the optimization rounds.

Times individual registry queries with the noop sink (guide §1.4) in a
fresh session configured exactly like bench.py (same master/shuffle/AQE
settings), after the same JVM + Python-worker + ANN-artifact warmups, so a
query's number here is its bench steady-state cost without the other ~95
entries around it.  Optionally captures .explain("formatted") per query.

Usage:
    python tools/time_query.py [--sf DIR] [--reps N] [--explain OUTDIR]
                               [--no-warm-ann] query [query ...]

Env: SPARK_GRAFT_CPUS (default 32) — master local[N], like bench.py.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain", default=None, metavar="OUTDIR")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--no-warm-ann", action="store_true")
    args = ap.parse_args()

    import bench  # reuse make_spark so configs never drift from the bench

    spark = bench.make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from spark_gp_spark.queries import QUERIES

    # same untimed warmups as bench.py main()
    from spark_gp_spark.queries import q1_pricing_summary

    q1_pricing_summary(spark, args.sf).write.format("noop").mode("overwrite").save()

    @F.pandas_udf(DoubleType())
    def _warm(v):
        return v * 1.0

    spark.range(10_000).repartition(int(bench.CPUS)).select(
        _warm(F.col("id").cast("double")).alias("x")
    ).agg({"x": "sum"}).collect()

    if not args.no_warm_ann:
        needs_ann = any(
            any(t in q for t in ("ivf", "pq_", "opq", "lsh", "ann", "semdedup",
                                 "hard_negatives", "cluster_", "embedding_neardup"))
            for q in args.queries
        )
        if needs_ann:
            from spark_gp_spark.operators.ivf import train_centroids_from_parquet
            from spark_gp_spark.operators.pq import (
                read_query_vectors,
                train_opq_from_parquet,
                train_pq_codebooks_from_parquet,
                train_pq_codebooks_residual_from_parquet,
            )
            from spark_gp_spark.queries import (
                _IVF_K, _IVF_SAMPLE, _IVF_SEED, _OPQ_ITERS,
                _PQ_K, _PQ_M, _PQ_SAMPLE, _PQ_SEED,
                ensure_ann_codes,
            )
            emb = f"{args.sf}/embeddings.parquet"
            cents = train_centroids_from_parquet(emb, _IVF_K, _IVF_SEED, _IVF_SAMPLE)
            train_pq_codebooks_from_parquet(emb, _PQ_M, _PQ_K, _PQ_SEED, _PQ_SAMPLE)
            train_pq_codebooks_residual_from_parquet(
                emb, cents, _PQ_M, _PQ_K, _PQ_SEED, _PQ_SAMPLE
            )
            train_opq_from_parquet(emb, _PQ_M, _PQ_K, _PQ_SEED, _PQ_SAMPLE, _OPQ_ITERS)
            read_query_vectors(emb, max_id=20)
            from spark_gp_spark.operators.ivf import auto_ivf_params, parquet_num_rows
            from spark_gp_spark.operators.pq import auto_pq_params

            n_emb = parquet_num_rows(emb)
            ivf_auto, pq_auto = auto_ivf_params(n_emb), auto_pq_params(n_emb)
            train_centroids_from_parquet(emb, seed=_IVF_SEED)
            auto_cents = train_centroids_from_parquet(
                emb, ivf_auto["cells"], _IVF_SEED, ivf_auto["sample_rows"]
            )
            train_pq_codebooks_residual_from_parquet(
                emb, auto_cents, _PQ_M, pq_auto["k"], _PQ_SEED, pq_auto["sample_rows"]
            )
            train_pq_codebooks_from_parquet(
                emb, _PQ_M, pq_auto["k"], _PQ_SEED, pq_auto["sample_rows"]
            )
            train_opq_from_parquet(
                emb, _PQ_M, pq_auto["k"], _PQ_SEED, pq_auto["sample_rows"], _OPQ_ITERS
            )
            ensure_ann_codes(spark, args.sf)

    results: dict[str, list[float]] = {}
    for name in args.queries:
        fn = QUERIES[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"time_query: {name} rep{rep}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        results[name] = times
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            with open(
                os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
        print(f"{name}: {times}", flush=True)

    spark.stop()
    print("RESULTS", {k: v for k, v in results.items()})


if __name__ == "__main__":
    main()
