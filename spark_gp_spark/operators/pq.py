"""Product quantization (PQ): codebook training, encoding, and ADC top-k.

The second rung of the vector-compression ladder after scalar quantization
(operators/quantize.py): split each d-dim vector into ``m`` subvectors,
k-means each subspace into ``k`` centroids, and store one small code per
subspace — d·4 bytes shrink to m·log2(k) bits (64-dim float32 → 8 bytes at
m=8, k=16, a 32× cut), the layout FAISS's IVFADC popularized (Jégou et al.
2011, "Product Quantization for Nearest Neighbor Search").  Search uses
asymmetric distance computation (ADC): per query, an (m × k) lookup table of
subspace distances is built once, and each corpus point scores as m table
lookups — no float vector ever read at scan time.

No reference counterpart (the reference is a GP library, /root/reference);
this extends the north-star similarity surface.

Spark shape (the 100 TB plan):
- codebooks are trained driver-side on a deterministic sample (same
  discipline as ivf.train_centroids_from_parquet — reproducible OUTSIDE
  Spark so the DuckDB oracle derives identical codebooks);
- encoding is one Arrow-batched pandas UDF per corpus pass — a pure
  projection, zero shuffle; codes thereafter are the only thing stored;
- ADC scan is corpus-codes × broadcast query LUTs: the scored relation is
  O(N·Q) rows of m integer lookups (pure codegen, no Python), with the
  fixed query set keeping Q constant at any scale; compose with
  operators/ivf.py cell pruning for sublinear scans.

Oracle-parity contract: centroids round to 6 decimals; distance sums
accumulate LEFT-TO-RIGHT over dimensions (scalar adds, matching the SQL
rendering's unrolled `(v[1]-c)*(v[1]-c) + …`); argmin tie-breaks on the
first minimal index in both engines; ADC sums fold subspaces in order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def auto_pq_params(n: int) -> dict:
    """Corpus-size-derived PQ parameters, paired with ``ivf.auto_ivf_params``
    (same 100 TB auto-sizing promotion — VERDICT r7 #1): ``k`` centroids per
    subspace grow with the effective training sample (≥20 points per
    centroid, capped at 256 = one byte per code), instead of freezing the
    16-centroid codebook a 500-row tuning corpus could support.  The /20
    divisor is the r11 recall/time knee (tools/ann_knee_sweep.py, sf0.1
    bench corpus with shortlist R=100: k=sample/40 → PQ 0.75 / OPQ 0.81
    recall@5, k=sample/20 → PQ 0.83 / OPQ 0.88, identical wall time —
    20 points per subspace centroid is plenty because each subspace
    k-means fits only d/m dimensions).  ``m`` stays a caller choice (it
    divides the vector width).  Pure function of N — oracle-derivable
    from parquet metadata."""
    from .ivf import auto_ivf_params

    sample_rows = auto_ivf_params(n)["sample_rows"]
    return {
        "k": int(min(256, max(16, min(n, sample_rows) // 20))),
        "sample_rows": sample_rows,
    }


def train_pq_codebooks_from_parquet(
    path: str,
    m: int = 8,
    k: int | None = None,
    seed: int = 5,
    sample_rows: int | None = None,
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, k, d/m) codebooks: driver-side k-means per subspace over a
    deterministic hash-sample of a parquet file (pyarrow + numpy, no Spark
    job — must be reproducible outside Spark for the correctness oracle;
    see ivf.hash_sample_vectors for the pushed-down unbiased sampling).
    ``k=None`` / ``sample_rows=None`` auto-size from the corpus row count
    (``auto_pq_params``).  Trained once per (file fingerprint, params) per
    process; persistable via operators/ann_index.py."""
    from .ivf import _cached_artifact, _file_fingerprint, hash_sample_vectors, parquet_num_rows

    if k is None or sample_rows is None:
        auto = auto_pq_params(parquet_num_rows(path))
        k = auto["k"] if k is None else k
        sample_rows = auto["sample_rows"] if sample_rows is None else sample_rows
    key = ("pq_books", path, _file_fingerprint(path), m, k, seed, sample_rows, vec_col)
    return _cached_artifact(
        key,
        lambda: train_pq_codebooks(
            hash_sample_vectors(path, sample_rows, vec_col), m, k, seed
        ),
    )


def train_pq_codebooks(
    X: np.ndarray,
    m: int = 8,
    k: int = 16,
    seed: int = 5,
    init_books: np.ndarray | None = None,
) -> np.ndarray:
    """(m, k, d/m) codebooks from an in-memory (n, d) sample.
    ``init_books``: optional (m, k, d/m) warm start per subspace (the OPQ
    alternation reuse — see active_set._local_kmeans)."""
    from ..active_set import _local_kmeans

    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    ds = d // m
    books = np.empty((m, k, ds), dtype=np.float64)
    for s in range(m):
        books[s] = _local_kmeans(
            X[:, s * ds : (s + 1) * ds],
            k,
            seed + s,
            init=None if init_books is None else init_books[s],
        )
    return np.round(books, 6)


def assign_cells_np(X: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """0-based nearest-centroid assignment replicating ivf._sq_dists_udf's
    left-to-right dimension accumulation and first-min tie-break, so a
    driver-side sample lands in the SAME cells Spark assigns (1-based cells
    in ivf_assign_frame are this + 1)."""
    C = np.asarray(centroids, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for j in range(C.shape[1]):  # left-to-right over dims
        diff = X[:, j, None] - C[None, :, j]
        acc = acc + diff * diff
    return np.argmin(acc, axis=1)


def probe_cells_np(X: np.ndarray, centroids: np.ndarray, nprobe: int) -> list[list[int]]:
    """Per row, the 1-based ids of the ``nprobe`` nearest cells ordered by
    (distance, cell index) — replicates ivf.ivf_probe_frame's array_sort of
    (d, i) structs so driver-baked per-cell LUTs cover exactly the cells the
    Spark probe join will produce."""
    C = np.asarray(centroids, dtype=np.float64)
    acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for j in range(C.shape[1]):  # left-to-right over dims
        diff = X[:, j, None] - C[None, :, j]
        acc = acc + diff * diff
    out = []
    for r in range(X.shape[0]):
        order = sorted(range(C.shape[0]), key=lambda i: (acc[r, i], i))[:nprobe]
        out.append([i + 1 for i in order])
    return out


def train_pq_codebooks_residual_from_parquet(
    path: str,
    centroids: np.ndarray,
    m: int = 8,
    k: int | None = None,
    seed: int = 5,
    sample_rows: int | None = None,
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, k, d/m) codebooks over RESIDUALS (vector − assigned coarse
    centroid) — the encoding that makes IVFADC recall hold at high
    compression (Jégou et al. 2011 §IV): residuals concentrate near zero,
    so the same k centroids per subspace cover them far more densely than
    they cover raw vectors.  Same deterministic hash-sample as the raw
    trainer; reproducible outside Spark for the correctness oracle.
    ``k=None`` / ``sample_rows=None`` auto-size from the corpus row count
    (``auto_pq_params``).  Trained once per (file fingerprint, params,
    centroids) per process; persistable via operators/ann_index.py."""
    from .ivf import _cached_artifact, _file_fingerprint, hash_sample_vectors, parquet_num_rows

    if k is None or sample_rows is None:
        auto = auto_pq_params(parquet_num_rows(path))
        k = auto["k"] if k is None else k
        sample_rows = auto["sample_rows"] if sample_rows is None else sample_rows
    C = np.asarray(centroids, dtype=np.float64)

    def build() -> np.ndarray:
        X = hash_sample_vectors(path, sample_rows, vec_col)
        cells = assign_cells_np(X, C)
        return train_pq_codebooks(X - C[cells], m, k, seed)

    key = ("pq_books_residual", path, _file_fingerprint(path), m, k, seed,
           sample_rows, vec_col, C.tobytes())
    return _cached_artifact(key, build)


def _encode_udf(codebooks: np.ndarray, rotation: np.ndarray | None = None):
    """Arrow-batched pandas UDF: per vector, struct of (codes array<int>,
    reconstruction mse double).  Dimension accumulation is left-to-right
    scalar adds — the oracle-parity association (see module docstring).
    With ``rotation`` (OPQ), each vector is rotated first via the same
    left-to-right fold (_rotate_batch) before encoding."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, ds)
    R = None if rotation is None else np.asarray(rotation, dtype=np.float64)
    m, k, ds = B.shape
    out_type = StructType(
        [
            StructField("codes", ArrayType(IntegerType())),
            StructField("mse", DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def encode(v: pd.Series) -> pd.DataFrame:
        X = np.asarray(v.tolist(), dtype=np.float64)  # (n, d)
        if R is not None:
            X = _rotate_batch(X, R)
        codes, sq = _encode_batch(X, B)
        return pd.DataFrame({"codes": list(codes), "mse": sq / (m * ds)})

    return encode


def _encode_batch(X: np.ndarray, B: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Shared encoding kernel: per row, subspace codes (first-min argmin over
    left-to-right dim sums) and the summed squared reconstruction error —
    the oracle-parity association (module docstring)."""
    m, k, ds = B.shape
    n = X.shape[0]
    codes = np.empty((n, m), dtype=np.int32)
    sq = np.zeros(n, dtype=np.float64)
    for s in range(m):
        sub = X[:, s * ds : (s + 1) * ds]  # (n, ds)
        acc = np.zeros((n, k), dtype=np.float64)
        for j in range(ds):  # left-to-right over dims
            diff = sub[:, j, None] - B[None, s, :, j]
            acc = acc + diff * diff
        cs = np.argmin(acc, axis=1)  # first-min ties, like SQL's (d, i) sort
        codes[:, s] = cs
        recon = B[s, cs]  # (n, ds)
        for j in range(ds):  # same order as the SQL unrolled sum
            e = sub[:, j] - recon[:, j]
            sq = sq + e * e
    return codes, sq


def _encode_residual_udf(codebooks: np.ndarray, centroids: np.ndarray):
    """Arrow-batched pandas UDF for residual PQ: per vector, struct of
    (cell int 1-based, codes array<int>, mse double).  The coarse
    assignment uses the same left-to-right accumulation as ivf's
    _sq_dists_udf, so the emitted cell matches ivf_assign_frame row for
    row; codes then encode (vector − centroid[cell])."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    B = np.asarray(codebooks, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    m, k, ds = B.shape
    out_type = StructType(
        [
            StructField("cell", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
            StructField("mse", DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def encode(v: pd.Series) -> pd.DataFrame:
        X = np.asarray(v.tolist(), dtype=np.float64)  # (n, d)
        cells = assign_cells_np(X, C)
        R = X - C[cells]
        codes, sq = _encode_batch(R, B)
        return pd.DataFrame(
            {
                "cell": (cells + 1).astype(np.int32),
                "codes": list(codes),
                "mse": sq / (m * ds),
            }
        )

    return encode


def pq_encode_residual(
    df: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell, codes array<int>, mse) — the IVFADC stored representation:
    coarse cell plus PQ codes of the residual.  Pure projection, zero
    shuffle; the cell column doubles as the inverted-file key."""
    enc = _encode_residual_udf(codebooks, centroids)(
        F.col(vec_col).cast("array<double>")
    )
    return df.select(F.col(id_col), enc.alias("_e")).select(
        id_col,
        F.col("_e.cell").alias("cell"),
        F.col("_e.codes").alias("codes"),
        F.round(F.col("_e.mse"), 9).alias("mse"),
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """(id, codes array<int>, mse) — the stored PQ representation plus
    reconstruction error.  Pure projection, zero shuffle.  ``rotation``
    (OPQ) encodes the rotated vector instead; see opq_encode."""
    enc = _encode_udf(codebooks, rotation)(F.col(vec_col).cast("array<double>"))
    return df.select(
        F.col(id_col),
        enc.alias("_e"),
    ).select(
        id_col,
        F.col("_e.codes").alias("codes"),
        F.round(F.col("_e.mse"), 9).alias("mse"),
    )


def read_query_vectors(
    path: str, max_id: int = 20, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[tuple[int, np.ndarray]]:
    """The fixed query set (id < max_id) as driver-side vectors, read via
    pyarrow so the correctness oracle can derive identical ADC tables.
    The id predicate is pushed into the scan (row-group statistics prune
    whole groups), so the driver materializes max_id rows, not the corpus;
    cached per (file fingerprint, max_id)."""
    from .ivf import _cached_artifact, _file_fingerprint

    def build() -> list[tuple[int, np.ndarray]]:
        import pyarrow.parquet as pq

        table = pq.read_table(
            path, columns=[id_col, vec_col], filters=[(id_col, "<", max_id)]
        )
        out = [
            (int(i), np.asarray(v, dtype=np.float64))
            for i, v in zip(
                table.column(id_col).to_pylist(), table.column(vec_col).to_pylist()
            )
        ]
        return sorted(out, key=lambda t: t[0])

    key = ("query_vectors", path, _file_fingerprint(path), max_id, vec_col, id_col)
    return _cached_artifact(key, build)


def adc_luts(queries: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(Q, m, k) asymmetric-distance lookup tables: squared L2 between each
    query subvector and every centroid.  Tiny (Q·m·k doubles) — these are
    baked as literals on BOTH engines, so their own summation order is
    irrelevant to parity."""
    B = np.asarray(codebooks, dtype=np.float64)
    m, k, ds = B.shape
    Q = np.asarray(queries, dtype=np.float64)
    luts = np.empty((Q.shape[0], m, k), dtype=np.float64)
    for s in range(m):
        sub = Q[:, s * ds : (s + 1) * ds]  # (q, ds)
        diff = sub[:, None, :] - B[None, s]  # (q, k, ds)
        luts[:, s, :] = np.einsum("qkd,qkd->qk", diff, diff)
    return luts


def adc_luts_residual(
    queries: np.ndarray,
    probe_lists: list[list[int]],
    centroids: np.ndarray,
    codebooks: np.ndarray,
) -> list[tuple[int, int, list[list[float]]]]:
    """Per (query row, probed cell) ADC lookup tables over the query
    RESIDUAL (q − centroid[cell]), flattened as [(row_index, cell_1based,
    (m × k) lut), ...].  The FIRST element is the query's ROW index into
    ``queries``/``probe_lists`` — NOT a query id; callers must map it to
    their id space (queries.py:ivfadc_topk does ``qs[r][0]``).  Only probed
    cells get a LUT — Q·nprobe tables, each m·k doubles; baked as literals
    on both engines, so their internal summation order is
    parity-irrelevant."""
    C = np.asarray(centroids, dtype=np.float64)
    Q = np.asarray(queries, dtype=np.float64)
    out = []
    for r, cells in enumerate(probe_lists):
        for cell in cells:
            lut = adc_luts((Q[r] - C[cell - 1])[None, :], codebooks)[0]
            out.append((r, cell, lut.tolist()))
    return out


def _luts_frame(codes: DataFrame, query_luts: list[tuple[int, list[list[float]]]]):
    """Broadcastable (query_id, lut) frame + subspace count m."""
    spark = codes.sparkSession
    m = len(query_luts[0][1])
    luts_df = spark.createDataFrame(
        [(int(q), lut) for q, lut in query_luts],
        "query_id bigint, lut array<array<double>>",
    )
    return luts_df, m


def _adc_rank(scored: DataFrame, m: int, k: int) -> DataFrame:
    """Shared ADC tail for pq_topk / ivfadc_topk: the left-to-right LUT
    distance fold, then rank on the RAW double (bit-identical across
    engines — rounding only the emitted column means a rounding-tie can
    never reorder ranks differently between engines)."""
    dist: Column = F.lit(0.0)
    for s in range(m):  # left-to-right fold over subspaces
        dist = dist + F.get(F.col("lut").getItem(s), F.get("codes", s))
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_d", dist)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("_d", 6).alias("adc_dist"),
            "rank",
        )
    )


def pq_topk(
    codes: DataFrame,
    query_luts: list[tuple[int, list[list[float]]]],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over encoded corpus ``codes`` (id, codes array<int>).

    ``query_luts``: [(query_id, (m × k) lut), ...] — small, broadcast.
    Output: (query_id, neighbor_id, adc_dist, rank) with rank ascending by
    (distance, neighbor_id); m integer lookups per scored pair, all
    whole-stage codegen.
    """
    luts_df, m = _luts_frame(codes, query_luts)
    scored = codes.select(
        F.col(id_col).alias("neighbor_id"), F.col("codes")
    ).crossJoin(F.broadcast(luts_df)).filter(F.col("neighbor_id") != F.col("query_id"))
    return _adc_rank(scored, m, k)


def ivfadc_topk(
    codes: DataFrame,
    queries_probe: DataFrame,
    query_cell_luts: list[tuple[int, int, list[list[float]]]],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-pruned ADC top-k with RESIDUAL encoding — the full FAISS
    ``IVF…,PQ…`` composition (Jégou et al. 2011 §IV): corpus codes quantize
    (vector − assigned centroid), and each probed (query, cell) pair gets
    its own LUT over the query's residual against THAT cell's centroid.

    Inputs: ``codes`` = pq_encode_residual output (id, cell, codes) — the
    cell column doubles as the inverted file; ``queries_probe`` = OPTIONAL
    ivf.ivf_probe_frame output (query_id, cell) used ONLY by the eager
    wiring diagnostic below — pass None to skip it (the registry entries
    do since r13: the probe job + collect cost ~0.6 s warm per entry and
    scoring never reads it; the numpy/JVM probe parity is pytest-gated);
    ``query_cell_luts`` = adc_luts_residual output [(query_id, cell, lut)].
    Candidates per query ≈ nprobe·N/n_cells, each scored as m integer LUT
    lookups joined on (query_id, cell) — still one equi-join plus a
    broadcast, no Python at scan time; the flat ``pq_topk`` is the recall
    ceiling (gated in tests/test_pq.py).
    """
    if not query_cell_luts:
        raise ValueError(
            "query_cell_luts is empty — adc_luts_residual produced no "
            "(query, cell) tables; check the query set and probe_lists"
        )
    spark = codes.sparkSession
    m = len(query_cell_luts[0][2])
    luts_df = spark.createDataFrame(
        [(int(q), int(c), lut) for q, c, lut in query_cell_luts],
        "query_id bigint, cell int, lut array<array<double>>",
    )
    # queries_probe is implied by luts_df (same (query, cell) pairs); when a
    # caller supplies its ivf_probe_frame output anyway, VERIFY agreement
    # eagerly — a silent intersection would drop candidates and degrade
    # recall instead of failing loudly.  The frame is Q·nprobe rows, so ONE
    # collect at plan-build time settles the comparison.  Scoring is driven
    # by luts_df alone, so the check is a wiring diagnostic, not a
    # correctness gate — and it must NOT hard-fail on a last-ulp distance
    # tie: the JVM and numpy round the squared distances independently, so
    # two near-equidistant cells can swap across the nprobe cutoff between
    # engines (ADVICE r7e).  A tie divergence has a precise shape — same
    # query ids, same per-query cell COUNT, equal-size symmetric per-query
    # diffs — which real miswiring (different query set, nprobe, or
    # centroids) does not produce; tolerate exactly that shape with a
    # warning and raise on everything else.
    if queries_probe is not None:
        got = {(int(r[0]), int(r[1]))
               for r in queries_probe.select("query_id", "cell").collect()}
        expected = {(int(q), int(c)) for q, c, _ in query_cell_luts}
        if got != expected:
            from collections import Counter

            got_n = Counter(q for q, _ in got)
            exp_n = Counter(q for q, _ in expected)
            tie_shaped = got_n == exp_n
            if tie_shaped:
                diff_q = {q for q, _ in (got ^ expected)}
                tie_shaped = all(
                    sum(1 for p in got - expected if p[0] == q)
                    == sum(1 for p in expected - got if p[0] == q)
                    for q in diff_q
                )
            if not tie_shaped:
                raise ValueError(
                    "queries_probe and query_cell_luts disagree on the probed "
                    "(query_id, cell) pairs — the LUTs were built from a "
                    f"different probe list than the Spark-side ivf_probe_frame "
                    f"(only-in-probe={sorted(got - expected)[:5]}, "
                    f"only-in-luts={sorted(expected - got)[:5]})"
                )
            import warnings

            warnings.warn(
                f"ivfadc_topk: probe frame and LUTs differ on "
                f"{len(got ^ expected)} (query, cell) pairs in a tie-"
                "compatible shape (equal per-query counts) — treating as a "
                "cross-engine distance tie; candidates follow the LUTs",
                RuntimeWarning,
                stacklevel=2,
            )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(luts_df), "cell")  # inverted-file probe + LUT in one join
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    return _adc_rank(scored, m, k)


def exact_rerank(
    shortlist: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-cosine re-rank of an ADC shortlist — the FAISS ``refine`` step
    (IndexRefineFlat): the compressed-domain scan keeps its sublinear cost,
    but the final ordering comes from true vectors, so top-k recall is
    bounded by shortlist membership instead of PQ quantization error.  This
    is what makes an auto-sized IVFADC usable at scale: ADC retrieves a
    shortlist of R ≫ k candidates per query, and only those Q·R rows ever
    touch a float vector again.

    Spark shape: the shortlist (Q·R rows, bounded by the fixed query set)
    broadcasts into one semi-join against the vector relation — a single
    corpus scan, no shuffle of the corpus; query vectors broadcast
    likewise.  Scoring/rounding/ranking reuse the exact contract of
    ``similarity.cosine_topk`` (round 6 dp, rank by (cosine DESC, id)) so
    the DuckDB oracle replays it bit-for-bit.

    ``shortlist``: (query_id, neighbor_id) — e.g. ivfadc_topk output at
    k=R.  ``vectors``: (id, vec) relation covering both sides.  Output:
    (query_id, neighbor_id, cosine, rank) with rank ≤ k."""
    from .similarity import norm, paired_cosine

    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    # restrict the query side to the shortlist's DISTINCT query ids BEFORE
    # broadcasting: the broadcast payload is Q rows (the fixed query set),
    # never the full vector relation — a corpus-sized q broadcast would OOM
    # the driver at production N even though results are identical
    qids = shortlist.select(F.col("query_id").alias(id_col)).distinct()
    q = v.join(F.broadcast(qids), id_col, "left_semi").select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_n").alias("qn"),
    )
    c = v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_v").alias("cv"),
        F.col("_n").alias("cn"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine",
            F.round(paired_cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 6),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# OPQ: optimized product quantization (learned rotation)
# ---------------------------------------------------------------------------


def _rotate_batch(X: np.ndarray, R: np.ndarray) -> np.ndarray:
    """(n, d) @ learned rotation, accumulated LEFT-TO-RIGHT over INPUT
    dimensions — element (r, j) folds as 0.0 + x[0]·R[j,0] + x[1]·R[j,1] +
    … exactly like the oracle SQL's unrolled sum, so the rotated doubles
    (and every code derived from them) are bit-identical across engines.
    np.dot would be faster but sums pairwise/BLAS-ordered — parity-unsafe."""
    X = np.asarray(X, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)
    n, d = X.shape
    acc = np.zeros((n, R.shape[0]), dtype=np.float64)
    for i in range(d):  # left-to-right over input dims
        acc = acc + X[:, i : i + 1] * R[None, :, i]
    return acc


def train_opq(
    X: np.ndarray, m: int = 8, k: int = 16, seed: int = 5, iters: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """(rotation (d, d), codebooks (m, k, d/m)) — non-parametric OPQ
    (Ge et al. 2013, "Optimized Product Quantization", §3.2; equivalently
    Norouzi & Fleet's Cartesian k-means): alternate

      1. fix R: PQ k-means per subspace over the rotated sample R·x;
      2. fix codes: orthogonal Procrustes — R = U·Vᵀ from SVD(Yᵀ X),
         Y the quantized reconstructions —

    which monotonically lowers Σ‖R x − q(R x)‖².  PQ assumes the signal
    spreads evenly and independently across subspaces; the rotation makes
    that true (balances variance, decorrelates), cutting quantization MSE
    on correlated/anisotropic embeddings at IDENTICAL code size.  The
    final R rounds to 6 decimals (engine-portable literal) and codebooks
    retrain once against the ROUNDED rotation so stored codes and oracle
    replay agree bit-for-bit."""
    X = np.asarray(X, dtype=np.float64)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    ds = d // m
    R = np.eye(d)
    # WARM-START the per-subspace k-means across alternations (standard
    # Cartesian k-means practice, r10): once R stabilizes the centers move
    # little, so Lloyd converges in 1-3 iterations instead of ~20 — this is
    # what makes the one-time corpus-sized OPQ train cheap.  Deterministic:
    # pure numpy, no RNG on the warm path; changes the learned rotation's
    # numerics, so the opq entries re-windowed the round this landed.
    books = None
    for _ in range(iters):
        Z = X @ R.T  # training-side rotation: parity-irrelevant, fast path
        books = train_pq_codebooks(Z, m, k, seed, init_books=books)
        codes, _ = _encode_batch(Z, books)
        Y = np.concatenate(
            [books[s, codes[:, s]] for s in range(m)], axis=1
        )  # (n, d) reconstructions
        U, _, Vt = np.linalg.svd(Y.T @ X)
        R = U @ Vt
    R = np.round(R, 6)
    books = train_pq_codebooks(_rotate_batch(X, R), m, k, seed, init_books=books)
    return R, books


def train_opq_from_parquet(
    path: str,
    m: int = 8,
    k: int = 16,
    seed: int = 5,
    sample_rows: int = 4000,
    iters: int = 8,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ rotation + codebooks over the deterministic hash-sample of a
    parquet file (same pushed-down sampling discipline as
    train_pq_codebooks_from_parquet); cached per (file fingerprint,
    params) per process."""
    from .ivf import _cached_artifact, _file_fingerprint, hash_sample_vectors

    key = ("opq", path, _file_fingerprint(path), m, k, seed, sample_rows,
           iters, vec_col)
    return _cached_artifact(
        key,
        lambda: train_opq(hash_sample_vectors(path, sample_rows, vec_col), m, k, seed, iters),
    )


def opq_encode(
    df: DataFrame,
    rotation: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>, mse) — PQ codes of the ROTATED vector.  Same
    zero-shuffle Arrow projection as pq_encode (it IS pq_encode with the
    rotation shipped in the UDF closure).  mse is the reconstruction error
    in rotated space, which equals the original-space error up to the 1e-6
    rounding of R (rotations preserve L2)."""
    return pq_encode(df, codebooks, vec_col=vec_col, id_col=id_col, rotation=rotation)
