"""Persisted ANN index artifacts: train once, save, reuse across processes.

The IVF/PQ trainers (operators/ivf.py, operators/pq.py) are deterministic
and process-cached, but a real 100 TB pipeline trains its coarse centroids
and PQ codebooks ONCE, persists them next to the encoded corpus, and every
later query/encode job loads the few-KB artifact instead of re-scanning for
a training sample — the same train/save/load discipline the GP models get
from their MLWriter surface (estimator_base.py:216-275).  No reference
counterpart (the reference is a GP library, /root/reference); this
completes the north-star ANN surface.

Format: one parquet file (pyarrow, float64-exact — parquet doubles round-
trip bit-for-bit) with rows (kind, i, j, vec):

- kind='centroids': i = centroid row, vec = (d,) centroid — rebuilds (k, d)
- kind='codebooks': i = subspace, j = codebook row, vec = (d/m,) centroid —
  rebuilds (m, k, d/m)
- kind='rotation': i = output row, vec = (d,) row of the OPQ rotation —
  rebuilds (d, d)

plus a JSON params blob in the parquet schema metadata.  A directory-of-
parquet layout (vs npz/pickle) keeps the artifact readable by ANY engine —
Spark, DuckDB, pandas — and safe to ship to executors as a broadcast.

Parameter provenance: the artifact freezes whatever configuration it was
BUILT with.  Fresh builds that take the trainers' defaults get the
corpus-auto-sized parameters (ivf.auto_ivf_params / pq.auto_pq_params —
cells ≈ √N etc.); the registry's persisted-index queries deliberately pin
the explicit sf0.01 oracle configuration instead, so their hash gates stay
stable (the auto path is gated by the ivf_topk_auto / ivfadc_topk_auto
entries).  A production corpus that grows materially should re-train and
re-save — the artifact does not re-size itself.
"""

from __future__ import annotations

import json
import os

import numpy as np

_META_KEY = b"spark_gp_ann_index"


def save_ann_index(
    path: str,
    *,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    rotation: np.ndarray | None = None,
    params: dict | None = None,
) -> str:
    """Write centroids (k, d), codebooks (m, k, d/m), and/or an OPQ
    rotation (d, d) plus ``params`` to ``path`` (a parquet file; parent
    dirs created).  Returns ``path``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if centroids is None and codebooks is None and rotation is None:
        raise ValueError(
            "nothing to save: pass centroids, codebooks, and/or rotation"
        )
    kinds: list[str] = []
    i_idx: list[int] = []
    j_idx: list[int] = []
    vecs: list[list[float]] = []
    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        if C.ndim != 2:
            raise ValueError(f"centroids must be (k, d), got shape {C.shape}")
        for i, row in enumerate(C):
            kinds.append("centroids")
            i_idx.append(i)
            j_idx.append(0)
            vecs.append([float(x) for x in row])
    if rotation is not None:
        R = np.asarray(rotation, dtype=np.float64)
        if R.ndim != 2 or R.shape[0] != R.shape[1]:
            raise ValueError(f"rotation must be square (d, d), got shape {R.shape}")
        for i, row in enumerate(R):
            kinds.append("rotation")
            i_idx.append(i)
            j_idx.append(0)
            vecs.append([float(x) for x in row])
    if codebooks is not None:
        B = np.asarray(codebooks, dtype=np.float64)
        if B.ndim != 3:
            raise ValueError(f"codebooks must be (m, k, d/m), got shape {B.shape}")
        for s in range(B.shape[0]):
            for j in range(B.shape[1]):
                kinds.append("codebooks")
                i_idx.append(s)
                j_idx.append(j)
                vecs.append([float(x) for x in B[s, j]])
    table = pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "i": pa.array(i_idx, pa.int32()),
            "j": pa.array(j_idx, pa.int32()),
            "vec": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    meta = dict(table.schema.metadata or {})
    meta[_META_KEY] = json.dumps(params or {}).encode()
    table = table.replace_schema_metadata(meta)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    # write-then-rename: os.replace is atomic on one filesystem, so a reader
    # (another process sharing the deterministic artifact path) never sees a
    # half-written file — it sees the old artifact or the new one
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def load_ann_index(path: str) -> dict:
    """Read an index written by ``save_ann_index``: returns a dict with any
    of 'centroids' ((k, d) float64), 'codebooks' ((m, k, d/m) float64),
    'rotation' ((d, d) float64), and 'params' (the saved dict)."""
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    out: dict = {}
    meta = table.schema.metadata or {}
    out["params"] = json.loads(meta.get(_META_KEY, b"{}").decode())
    kinds = table.column("kind").to_pylist()
    i_idx = table.column("i").to_pylist()
    j_idx = table.column("j").to_pylist()
    vecs = table.column("vec").to_pylist()
    cent_rows = {i: v for k_, i, v in zip(kinds, i_idx, vecs) if k_ == "centroids"}
    if cent_rows:
        if set(cent_rows) != set(range(len(cent_rows))):
            raise ValueError(
                f"corrupt index at {path}: centroid rows are not contiguous "
                f"0..{len(cent_rows) - 1}"
            )
        out["centroids"] = np.asarray(
            [cent_rows[i] for i in range(len(cent_rows))], dtype=np.float64
        )
    rot_rows = {i: v for k_, i, v in zip(kinds, i_idx, vecs) if k_ == "rotation"}
    if rot_rows:
        if set(rot_rows) != set(range(len(rot_rows))):
            raise ValueError(
                f"corrupt index at {path}: rotation rows are not contiguous "
                f"0..{len(rot_rows) - 1}"
            )
        R = np.asarray(
            [rot_rows[i] for i in range(len(rot_rows))], dtype=np.float64
        )
        if R.shape[0] != R.shape[1]:
            raise ValueError(
                f"corrupt index at {path}: rotation is {R.shape}, not square"
            )
        out["rotation"] = R
    book_rows = {
        (i, j): v
        for k_, i, j, v in zip(kinds, i_idx, j_idx, vecs)
        if k_ == "codebooks"
    }
    if book_rows:
        m = max(i for i, _ in book_rows) + 1
        k = max(j for _, j in book_rows) + 1
        if set(book_rows) != {(s, j) for s in range(m) for j in range(k)}:
            raise ValueError(
                f"corrupt index at {path}: codebook grid is not a full "
                f"{m}x{k} (subspace, centroid) lattice"
            )
        out["codebooks"] = np.asarray(
            [[book_rows[(s, j)] for j in range(k)] for s in range(m)],
            dtype=np.float64,
        )
    return out
