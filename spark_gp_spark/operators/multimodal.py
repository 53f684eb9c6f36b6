"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched pandas UDFs
over ``mapInPandas``.  The decode libraries (PIL/ffmpeg/etc.) are not in this
container, so the actual decoders are STUBBED — ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
feature vector is derived from the bytes so the Spark-side plumbing (schema,
batching, partitioning) is real and testable end to end.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC_PREFIXES = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi containers
    "664c6143": "flac",
}


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a binary payload column (UTF-8 bytes of the text in the
    test corpus; in production this is the raw image/audio blob) plus the
    metadata struct every multimodal row carries."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.length(content).alias("n_bytes"),
            F.substring(F.hex(content), 1, 8).alias("magic"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def sniff_type(content: Column) -> Column:
    """Container sniffing from magic bytes — pure column expression."""
    h = F.lower(F.hex(F.substring(content, 1, 4)))
    expr = F.lit("unknown")
    for prefix, name in MAGIC_PREFIXES.items():
        expr = F.when(h.startswith(prefix.lower()), F.lit(name)).otherwise(expr)
    return expr


def _portable_features(payload: bytes, dim: int, frame: int | None = None) -> list[float]:
    """Deterministic pseudo-embedding from the payload bytes (stands in for a
    real image/audio encoder; stable across runs AND engines).

    Component j is derived with the repo's portable md5 arithmetic
    (operators/hashing.py contract):

        k_j = uint32(first 8 hex digits of md5(payload [ || ':' || frame ] || ':' || j))
        f_j = k_j / 2^32 * 2 - 1          -- exact: k_j / 2^31 - 1 in binary FP

    so the DuckDB oracle replays the feature bit-for-bit as

        ('0x' || substring(md5(text || ':' || j), 1, 8))::UBIGINT
            / 4294967296.0 * 2 - 1
    """
    base = payload if frame is None else payload + b":" + str(frame).encode()
    out = []
    for j in range(dim):
        k = int.from_bytes(hashlib.md5(base + b":" + str(j).encode()).digest()[:4], "big")
        out.append(k / 4294967296.0 * 2.0 - 1.0)
    return out


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    dim: int = 16,
    fake: bool = False,
):
    """Decode binary payloads to feature vectors via mapInPandas.

    Partition-parallel, Arrow-batched; the UDF sees pandas batches of raw
    bytes.  With ``fake=False`` this raises NotImplementedError (no decode
    libs in the image) — the scheduling/schema path is still exercised.
    """

    def decode(iterator):
        for pdf in iterator:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decoding requires PIL/ffmpeg, not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            feats = [_portable_features(bytes(b), dim) for b in pdf[content_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        decode, schema=f"{id_col} long, features array<double>"
    )


def frame_sample(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    n_frames: int = 4,
    dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Sample ``n_frames`` evenly from each video payload via mapInPandas —
    one output row per (doc, frame_idx) with a per-frame feature vector.

    The row-explosion happens INSIDE the Arrow batch (no Spark-side explode
    of the heavy binary), so the shuffle-free partition-parallel shape holds
    at scale.  Real frame extraction needs ffmpeg (absent here) and is
    stubbed exactly like ``decode_features``: ``fake=True`` derives
    deterministic per-frame features from (payload, frame_idx).
    """

    def sample(iterator):
        for pdf in iterator:
            if not fake:
                raise NotImplementedError(
                    "real video frame extraction requires ffmpeg, not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            ids, idxs, feats = [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                payload = bytes(b)
                for f_i in range(n_frames):
                    ids.append(i)
                    idxs.append(f_i)
                    feats.append(_portable_features(payload, dim, frame=f_i))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        sample, schema=f"{id_col} long, frame_idx int, features array<double>"
    )


def resize_binary(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    target_bytes: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Re-encode each payload to a target size via mapInPandas (the image
    resize / audio downsample slot).  Real resizing needs PIL/ffmpeg and is
    stubbed; ``fake=True`` deterministically truncates or zero-pads so the
    schema/batching contract — binary in, binary + updated metadata out —
    is exercised for real."""

    def resize(iterator):
        for pdf in iterator:
            if not fake:
                raise NotImplementedError(
                    "real image/audio resizing requires PIL/ffmpeg, not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            out = []
            for b in pdf[content_col]:
                payload = bytes(b)[:target_bytes]
                out.append(payload.ljust(target_bytes, b"\x00"))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    content_col: out,
                    "n_bytes": [len(o) for o in out],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        resize, schema=f"{id_col} long, {content_col} binary, n_bytes int"
    )


def binary_stats(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Metadata relation over binary payloads — no Python, pure projection."""
    c = F.col(content_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_bytes"),
        sniff_type(c).alias("sniffed_type"),
        F.md5(c).alias("content_hash"),
    )


def media_exact_dedup(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Byte-identical media dedup — the FIRST dedup tier of every multimodal
    pipeline (re-hosted copies of the same image/audio blob are byte-equal
    far more often than text re-crawls are): group payloads by content
    hash, keep the min-id row, report copy count and the bytes reclaimable
    by dropping the duplicates.

    Output: (content_hash, keep_id, n_copies, dup_bytes) — one row per
    distinct payload; dup_bytes = payload size × (n_copies − 1).

    Scale shape: identical to exact_dedup — one hash-aggregate shuffle over
    the 16-byte md5 with map-side partial aggregation; the BINARY payload
    itself never shuffles (only its hash and length leave the scan)."""
    size = F.length(F.col(content_col)).cast("long")
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
            (F.max(size) * (F.count("*") - 1)).alias("dup_bytes"),
        )
    )
