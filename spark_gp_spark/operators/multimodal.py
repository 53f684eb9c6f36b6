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

import numpy as np
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


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding from the payload bytes (stands in for a
    real image/audio encoder; stable across runs and engines)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big") % (2**32)
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float64)


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
            feats = [list(_fake_features(bytes(b), dim)) for b in pdf[content_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        decode, schema=f"{id_col} long, features array<double>"
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
