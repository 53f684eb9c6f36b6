"""Multimodal plumbing tests: the decode/resize/frame-sample mapInPandas
contracts (schema, batch shape, determinism) with the stubbed decoders."""

from __future__ import annotations

import pytest

from spark_gp_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    frame_sample,
    resize_binary,
)
from spark_gp_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def binary_docs(spark, sf_dir):
    return attach_binary(load_table(spark, sf_dir, "documents")).cache()


def test_decode_features_stub_raises_without_fake(spark, binary_docs):
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        decode_features(binary_docs, fake=False).collect()


def test_frame_sample_shape_and_determinism(spark, binary_docs):
    n_docs = binary_docs.count()
    out = frame_sample(binary_docs, n_frames=4, dim=8, fake=True)
    rows = out.collect()
    assert len(rows) == n_docs * 4
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["features"]) == 8 for r in rows[:10])
    # deterministic across runs, and distinct frames get distinct features
    again = {(r["doc_id"], r["frame_idx"]): tuple(r["features"]) for r in out.collect()}
    first = {(r["doc_id"], r["frame_idx"]): tuple(r["features"]) for r in rows}
    assert first == again
    some_doc = rows[0]["doc_id"]
    frames = [v for (d, _), v in first.items() if d == some_doc]
    assert len(set(frames)) == len(frames)


def test_resize_binary_pads_and_truncates(spark, binary_docs):
    out = resize_binary(binary_docs, target_bytes=64, fake=True).collect()
    assert all(r["n_bytes"] == 64 for r in out)
    assert all(len(bytes(r["content"])) == 64 for r in out[:10])
