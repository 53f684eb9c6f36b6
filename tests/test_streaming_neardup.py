"""Streaming MinHash-LSH near-dup: the custom bucket-min state machine must
match across micro-batches (doc arrives long after its near-duplicate)."""

from spark_gp_spark.streaming.neardup import run_streaming_neardup


def test_streaming_neardup_matches_within_and_across_batches(spark, tmp_path):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely unrelated text about spark streaming state"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),   # dup of 0, same batch
        (3, "third distinct document mentioning entirely other things"),
        (4, "completely unrelated text about spark streaming state"),  # dup of 1, NEXT batch
        (5, "the quick brown fox jumps over the lazy dog today"),      # near-dup of 0, next batch
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "corpus")
    docs.coalesce(1).write.parquet(src + "/documents.parquet")

    out = run_streaming_neardup(spark, src, n_files=2)
    got = {r.doc_id: r.dup_of for r in out.collect()}
    # same-batch exact dup
    assert got[2] == 0
    # cross-batch matches: docs 4 and 5 arrive in the second file, their
    # earliest colliders (1 and 0) in the first — state must carry over
    assert got[4] == 1
    assert got[5] == 0
    # non-duplicates never emit
    assert 1 not in got and 3 not in got and 0 not in got
