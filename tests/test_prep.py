"""Training-data preparation operators (operators/prep.py)."""

import pytest
from pyspark.sql import functions as F

from spark_gp_spark.operators import prep as P


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "contact me at jane.doe@example.com or 123456789012 thanks"),
        (3, "short text"),
        (4, " ".join(f"tok{i}" for i in range(150))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_assign_deterministic_and_partition_invariant(spark, docs):
    a = {(r.doc_id, r.bucket, r.split) for r in P.split_assign(docs).collect()}
    b = {
        (r.doc_id, r.bucket, r.split)
        for r in P.split_assign(docs.repartition(7)).collect()
    }
    assert a == b and len(a) == 4
    assert all(s in ("train", "val", "test") for _, _, s in a)


def test_doc_chunks_cover_all_tokens_with_overlap(spark, docs):
    out = P.doc_chunks(docs, size=64, overlap=16)
    rows = {r.doc_id: sorted((c.chunk_id, c.n_tokens) for c in out.collect() if c.doc_id == r.doc_id)
            for r in docs.collect()}
    # 150 tokens, stride 48: windows at 0/48/96 → 64, 64, 54 tokens
    assert rows[4] == [(0, 64), (1, 64), (2, 54)]
    # short docs produce exactly one window with every token
    assert rows[3] == [(0, 2)]
    # reconstruction: stitching chunk w's first `stride` tokens + last tail
    chunks4 = [r.chunk_text for r in out.filter(F.col("doc_id") == 4)
               .orderBy("chunk_id").collect()]
    toks = []
    for i, c in enumerate(chunks4):
        parts = c.split(" ")
        toks.extend(parts if i == len(chunks4) - 1 else parts[:48])
    assert toks == [f"tok{i}" for i in range(150)]


def test_redact_pii(spark, docs):
    out = {r.doc_id: r for r in P.redact_pii(docs).collect()}
    assert out[2].n_emails == 1 and out[2].n_long_numbers == 1
    assert "<EMAIL>" in out[2].clean_text and "<NUMBER>" in out[2].clean_text
    assert "jane.doe" not in out[2].clean_text
    assert out[1].clean_text == "alpha beta gamma delta epsilon zeta eta theta"


def test_pack_batches_order_and_budget(spark, docs):
    out = sorted(
        ((r.doc_id, r.n_tokens, r.batch_id) for r in P.pack_batches(docs, budget=100).collect())
    )
    # cumulative-before thresholds: batch changes once 100 tokens precede
    cum = 0
    for doc_id, n, batch in out:
        assert batch == cum // 100
        cum += n


def test_pack_batches_sharded_packs_each_shard_independently(spark, docs):
    sharded = docs.withColumn("src", (F.col("doc_id") % 2).cast("string"))
    out = P.pack_batches(sharded, budget=100, shard_col="src").collect()
    cum_by_shard: dict[str, int] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        cum = cum_by_shard.get(r.shard, 0)
        assert r.batch_id == cum // 100, (r.shard, r.doc_id)
        cum_by_shard[r.shard] = cum + r.n_tokens
    assert len(cum_by_shard) == 2


def test_contamination_check_detects_copies(spark, docs):
    probe = docs.filter(F.col("doc_id") == 1)
    corpus = docs.union(
        docs.filter(F.col("doc_id") == 1).select(F.lit(99).alias("doc_id"), "text")
    ).filter(F.col("doc_id") != 1)
    out = {(r.doc_id, r.probe_id): r.n_shared
           for r in P.contamination_check(corpus, probe, shingle_n=8).collect()}
    # doc 99 is a verbatim copy of probe 1 → shares its single 8-gram window set
    assert out[(99, 1)] == 1
    assert all(d == 99 for d, _ in out)


def test_group_sample_deterministic_and_partition_invariant(spark, docs):
    out1 = {(r[0], r[1], r[2]) for r in P.group_sample(docs, "doc_id", "doc_id", k=1).collect()}
    big = docs.union(docs.select(F.col("doc_id") + 100, "text"))
    a = {tuple(r) for r in P.group_sample(big, "doc_id", "doc_id", k=1).collect()}
    b = {tuple(r) for r in P.group_sample(big.repartition(13), "doc_id", "doc_id", k=1).collect()}
    assert a == b and len(out1) == 4


def test_group_sample_small_group_keeps_all_rows(spark):
    """The under-k regime the corpus never exercises (every sf0.01 event
    type has ~2000 rows vs k=5 — r11 sampler audit): a group SMALLER than
    k must survive whole, ranked 1..n, while a larger group is cut to
    exactly k."""
    df = spark.createDataFrame(
        [("a", i) for i in range(3)] + [("b", i) for i in range(10, 22)],
        "g string, id int",
    )
    out = P.group_sample(df, "g", "id", k=5, seed=7).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r[0], []).append(r[2])
    assert sorted(by_g["a"]) == [1, 2, 3]  # all 3 rows, contiguous ranks
    assert sorted(by_g["b"]) == [1, 2, 3, 4, 5]  # cut to exactly k


def test_stratified_sample_deterministic_monotone(spark):
    """Domain-mix sampling contract: reproducible (pure function of id,
    seed, rates), MONOTONE in the rate (raising a domain's share only adds
    documents), unknown groups dropped, and rates out of [0,1] rejected."""
    import pytest

    from spark_gp_spark.operators.prep import stratified_sample

    rows = [(i, f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    low = {"g0": 0.2, "g1": 0.5}            # g2 absent -> dropped
    high = {"g0": 0.6, "g1": 0.5}
    kept_low = {r.doc_id for r in stratified_sample(df, low).collect()}
    kept_low2 = {r.doc_id for r in stratified_sample(df, low).collect()}
    kept_high = {r.doc_id for r in stratified_sample(df, high).collect()}
    assert kept_low == kept_low2                      # deterministic
    assert kept_low <= kept_high                      # monotone in the rate
    assert not any(i % 3 == 2 for i in kept_high)     # unknown group dropped
    # rates land near target (hash uniformity; 100 rows/group)
    n_g1 = sum(1 for i in kept_high if i % 3 == 1)
    assert 35 <= n_g1 <= 65
    with pytest.raises(ValueError):
        stratified_sample(df, {"g0": 1.5})
