"""Round-10 pipeline verbs: normalization-robust exact dedup
(operators/dedup.py:normalized_dedup) and the cross-split decontamination
scan (operators/prep.py:split_leakage_check).

Layers: semantics on hand-built frames (expected values computed
independently in Python), then the side-by-side DuckDB oracle run the
driver window repeats at sf0.01."""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def test_normalize_text_canonicalizes_case_punct_whitespace(spark):
    from spark_gp_spark.operators.dedup import normalize_text

    rows = spark.createDataFrame(
        [
            ("Hello,   World!",),
            ("hello world",),
            ("HELLO--WORLD",),
            ("hello worlds",),  # distinct: content differs
            ("  hello \t world  ",),
        ],
        "text string",
    ).select(normalize_text(F.col("text")).alias("norm")).collect()
    norms = [r.norm for r in rows]
    assert norms[0] == norms[1] == norms[2] == norms[4] == "hello world"
    assert norms[3] == "hello worlds"


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=string.printable, min_size=0, max_size=60),
        min_size=1,
        max_size=25,
    )
)
def test_normalize_text_is_idempotent_and_case_invariant(spark, texts):
    """normalize(normalize(x)) == normalize(x) (the output alphabet is
    already canonical) and normalize(upper(x)) == normalize(x) for ASCII —
    the properties that make the normalized key a well-defined dedup key."""
    from spark_gp_spark.operators.dedup import normalize_text

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        normalize_text(F.col("text")).alias("once"),
        normalize_text(normalize_text(F.col("text"))).alias("twice"),
        normalize_text(F.upper(F.col("text"))).alias("upper_first"),
    ).collect()
    for r in rows:
        assert r.once == r.twice
        assert r.once == r.upper_first


@settings(max_examples=4, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=40),
        min_size=2,
        max_size=20,
    )
)
def test_split_leakage_invariants(spark, docs):
    """0 ≤ n_leaked ≤ n_shingles and leak_frac ∈ [0, 1] for arbitrary
    corpora; one row per TEST-split document exactly."""
    from spark_gp_spark.operators.prep import split_assign, split_leakage_check

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    n_test = sum(
        1 for r in split_assign(df).collect() if r.split == "test"
    )
    out = split_leakage_check(df, shingle_n=2).collect()
    assert len(out) == n_test
    for r in out:
        assert 0 <= r.n_leaked <= max(r.n_shingles, 0)
        assert 0.0 <= r.leak_frac <= 1.0


def test_normalized_dedup_groups_variants_exact_dedup_misses(spark):
    from spark_gp_spark.operators.dedup import exact_dedup, normalized_dedup

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox."),
            (2, "the QUICK brown fox"),  # normalized-dup of 1
            (3, "the quick...brown fox!!"),  # normalized-dup of 1
            (4, "an entirely different doc"),
            (5, "The quick brown fox."),  # exact dup of 1
        ],
        "doc_id long, text string",
    )
    exact = {r.keep_id: r.dup_count for r in exact_dedup(df).collect()}
    norm = {r.keep_id: r.dup_count for r in normalized_dedup(df).collect()}
    # byte-level grouping sees three distinct variants of doc 1
    assert exact == {1: 2, 2: 1, 3: 1, 4: 1}
    # normalized grouping collapses all four copies
    assert norm == {1: 4, 4: 1}


def test_split_leakage_counts_shared_distinct_shingles(spark):
    from spark_gp_spark.operators.prep import split_assign, split_leakage_check

    # derive the hash split for a candidate id range, then PLANT the
    # leak: one test doc shares its full text with a train doc, another
    # test doc is disjoint, remaining docs are too short to shingle
    splits = {
        r.doc_id: r.split
        for r in split_assign(
            spark.range(300).withColumnRenamed("id", "doc_id")
        ).collect()
    }
    train_ids = [i for i, s in splits.items() if s == "train"]
    test_ids = [i for i, s in splits.items() if s == "test"]
    assert len(train_ids) >= 1 and len(test_ids) >= 2
    shared = " ".join(f"w{i}" for i in range(10))  # 10 tokens -> 3 8-grams
    disjoint = " ".join(f"z{i}" for i in range(9))  # 9 tokens -> 2 8-grams
    rows = [
        (train_ids[0], shared),
        (test_ids[0], shared),
        (test_ids[1], disjoint),
    ] + [(i, "too short") for i in test_ids[2:5]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_shingles, r.n_leaked, r.leak_frac)
        for r in split_leakage_check(df).collect()
    }
    assert set(out) == set(test_ids[0:2] + test_ids[2:5])  # one row per test doc
    assert out[test_ids[0]] == (3, 3, 1.0)  # full leak
    assert out[test_ids[1]] == (2, 0, 0.0)  # disjoint
    for i in test_ids[2:5]:
        # sub-shingle docs clamp to ONE whole-doc gram (word_ngrams
        # semantics, mirrored by the oracle) and share nothing with train
        assert out[i] == (1, 0, 0.0)


def test_vocab_coverage_semantics(spark):
    from spark_gp_spark.operators.text import vocab_coverage

    # 3 docs; vocab_size=2 -> top-df tokens are 'a' (df 3) and 'b' (df 2);
    # ties at df 1 would break by string but are all out of the top-2
    df = spark.createDataFrame(
        [
            (1, "a b a"),
            (2, "a b c"),
            (3, "a x y z"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in vocab_coverage(df, vocab_size=2).collect()
    }
    assert out[1] == (3, 0, 0.0)
    assert out[2] == (3, 1, round(1 / 3, 6))
    assert out[3] == (4, 3, 0.75)


def test_staged_vocab_coverage_matches_duckdb_oracle(spark, sf_dir):
    """Side-by-side parity for the staged-for-r11 entry — the exact check
    the r11 driver window will run."""
    import duckdb

    from spark_gp_spark.queries import _VOCAB_COVERAGE_SQL, vocab_coverage_report

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    got = vocab_coverage_report(spark, sf_dir).toPandas()
    want = con.execute(_VOCAB_COVERAGE_SQL).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    for c in cols:
        assert (got[c].values == want[c].values).all(), c
    assert (got["n_oov"] > 0).any()  # the 16-token vocab leaves a real OOV band


def test_staged_streaming_ingest_dedup_matches_batch_twin(spark, sf_dir):
    """The staged-for-r11 streaming ingest screen emits EXACTLY the batch
    dedup_incremental relation (same oracle by construction), and the
    screen is non-vacuous: the batch slice is larger than the survivor
    set."""
    from spark_gp_spark.queries import dedup_incremental, streaming_ingest_dedup

    want = {
        (r.doc_id, r.text_hash) for r in dedup_incremental(spark, sf_dir).collect()
    }
    got = {
        (r.doc_id, r.text_hash)
        for r in streaming_ingest_dedup(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_staged_media_dedup_matches_duckdb_oracle(spark, sf_dir):
    """Side-by-side parity for the staged-for-r11 byte-dedup entry, plus
    semantics on a hand-built frame (dup_bytes accounting)."""
    import duckdb

    from spark_gp_spark.operators.multimodal import attach_binary, media_exact_dedup
    from spark_gp_spark.queries import _MM_MEDIA_DEDUP_SQL, multimodal_media_dedup

    tiny = spark.createDataFrame(
        [(1, "abcd"), (2, "abcd"), (3, "abcd"), (4, "xy")],
        "doc_id long, text string",
    )
    out = {
        r.content_hash: (r.keep_id, r.n_copies, r.dup_bytes)
        for r in media_exact_dedup(attach_binary(tiny)).collect()
    }
    assert sorted(out.values()) == [(1, 3, 8), (4, 1, 0)]  # 4 bytes x 2 dups

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    got = multimodal_media_dedup(spark, sf_dir).toPandas()
    want = con.execute(_MM_MEDIA_DEDUP_SQL).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    for c in cols:
        assert (got[c].values == want[c].values).all(), c
    assert (got["n_copies"] > 1).any()  # the planted verbatim copies collapse


def test_registry_entries_match_duckdb_oracle(spark, sf_dir):
    """The side-by-side check the r10 driver window runs for the two new
    entries — and the non-vacuity assertions: planted variants collapse
    groups, and the corpus's cross-split dup pairs actually leak."""
    import duckdb

    from spark_gp_spark.queries import (
        _DEDUP_NORMALIZED_SQL,
        _SPLIT_LEAKAGE_SQL,
        dedup_normalized,
        split_leakage,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    for fn, sql in (
        (dedup_normalized, _DEDUP_NORMALIZED_SQL),
        (split_leakage, _SPLIT_LEAKAGE_SQL),
    ):
        got = fn(spark, sf_dir).toPandas()
        want = con.execute(sql).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), fn.__name__
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(got) == len(want) and len(got) > 0, fn.__name__
        for c in cols:
            assert (got[c].values == want[c].values).all(), (fn.__name__, c)
        if fn is dedup_normalized:
            # planted upper(successor)+' !!' variants must collapse groups
            assert len(got) < n_docs
            assert (got["dup_count"] > 1).any()
        else:
            # the corpus's near-dup documents share 8-grams across the hash split
            assert (got["n_leaked"] > 0).any()
