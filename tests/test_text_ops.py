"""Collocation (PMI) and embedding-centroid operators."""

import math

import pytest
from pyspark.sql import functions as F

from spark_gp_spark.operators.similarity import label_centroids
from spark_gp_spark.operators.text import token_cooccurrence_pmi


def test_token_pmi_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "b c")],
        "doc_id long, text string",
    )
    out = {
        (r.tok_a, r.tok_b): (r.co_docs, r.pmi)
        for r in token_cooccurrence_pmi(docs, min_pair_docs=1, min_df=1).collect()
    }
    # df(a)=3, df(b)=3, df(c)=2, N=4
    assert out[("a", "b")][0] == 2
    assert out[("a", "b")][1] == pytest.approx(math.log(2 * 4 / 9), abs=1e-6)
    assert out[("a", "c")][0] == 1
    assert out[("a", "c")][1] == pytest.approx(math.log(1 * 4 / 6), abs=1e-6)


def test_token_pmi_max_df_drops_stopword_grade_tokens(spark):
    # "the" in every doc: with max_df below N it must vanish from all pairs
    docs = spark.createDataFrame(
        [(i, f"the word{i % 2}") for i in range(10)], "doc_id long, text string"
    )
    out = token_cooccurrence_pmi(docs, min_pair_docs=1, min_df=1, max_df=9).collect()
    assert all("the" not in (r.tok_a, r.tok_b) for r in out)


def test_token_pmi_relative_df_cap(spark):
    # the scale-portable guard: "the" (df=10=N) falls above 0.9·N and is
    # dropped; "common" (df=8 ≤ 0.9·10) survives and still pairs — the
    # registry entry's configuration must be non-vacuous by construction
    docs = spark.createDataFrame(
        [(i, f"the common word{i % 2}" if i < 8 else "the rare word9")
         for i in range(10)],
        "doc_id long, text string",
    )
    out = token_cooccurrence_pmi(
        docs, min_pair_docs=1, min_df=1, max_df_frac=0.9
    ).collect()
    assert out, "relative cap emptied the output"
    toks = {t for r in out for t in (r.tok_a, r.tok_b)}
    assert "the" not in toks
    assert "common" in toks


def test_label_centroids_exact_means(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    out = {(r.label, r.pos): r.value for r in label_centroids(emb).collect()}
    assert out[(0, 0)] == 2.0 and out[(0, 1)] == 3.0
    assert out[(1, 0)] == 10.0 and out[(1, 1)] == 20.0


def test_repetition_stats_counts_duplicates(spark):
    from spark_gp_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # "a b c" repeated: 7 grams, 3 distinct
            (2, "one two three four"),  # no repetition: 2 grams, 2 distinct
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs, n=3).collect()}
    assert (out[1].n_ngrams, out[1].n_distinct) == (7, 3)
    assert out[1].rep_ratio == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert (out[2].n_ngrams, out[2].n_distinct) == (2, 2)
    assert out[2].rep_ratio == 0.0


def test_dup_ngram_fraction_cross_document(spark):
    from spark_gp_spark.operators.text import dup_ngram_fraction

    shared = "alpha beta gamma delta epsilon"  # one 5-gram, shared by docs 1+2
    docs = spark.createDataFrame(
        [
            (1, shared + " zeta"),          # grams: 2 (one shared, one unique)
            (2, shared),                    # grams: 1 (shared)
            (3, "one two three four five"), # grams: 1, unique corpus-wide
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_fraction(docs, n=5).collect()}
    assert out[1].n_grams == 2 and out[1].n_dup_grams == 1
    assert abs(out[1].dup_fraction - 0.5) < 1e-9
    assert out[2].n_grams == 1 and out[2].n_dup_grams == 1
    assert out[3].n_grams == 1 and out[3].n_dup_grams == 0


def test_tfidf_cosine_pairs_planted(spark):
    from spark_gp_spark.operators.text import tfidf_cosine_pairs

    rows = [
        (0, "machine learning systems at scale with spark"),
        (1, "machine learning systems at scale with spark"),        # exact dup of 0
        (2, "deep learning systems at massive scale with spark"),   # near-dup of 0
        (3, "cooking pasta requires salted boiling water tonight"), # unrelated
        (4, "gardening tips for growing tomatoes in summer heat"),  # unrelated
        (5, "quarterly financial report shows revenue growth"),     # unrelated
        (6, "hiking boots and trail maps for mountain weekends"),   # unrelated
        (7, "jazz piano chord voicings for beginning players"),     # unrelated
    ]  # 8 docs -> max_df = 4, so tokens shared by docs 0/1/2 (df = 3) stay in vocab
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.cosine for r in
           tfidf_cosine_pairs(docs, threshold=0.3).collect()}
    assert out[(0, 1)] == 1.0                 # identical docs: cosine exactly 1
    assert (0, 2) in out and out[(0, 2)] > 0.3
    assert not any({3, 4} & {a, b} for a, b in out)  # unrelated never pair
    # plan shape: posting equi-join, never a cartesian
    plan = (tfidf_cosine_pairs(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_retrieves_planted_match(spark):
    from spark_gp_spark.operators.text import bm25_topk

    rows = [
        (0, "machine learning systems at scale"),                    # the query
        (5, "machine learning systems at scale in production"),      # best match
        (6, "deep learning for computer vision research"),           # partial
        (7, "cooking pasta requires salted boiling water"),          # unrelated
        (8, "gardening tips for growing tomatoes in summer"),        # unrelated
        (9, "jazz piano chord voicings for beginners"),              # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, max_query_id=1, k=3).collect()
    by_rank = {r.rank: r for r in out if r.query_id == 0}
    assert by_rank[1].doc_id == 5        # the near-verbatim doc wins
    assert by_rank[1].score > by_rank[2].score
    assert all(r.doc_id != 0 for r in out)  # query never retrieves itself


def test_doc_logprob_hand_computed(spark):
    """Hand replay of the hashed-unigram LM score: with enough buckets
    there are no hash collisions on a 3-token vocab, so per-doc scores are
    plain add-alpha unigram log-probs; the common-word doc must outscore
    the rare-word doc."""
    from spark_gp_spark.operators.text import doc_logprob

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a b b"), (3, "z")],
        "doc_id long, text string",
    )
    buckets, alpha = 1 << 16, 0.5
    out = {r.doc_id: (r.n_tokens, r.avg_logprob)
           for r in doc_logprob(docs, buckets=buckets, alpha=alpha).collect()}
    n_total = 9
    denom = n_total + alpha * buckets

    def lp(cnt):
        return math.log((cnt + alpha) / denom)

    assert out[1] == (4, pytest.approx(round(lp(6), 6), abs=2e-6))
    assert out[2] == (4, pytest.approx(round((2 * lp(6) + 2 * lp(2)) / 4, 6), abs=2e-6))
    assert out[3] == (1, pytest.approx(round(lp(1), 6), abs=2e-6))
    assert out[1][1] > out[2][1] > out[3][1]


def test_doc_logprob_plan_broadcasts_model(spark):
    """The count model must come back as broadcast joins — the corpus-sized
    token stream is never shuffled for the lookup; the only Exchanges are
    the tiny bucket-count aggregate and the per-doc aggregate."""
    from spark_gp_spark.operators.text import doc_logprob

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = doc_logprob(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
