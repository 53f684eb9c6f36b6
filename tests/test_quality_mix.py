"""Tests for gopher_rules, temperature_mix_sample, and embedding_dim_stats."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from conftest import SF_DIR


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs on through "
    "the quiet field for a while with plenty of normal prose to read"
)


def _rules(spark, rows, **kw):
    from spark_gp_spark.operators.text import gopher_rules

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(rows)])
    out = gopher_rules(df, min_tokens=5, **kw)
    return {r.doc_id: r.asDict() for r in out.collect()}


def test_gopher_rules_each_rule_fires_independently(spark):
    rows = [
        GOOD,                                         # 0: passes everything
        "a b c",                                      # 1: too short
        "aa " * 30,                                   # 2: mwl below 3
        ("the of #and# #to# #in# is " * 5),           # 3: symbol ratio (many '#')
        "the of 11 22 33 44 55 66 77 88 99 00",       # 4: alpha-word ratio low
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",  # 5: no stopwords
        "the start...\nof a story...\nthat trails...", # 6: every line ends '...'
        "the same line here\n" * 6 + "and one more of the end",  # 7: dup lines
    ]
    got = _rules(spark, rows)
    assert got[0]["keep"] is True
    assert got[1]["len_ok"] is False
    assert got[2]["mwl_ok"] is False and got[2]["len_ok"] is True
    assert got[3]["symbol_ok"] is False
    assert got[4]["alpha_word_ok"] is False
    assert got[5]["stopword_ok"] is False
    assert got[6]["ellipsis_ok"] is False
    assert got[7]["dup_line_ok"] is False
    flag_names = [
        "len_ok", "mwl_ok", "symbol_ok", "alpha_word_ok",
        "stopword_ok", "ellipsis_ok", "dup_line_ok",
    ]
    for d in got.values():
        assert d["keep"] == all(d[f] for f in flag_names)


def test_gopher_rules_zero_shuffle_plan(spark):
    """The filter must stay a pure projection: no Exchange anywhere in the
    operator's own plan (a created-DataFrame input adds none)."""
    from spark_gp_spark.operators.text import gopher_rules

    df = spark.createDataFrame([Row(doc_id=0, text=GOOD)])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_mix_min_group_untouched_and_sqrt_scaled(spark):
    from spark_gp_spark.operators.prep import temperature_mix_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = temperature_mix_sample(docs, group_col="lang").collect()
    counts = docs.groupBy("lang").count().collect()
    n = {r.lang: r["count"] for r in counts}
    n_min = min(n.values())
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
        assert r.n_group == n[r.lang]
        assert r.thresh_bp == int(np.floor(10000 * np.sqrt(n_min / n[r.lang])))
    # the smallest group is never downsampled
    smallest = min(n, key=n.get)
    assert len(by_lang[smallest]) == n[smallest]
    # kept counts land near sqrt scaling: kept_g / n_g ~= thresh_bp / 10000
    for lang, rows in by_lang.items():
        expected = n[lang] * rows[0].thresh_bp / 10000
        assert abs(len(rows) - expected) <= max(5, 0.2 * expected)


def test_temperature_mix_monotone_in_alpha(spark):
    """Raising alpha only ADDS documents (rate_g rises, the hash predicate
    is monotone in the threshold) — mix ratios tune without churn."""
    from spark_gp_spark.operators.prep import temperature_mix_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lo = {r.doc_id for r in temperature_mix_sample(docs, group_col="lang", alpha=0.25).collect()}
    hi = {r.doc_id for r in temperature_mix_sample(docs, group_col="lang", alpha=0.75).collect()}
    assert lo <= hi


def test_temperature_mix_rejects_bad_alpha(spark):
    from spark_gp_spark.operators.prep import temperature_mix_sample

    docs = spark.createDataFrame([Row(doc_id=0, lang="en")])
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_sample(docs, group_col="lang", alpha=1.5)


def test_embedding_dim_stats_matches_numpy(spark):
    from spark_gp_spark.operators.similarity import embedding_dim_stats

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {r.pos: r for r in embedding_dim_stats(emb).collect()}
    X = np.array(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    assert len(got) == X.shape[1]
    for pos in range(X.shape[1]):
        col = X[:, pos]
        assert got[pos].mean == pytest.approx(col.mean(), abs=2e-6)
        assert got[pos].std == pytest.approx(col.std(ddof=1), abs=2e-6)
        assert got[pos].min_v == pytest.approx(col.min(), abs=1e-6)
        assert got[pos].max_v == pytest.approx(col.max(), abs=1e-6)


def test_embedding_whiten_standardizes_each_dimension(spark):
    from spark_gp_spark.operators.similarity import embedding_whiten

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    W = np.array(
        [r.whitened for r in embedding_whiten(emb).collect()], dtype=np.float64
    )
    # per-dimension: mean ~ 0, sample std ~ 1 (inputs were 6-dp-rounded stats)
    assert np.abs(W.mean(axis=0)).max() < 1e-4
    assert np.abs(W.std(axis=0, ddof=1) - 1.0).max() < 1e-3


def test_embedding_whiten_constant_dimension_maps_to_zero(spark):
    from spark_gp_spark.operators.similarity import embedding_whiten

    rows = [(i, [float(i), 5.0]) for i in range(6)]  # dim 1 is constant
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: r.whitened for r in embedding_whiten(df).collect()}
    assert all(v[1] == 0.0 for v in out.values())
    assert any(v[0] != 0.0 for v in out.values())


def test_embedding_whiten_never_shuffles_corpus(spark):
    """The whitening projection must reach the corpus through a broadcast
    of the single stats row — no sort-merge join, no corpus
    hash-partitioning (the only exchanges belong to the <= dim-key stats
    aggregate)."""
    from spark_gp_spark.operators.similarity import embedding_whiten

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = embedding_whiten(emb)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cluster_balance_sample_flattens_cells(spark):
    """Kept counts per cell track sqrt scaling off the per-cell population,
    the smallest cell is never downsampled, and the cell assignment is the
    SAME one semdedup/ivf use (one quantizer, three consumers)."""
    import numpy as np

    from spark_gp_spark.operators.ivf import (
        ivf_assign_frame,
        train_centroids_from_parquet,
    )
    from spark_gp_spark.operators.selection import cluster_balance_sample
    from pyspark.sql import functions as F

    cents = train_centroids_from_parquet(
        f"{SF_DIR}/embeddings.parquet", 16, 5, 4000
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = cluster_balance_sample(emb, cents, alpha=0.5, seed=3).collect()
    assign = {
        r.vec_id: r.cell
        for r in ivf_assign_frame(
            emb, F.col("vec_id"), F.col("embedding").cast("array<double>"),
            cents, "vec_id",
        ).collect()
    }
    n = {}
    for cell in assign.values():
        n[cell] = n.get(cell, 0) + 1
    n_min = min(n.values())
    kept = {}
    for r in out:
        assert assign[r.vec_id] == r.cell
        assert r.n_group == n[r.cell]
        assert r.thresh_bp == int(np.floor(10000 * np.sqrt(n_min / n[r.cell])))
        kept[r.cell] = kept.get(r.cell, 0) + 1
    smallest = min(n, key=n.get)
    assert kept[smallest] == n[smallest]
    for cell, k in kept.items():
        expected = n[cell] * np.sqrt(n_min / n[cell])
        assert abs(k - expected) <= max(5, 0.35 * expected), (cell, k, expected)


def test_embedding_drift_report_flags_shifted_dimension(spark):
    """Candidate = baseline shifted by +5 std on dim 0 only: the report
    must show |shift| ~ 5 there and ~0 elsewhere; a dimension constant in
    both slices reports exactly 0."""
    from spark_gp_spark.operators.similarity import embedding_drift_report

    rng = np.random.default_rng(21)
    A = rng.normal(size=(300, 8))
    B = rng.normal(size=(300, 8))
    B[:, 0] += 5.0
    A[:, 7] = 2.5  # constant in both
    B[:, 7] = 2.5
    base = spark.createDataFrame(
        [(i, [float(x) for x in A[i]]) for i in range(300)],
        "vec_id bigint, embedding array<double>",
    )
    cand = spark.createDataFrame(
        [(i, [float(x) for x in B[i]]) for i in range(300)],
        "vec_id bigint, embedding array<double>",
    )
    got = {r.pos: r for r in embedding_drift_report(base, cand).collect()}
    assert len(got) == 8
    assert abs(got[0].shift - 5.0) < 0.5
    for pos in range(1, 7):
        assert abs(got[pos].shift) < 0.3, (pos, got[pos].shift)
    assert got[7].shift == 0.0 and got[7].std_a == 0.0


def test_quality_rule_rates_match_flag_means(spark):
    from conftest import SF_DIR as _SF

    from spark_gp_spark.operators.text import gopher_rules

    from spark_gp_spark.queries import quality_rule_rates, _GOPHER_FLAG_NAMES

    docs = spark.read.parquet(f"{_SF}/documents.parquet")
    rates = {r.lang: r for r in quality_rule_rates(spark, _SF).collect()}
    flags = gopher_rules(docs, min_tokens=20, extra_cols=("lang",)).collect()
    byl = {}
    for r in flags:
        byl.setdefault(r.lang, []).append(r)
    assert sum(r.n_docs for r in rates.values()) == len(flags)
    for lang, rows in byl.items():
        got = rates[lang]
        assert got.n_docs == len(rows)
        for f in _GOPHER_FLAG_NAMES:
            want = round(sum(1 for r in rows if r[f]) / len(rows), 6)
            assert abs(got[f + "_rate"] - want) < 1e-9, (lang, f)
        # the conjunction can never pass more often than any single rule
        assert all(
            got.keep_rate <= got[f + "_rate"] + 1e-12
            for f in _GOPHER_FLAG_NAMES[:-1]
        )
