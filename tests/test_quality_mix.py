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
