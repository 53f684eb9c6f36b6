"""Round-12-built verbs staged for the round-13 window: the nearest-
either-direction as-of variant (operators/asof.py, semantics gated in
tests/test_asof.py), paragraph-grain duplicate stats
(operators/dedup.py:paragraph_dedup_stats), the pairwise two-sample KS
drift report (operators/dq.py:source_ks_drift), the PII exposure
report (operators/prep.py:pii_scan_report), the exact-quota stratified
split (operators/prep.py:stratified_split), and the embedding-norm DQ
screen (operators/similarity.py:embedding_norm_outliers).

Layers: semantics on hand-built frames (expected values computed by
hand), then the side-by-side DuckDB parity the r13 driver window will
run (via the planted registry wrappers)."""

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _con(sf_dir, *tables):
    con = duckdb.connect()
    con.execute("SET enable_progress_bar=false")
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _assert_parity(got, want):
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].astype(str).sort_values(cols).reset_index(drop=True)
    w = want[cols].astype(str).sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w) and len(g) > 0
    for c in cols:
        assert (g[c].values == w[c].values).all(), c


# ---------------------------------------------------------------- semantics


def test_paragraph_dedup_counts_cross_doc_only(spark):
    """dup = paragraph shared across >= 2 DISTINCT documents; a paragraph
    repeated twice inside ONE document is not boilerplate."""
    from spark_gp_spark.operators.dedup import paragraph_dedup_stats

    df = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared footer"),
            (2, "gamma delta\n\nshared footer"),
            (3, "self twin\n\nself twin"),  # within-doc repeat, no other doc
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup_stats(df).collect()}
    assert out[1]["n_paras"] == 2 and out[1]["n_dup_paras"] == 1
    assert out[1]["kept_chars"] == len("alpha beta")
    assert out[2]["n_dup_paras"] == 1
    assert out[3]["n_paras"] == 2 and out[3]["n_dup_paras"] == 0
    assert out[3]["kept_chars"] == 2 * len("self twin")


def test_source_ks_drift_hand_computed(spark):
    """Disjoint supports -> KS = 1 and (at n=10 per side, critical
    1.628*sqrt(20/100) = 0.728) drifted; identical sources -> KS = 0, not
    drifted; a half-overlap pair lands at the hand-computed 0.5.  Exact
    integers throughout."""
    from spark_gp_spark.operators.dq import source_ks_drift

    rows = (
        [("a", i) for i in range(1, 11)]
        + [("b", i) for i in range(11, 21)]
        + [("c", i) for i in range(1, 11)]
        + [("h", i) for i in range(6, 16)]  # half-overlaps a: max gap at v=10
    )
    df = spark.createDataFrame(rows, "source string, n_chars bigint")
    out = {
        (r["source_a"], r["source_b"]): r for r in source_ks_drift(df).collect()
    }
    assert out[("a", "b")]["ks"] == 1.0 and out[("a", "b")]["drifted"]
    assert out[("a", "c")]["ks"] == 0.0 and not out[("a", "c")]["drifted"]
    # F_a(10) = 1.0, F_h(10) = 5/10 -> KS = 0.5 < 0.728 -> not drifted
    assert out[("a", "h")]["ks"] == 0.5 and not out[("a", "h")]["drifted"]
    assert out[("a", "b")]["n_a"] == 10 and out[("a", "b")]["n_b"] == 10


def test_pii_scan_report_counts_docs_and_hits(spark):
    """n_docs counts documents with >= 1 hit; n_hits counts matches — a doc
    with two emails adds 1 to n_docs and 2 to n_hits."""
    from spark_gp_spark.operators.prep import pii_scan_report

    df = spark.createDataFrame(
        [
            (1, "en", "mail a@b.co and c@d.org here"),
            (2, "en", "card 4111222233334444"),
            (3, "en", "clean text"),
            (4, "fr", "x@y.io"),
        ],
        "doc_id bigint, lang string, text string",
    )
    out = {
        (r["lang"], r["pii_class"]): r for r in pii_scan_report(df).collect()
    }
    assert out[("en", "email")]["n_docs"] == 1
    assert out[("en", "email")]["n_hits"] == 2
    assert out[("en", "long_number")]["n_hits"] == 1
    assert out[("fr", "email")]["n_docs"] == 1
    assert out[("fr", "long_number")]["n_hits"] == 0


# ------------------------------------------------------------------ parity


def test_staged_r12_verbs_duckdb_parity(spark):
    """The exact side-by-side the r13 driver window will run, at sf0.001."""
    from spark_gp_spark.queries import STAGED_QUERIES

    con = _con(SF, "documents", "events", "embeddings")
    for name, (fn, sql) in STAGED_QUERIES.items():
        got = fn(spark, SF).toPandas()
        want = con.execute(sql).fetchdf()
        _assert_parity(got, want)


def test_stratified_split_exact_quotas(spark):
    """Every stratum cuts at exactly ceil(n*pct/100) — including the
    remainder strata a hash split gets wrong by luck — and assignment is
    a pure function of the id (re-partitioning cannot move a row)."""
    import math

    from spark_gp_spark.operators.prep import stratified_split

    rows = [(i, "a") for i in range(17)] + [(100 + i, "b") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_split(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["split"])
    for lang, n in (("a", 17), ("b", 4)):
        splits = by[lang]
        tr = math.ceil(n * 80 / 100)
        va = math.ceil(n * 90 / 100) - tr
        assert splits.count("train") == tr, (lang, splits)
        assert splits.count("val") == va, (lang, splits)
        assert splits.count("test") == n - tr - va, (lang, splits)
    # determinism: same ids re-partitioned -> identical assignment
    again = {
        (r["doc_id"], r["split"])
        for r in stratified_split(df.repartition(7)).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in out}


def test_embedding_norm_outliers_flags_scaled_vector(spark):
    """A 4x-scaled twin of an otherwise-typical vector is the only
    outlier; z-scores are computed against the corpus including it."""
    import numpy as np

    from spark_gp_spark.operators.similarity import embedding_norm_outliers

    rng = np.random.default_rng(11)
    base = rng.normal(size=(50, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)  # all norms = 1
    vecs = list(base) + [base[0] * 4.0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in embedding_norm_outliers(df).collect()}
    assert out[50]["is_outlier"] and out[50]["norm"] == 4.0
    assert sum(r["is_outlier"] for r in out.values()) == 1
    assert all(abs(out[i]["norm"] - 1.0) < 1e-6 for i in range(50))


# --------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 23), min_size=1, max_size=4),
    train=st.integers(50, 90),
    val=st.integers(5, 25),
)
def test_stratified_split_quota_invariant(spark, sizes, train, val):
    """For ANY stratum sizes and any (train, val) pcts with train+val
    <= 100: every stratum's train count is exactly ceil(n*train/100) and
    train+val count exactly ceil(n*(train+val)/100) — including the
     1-row strata where ceil puts everything in train."""
    import math

    from spark_gp_spark.operators.prep import stratified_split

    if train + val > 100:
        val = 100 - train
    rows = [
        (s * 1000 + i, f"s{s}") for s, n in enumerate(sizes) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_split(df, train_pct=train, val_pct=val).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], []).append(r["split"])
    for s, n in enumerate(sizes):
        splits = by[f"s{s}"]
        tr = math.ceil(n * train / 100)
        tv = math.ceil(n * (train + val) / 100)
        assert splits.count("train") == tr, (n, train, val, splits)
        assert splits.count("train") + splits.count("val") == tv


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 9)),
        min_size=4, max_size=40,
    )
)
def test_source_ks_bounds_and_identity(spark, data):
    """KS statistics are always in [0, 1]; a source compared against an
    exact copy of itself reads 0.  (The exact-integer max makes these
    hard invariants, not float approximations.)"""
    from spark_gp_spark.operators.dq import source_ks_drift

    rows = [(s, v) for s, v in data] + [("a_copy", v) for s, v in data if s == "a"]
    if not any(s == "a" for s, _ in data):
        rows += [("a", 1), ("a_copy", 1)]
    df = spark.createDataFrame(rows, "source string, n_chars bigint")
    out = source_ks_drift(df).collect()
    assert all(0.0 <= r["ks"] <= 1.0 for r in out)
    ident = [r for r in out if {r["source_a"], r["source_b"]} == {"a", "a_copy"}]
    assert ident and ident[0]["ks"] == 0.0 and not ident[0]["drifted"]
