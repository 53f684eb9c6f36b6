"""Staged round-10 screens: asymmetric shingle containment and
edit-distance fuzzy dedup (operators/dedup.py).  Planted fixtures pin the
semantics symmetric Jaccard / exact dedup cannot express."""

import pytest
from pyspark.sql import functions as F

from spark_gp_spark.operators.dedup import containment_pairs, editdist_pairs


def test_containment_catches_subset_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon"  # 3 3-gram shingles
    long = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated text about nothing at all")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a, r.common)
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert (1, 2) in out
    c_ab, c_ba, common = out[(1, 2)]
    assert common == 3  # every short-doc shingle occurs in the long doc
    assert c_ab == pytest.approx(1.0)  # short fully contained
    assert c_ba < 0.1  # symmetric Jaccard would be ~c_ba: below any threshold
    assert not any(3 in k for k in out)


def test_containment_matches_brute_force(spark, sf_dir):
    """Operator vs an independent per-pair brute force over the real corpus
    (array_intersect of the staged shingle arrays), unthresholded."""
    from spark_gp_spark.operators.dedup import _staged_shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    got = {
        (r.id_a, r.id_b): (r.common, r.cont_a_in_b, r.cont_b_in_a)
        for r in containment_pairs(docs, threshold=0.5).collect()
    }
    sh = _staged_shingles(docs, "text", "doc_id", 3)
    a = sh.select(F.col("_id").alias("id_a"), F.col("shingles").alias("_sa"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("shingles").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            inter.alias("common"),
            F.round(inter / F.greatest(F.size("_sa"), F.lit(1)), 6).alias("ca"),
            F.round(inter / F.greatest(F.size("_sb"), F.lit(1)), 6).alias("cb"),
        )
        .filter(F.greatest("ca", "cb") >= 0.5)
    )
    want = {
        (r.id_a, r.id_b): (r.common, r.ca, r.cb) for r in brute.collect()
    }
    assert got == want
    assert want, "fixture slice produced no containment pairs"


def test_editdist_blocking_is_lossless(spark):
    # pairs engineered to straddle length-bucket boundaries: blocking must
    # still find every pair with dist <= max_dist, and nothing else
    rows = [
        (1, "kitten"),
        (2, "sitting"),        # dist 3
        (3, "kitte"),          # dist 1 to kitten
        (4, "a" * 30),         # far from everything
        (5, "a" * 33),         # dist 3 to #4, next length bucket at w=4
        (6, "completely different"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): r.dist
        for r in editdist_pairs(docs, F.col("text"), max_dist=3).collect()
    }
    brute = {}
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    for (i1, s1), (i2, s2) in itertools.combinations(rows, 2):
        d = lev(s1, s2)
        if d <= 3:
            brute[(min(i1, i2), max(i1, i2))] = d
    assert out == brute
    assert (1, 2) in out and out[(1, 2)] == 3
    assert (4, 5) in out and out[(4, 5)] == 3  # cross-bucket pair survives


def test_staged_screens_match_duckdb_oracle(spark, sf_dir):
    """The staged registry entries hash the same relation their written
    oracles produce — the exact check the r10 driver window will run."""
    import duckdb

    from spark_gp_spark.queries import (
        _CONTAINMENT_SCREEN_SQL,
        _EDITDIST_SCREEN_SQL,
        containment_screen,
        editdist_screen,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for fn, sql in (
        (containment_screen, _CONTAINMENT_SCREEN_SQL),
        (editdist_screen, _EDITDIST_SCREEN_SQL),
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


def test_snapshot_diff_classifies_all_four_statuses(spark):
    from spark_gp_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, "doc_id", F.md5("text")).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_staged_corpus_diff_and_trending_match_oracle(spark, sf_dir):
    """Same side-by-side DuckDB check the r10 driver window will run, for
    the two late-staged entries."""
    import duckdb

    from spark_gp_spark.queries import (
        _CORPUS_DIFF_SQL,
        _TRENDING_TERMS_SQL,
        corpus_diff,
        streaming_trending_terms,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for fn, sql in (
        (corpus_diff, _CORPUS_DIFF_SQL),
        (streaming_trending_terms, _TRENDING_TERMS_SQL),
    ):
        got = fn(spark, sf_dir).toPandas()
        want = con.execute(sql).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), fn.__name__
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(got) == len(want) and len(got) > 0, (
            fn.__name__, len(got), len(want)
        )
        for c in cols:
            assert (got[c].values == want[c].values).all(), (fn.__name__, c)
    # corpus_diff must be non-vacuous in every class at the test corpus
    statuses = set(corpus_diff(spark, sf_dir).select("status").distinct().toPandas()["status"])
    assert statuses == {"added", "removed", "changed", "unchanged"}


def test_length_bucket_blocking_bound_property():
    """Pure-math invariant behind editdist_pairs' lossless blocking: for any
    strings with lev(a, b) <= d, the width-(d+1) length buckets differ by at
    most 1 — hypothesis-driven over random strings and caps (no Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    @settings(max_examples=300, deadline=None)
    @given(
        a=st.text(alphabet="abcx", max_size=24),
        b=st.text(alphabet="abcx", max_size=24),
        d=st.integers(min_value=1, max_value=8),
    )
    def check(a, b, d):
        w = d + 1
        if lev(a, b) <= d:
            assert abs(len(a) // w - len(b) // w) <= 1

    check()


def test_staged_incremental_refresh_matches_oracle(spark, sf_dir):
    """The composed nightly verb (diff -> added∪changed batch -> dedup vs
    retained history) against its written oracle, plus non-vacuity of both
    batch classes and of the history screen."""
    import duckdb

    from spark_gp_spark.queries import _INCREMENTAL_REFRESH_SQL, incremental_refresh

    got = incremental_refresh(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(_INCREMENTAL_REFRESH_SQL).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    for c in cols:
        assert (got[c].values == want[c].values).all(), c
    assert set(got["status"]) == {"added", "changed"}
    # the history screen must FIRE on the planted re-crawl copies: fewer
    # survivors than batch members (batch = added + changed per the diff)
    n_batch = con.execute(
        _INCREMENTAL_REFRESH_SQL[: _INCREMENTAL_REFRESH_SQL.index("SELECT k.doc_id")]
        + "SELECT count(*) FROM batch"
    ).fetchone()[0]
    assert len(got) < n_batch, "history screen dropped nothing (vacuous)"


def test_myers_kernel_matches_dp_reference():
    """The bit-parallel Myers kernel is codepoint-exact against the plain
    DP on adversarial fuzz: tiny/empty strings, patterns at and beyond the
    64-codepoint word boundary (fallback rows), multi-byte Unicode, and
    near-identical pairs (the regime the screen keeps)."""
    import random

    from spark_gp_spark.operators.dedup import _dp_levenshtein, _myers_distances

    random.seed(7)
    cases = []
    for alph in ("ab", "abc", "aβ⽇🎉b ", "abcdefghijklmnopqrstuvwxyz 01"):
        for _ in range(150):
            la = random.choice([0, 1, 2, 7, 30, 47, 48, 63, 64, 65, 70])
            lb = random.choice([0, 1, 2, 7, 30, 47, 48, 63, 64, 65, 70])
            cases.append((
                "".join(random.choice(alph) for _ in range(la)),
                "".join(random.choice(alph) for _ in range(lb)),
            ))
    for _ in range(150):  # near-identical pairs
        a = "".join(random.choice("abcd") for _ in range(48))
        b = list(a)
        for _ in range(random.randint(0, 5)):
            op, p = random.randint(0, 2), random.randrange(max(len(b), 1))
            if op == 0 and b:
                b[p] = random.choice("abcd")
            elif op == 1 and b:
                del b[p]
            else:
                b.insert(p, random.choice("abcd"))
        cases.append((a, "".join(b)))
    got = _myers_distances([c[0] for c in cases], [c[1] for c in cases])
    for i, (a, b) in enumerate(cases):
        assert got[i] == _dp_levenshtein(a, b), (a, b, got[i])


def test_editdist_arrow_and_jvm_verify_agree_on_corpus(spark, sf_dir):
    """The arrow (Myers), tiled (grouped Myers) and jvm (banded
    levenshtein) verify paths return the identical pair relation over the
    real corpus — the exactness contract behind the screen's tiled
    default."""
    from spark_gp_spark.queries import _EDITDIST_MAX, _EDITDIST_PREFIX, load_table

    docs = load_table(spark, sf_dir, "documents")
    s = F.substring(F.col("text"), 1, _EDITDIST_PREFIX)
    rel = {}
    for verify in ("arrow", "jvm", "tiled"):
        rel[verify] = {
            (r.id_a, r.id_b): r.dist
            for r in editdist_pairs(
                docs, s, max_dist=_EDITDIST_MAX, verify=verify
            ).collect()
        }
    assert rel["arrow"] == rel["jvm"]
    assert rel["tiled"] == rel["jvm"]
    assert rel["arrow"], "corpus produced no qualifying pairs"


def test_editdist_tiled_verify_is_lossless_and_exactly_once(spark):
    """The tiled path (unordered cell-pair groups, in-kernel pair
    generation) returns exactly the brute-force relation on the
    bucket-straddling fixture — for degenerate and non-degenerate tile
    counts, and with a second blocking feature AND-composed (3×3×T
    neighborhood).  Duplicate pairs (a row meeting another in two groups)
    or missed cross-bucket/cross-tile pairs would both show here."""
    rows = [
        (1, "kitten"),
        (2, "sitting"),        # dist 3
        (3, "kitte"),          # dist 1 to kitten
        (4, "a" * 30),         # far from everything
        (5, "a" * 33),         # dist 3 to #4, next length bucket at w=4
        (6, "completely different"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    brute = {
        (min(i1, i2), max(i1, i2)): lev(s1, s2)
        for (i1, s1), (i2, s2) in itertools.combinations(rows, 2)
        if lev(s1, s2) <= 3
    }
    sf = F.length(F.regexp_replace(F.col("text"), "[^aeiou]", ""))
    for kwargs in (
        dict(tiles=1),   # degenerate: every bucket is one cell
        dict(tiles=2),
        dict(tiles=7),   # more tiles than rows per bucket
        dict(tiles=2, second_feature=sf),
    ):
        got = [
            ((r.id_a, r.id_b), r.dist)
            for r in editdist_pairs(
                docs, F.col("text"), max_dist=3, verify="tiled", **kwargs
            ).collect()
        ]
        assert len(got) == len(dict(got)), f"duplicate pairs with {kwargs}"
        assert dict(got) == brute, kwargs
