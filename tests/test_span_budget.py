"""Span-removal dedup (operators/dedup.py:dedup_span_clean) and per-group
token-budget fill (operators/prep.py:token_budget_fill): brute-force Python
replays of the semantics, the exactness of the bucketed prefix-sum
decomposition, and the physical-plan shapes the 100 TB story relies on."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- span clean


@pytest.fixture(scope="module")
def span_docs(spark):
    # doc 0 and 1 share the 3-gram "x y z" (positions differ); doc 2 is the
    # same text as doc 3 entirely; doc 4 is unique; doc 5 is shorter than n.
    rows = [
        Row(doc_id=0, text="a b x y z c d"),
        Row(doc_id=1, text="p x y z q r s"),
        Row(doc_id=2, text="one two three four"),
        Row(doc_id=3, text="one two three four"),
        Row(doc_id=4, text="totally unique words here now"),
        Row(doc_id=5, text="ti ny"),
    ]
    return spark.createDataFrame(rows)


def test_span_clean_matches_bruteforce(spark, span_docs):
    """Replay the rule in plain Python: a token is removed iff some n-gram
    covering it appears in >= 2 distinct docs."""
    from spark_gp_spark.operators.dedup import dedup_span_clean

    n = 3
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in dedup_span_clean(span_docs, n=n).collect()
    }

    docs = {r.doc_id: r.text.lower().split() for r in span_docs.collect()}
    grams = {}  # gram -> set of docs
    for d, toks in docs.items():
        for i in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[i : i + n]), set()).add(d)
    for d, toks in docs.items():
        covered = set()
        for i in range(len(toks) - n + 1):
            if len(grams[tuple(toks[i : i + n])]) >= 2:
                covered.update(range(i, i + n))
        clean = " ".join(t for j, t in enumerate(toks) if j not in covered)
        assert got[d] == (len(toks), len(covered), clean), d


def test_span_clean_short_docs_untouched(spark, span_docs):
    from spark_gp_spark.operators.dedup import dedup_span_clean

    got = {r["doc_id"]: r for r in dedup_span_clean(span_docs, n=3).collect()}
    assert got[5]["n_removed"] == 0
    assert got[5]["clean_text"] == "ti ny"
    # exact-dup docs 2/3 are fully wiped (every position covered)
    assert got[2]["clean_text"] == "" and got[3]["clean_text"] == ""
    assert got[4]["n_removed"] == 0  # unique doc untouched


def test_span_clean_plan_no_cartesian(spark, span_docs):
    from spark_gp_spark.operators.dedup import dedup_span_clean

    plan = _plan(dedup_span_clean(span_docs, n=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------- token budget fill


@pytest.fixture(scope="module")
def budget_result(spark):
    from spark_gp_spark.operators.prep import token_budget_fill
    from spark_gp_spark.queries import load_table

    docs = load_table(spark, SF, "documents")
    out = token_budget_fill(docs, budgets=500).toPandas()
    raw = [
        (r.doc_id, r.lang, len(r.text.lower().split()))
        for r in docs.select("doc_id", "lang", "text").collect()
    ]
    return out, raw


def test_budget_fill_matches_global_window_replay(budget_result):
    """The bucketed prefix sum must equal the single global per-group
    window: replay the greedy fill in plain Python over (hash, id) order."""
    import hashlib

    out, raw = budget_result
    p = 2_147_483_647

    def h(doc_id):
        return int(hashlib.md5(f"tb7_{doc_id}".encode()).hexdigest()[:8], 16) % p

    by_lang = {}
    for doc_id, lang, n_tok in raw:
        by_lang.setdefault(lang, []).append((h(doc_id), doc_id, n_tok))
    expect = {}
    for lang, rows in by_lang.items():
        cum = 0
        for hv, doc_id, n_tok in sorted(rows):
            expect[doc_id] = (lang, n_tok, cum, cum < 500)
            cum += n_tok
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.cum_before, r.kept)
        for r in out.itertuples()
    }
    assert got == expect


def test_budget_fill_bucket_count_invariant(spark):
    """cum_before is identical for buckets=1 (one window per group) and
    buckets=8 — the decomposition is exact, not approximate."""
    from spark_gp_spark.operators.prep import token_budget_fill
    from spark_gp_spark.queries import load_table

    docs = load_table(spark, SF, "documents")
    one = {
        r.doc_id: r.cum_before
        for r in token_budget_fill(docs, budgets=500, buckets=1).collect()
    }
    eight = {
        r.doc_id: r.cum_before
        for r in token_budget_fill(docs, budgets=500, buckets=8).collect()
    }
    assert one == eight


def test_budget_fill_monotone_and_group_contract(spark):
    """A larger budget keeps a superset; dict budgets drop absent groups;
    negative budgets are rejected."""
    from spark_gp_spark.operators.prep import token_budget_fill
    from spark_gp_spark.queries import load_table

    docs = load_table(spark, SF, "documents")
    lo = token_budget_fill(docs, budgets=300).toPandas()
    hi = token_budget_fill(docs, budgets=900).toPandas()
    kept_lo = set(lo[lo["kept"]]["doc_id"])
    kept_hi = set(hi[hi["kept"]]["doc_id"])
    assert kept_lo <= kept_hi and kept_lo != kept_hi

    en_only = token_budget_fill(docs, budgets={"en": 400}).toPandas()
    assert set(en_only["lang"]) == {"en"}

    with pytest.raises(ValueError, match="budget"):
        token_budget_fill(docs, budgets={"en": -1})


def test_budget_fill_offsets_are_broadcast(spark):
    """The per-(group, bucket) offset relation joins back via broadcast —
    the corpus never shuffles for the offset lookup."""
    from spark_gp_spark.operators.prep import token_budget_fill
    from spark_gp_spark.queries import load_table

    plan = _plan(token_budget_fill(load_table(spark, SF, "documents"), budgets=500))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------- streaming admission


def test_streaming_budget_state_machine_unit():
    """The per-group state func admits in doc_id order across and within
    micro-batches, accumulates EVERY document's tokens (rejected ones
    included), and carries the total in state — driven with a fake
    GroupState, no streaming query needed."""
    import pandas as pd

    from spark_gp_spark.streaming.budget import _make_budget_state_func

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self.get = None

        def update(self, tup):
            self.exists = True
            self.get = tup

        def remove(self):
            self.exists = False

    func = _make_budget_state_func(budget=10)
    state = FakeState()

    def run(ids, toks):
        batch = [pd.DataFrame({"doc_id": ids, "n_tokens": toks})]
        (out,) = list(func(("en",), iter(batch), state))
        return [tuple(r) for r in out.itertuples(index=False)]

    # batch 1 arrives UNSORTED: rows must be processed in doc_id order
    got = run([3, 1], [4, 5])
    assert got == [(1, "en", 5, 0, True), (3, "en", 4, 5, True)]
    assert state.get == (9,)
    # batch 2: first doc starts under budget (9 < 10) and is admitted even
    # though it overshoots; the next is rejected but still accumulates
    got = run([7, 9], [6, 1])
    assert got == [(7, "en", 6, 9, True), (9, "en", 1, 15, False)]
    assert state.get == (16,)
    # batch 3: everything rejected once the budget is crossed
    got = run([11], [2])
    assert got == [(11, "en", 2, 16, False)]
    assert state.get == (18,)


def test_streaming_budget_custom_columns_and_null_text(spark):
    """ADVICE r8 regressions: (a) non-default id_col/group_col must be
    threaded through the state machine and the output schema (they were
    hardcoded to doc_id/lang — KeyError / mislabeled column); (b) a NULL
    text must count as 0 tokens instead of crashing the state operator."""
    import pandas as pd

    from spark_gp_spark.streaming.budget import (
        _budget_out_schema,
        _make_budget_state_func,
        streaming_token_budget,
    )

    # (a) unit: custom column names flow through the state func + schema
    assert _budget_out_schema("item_id", "domain").startswith("item_id bigint, domain string")

    class FakeState:
        exists = False
        hasTimedOut = False
        get = None

        def update(self, tup):
            self.exists = True
            self.get = tup

    func = _make_budget_state_func(budget=10, id_col="item_id", group_col="domain")
    (out,) = list(
        func(("web",), iter([pd.DataFrame({"item_id": [2, 1], "n_tokens": [3, 4]})]),
             FakeState())
    )
    assert list(out.columns) == ["item_id", "domain", "n_tokens", "cum_before", "kept"]
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, "web", 4, 0, True), (2, "web", 3, 4, True)
    ]

    # (b) plan-level: the JVM projection coalesces NULL token counts to 0,
    # so the pandas state machine's int(...) can never see NaN.  Checked on
    # the analyzed batch plan of the same projection the operator builds.
    df = spark.createDataFrame(
        [(1, "en", None), (2, "en", "two words")],
        "doc_id bigint, lang string, text string",
    )
    out_df = streaming_token_budget(df, budget=10)
    toks_expr = [
        f for f in out_df.schema.fields if f.name == "n_tokens"
    ]
    assert toks_expr, "n_tokens column missing from streaming output schema"
    # the projection itself (pre-state) must yield 0 for NULL text
    from pyspark.sql import functions as F

    from spark_gp_spark.operators.text import token_count

    proj = df.select(
        F.coalesce(token_count(F.col("text")).cast("long"), F.lit(0)).alias("n")
    ).collect()
    assert sorted(r["n"] for r in proj) == [0, 2]


# ------------------------------------------------------ within-doc rep clean


def test_repetition_clean_matches_bruteforce(spark):
    """Python replay: token t is removed iff some n-gram start i <= t <
    i+n has an identical gram EARLIER in the same doc.  First occurrences
    survive; repeats are cut; short docs untouched; empty-ish docs safe."""
    from spark_gp_spark.operators.text import repetition_clean

    rows = [
        Row(doc_id=0, text="a b c a b c a b c"),      # refrain repeated 3x
        Row(doc_id=1, text="x y x y x y"),            # overlapping repeats
        Row(doc_id=2, text="all words unique here"),  # untouched
        Row(doc_id=3, text="so    much   whitespace"),
        Row(doc_id=4, text="ti ny"),                  # shorter than n
    ]
    df = spark.createDataFrame(rows)
    n = 3
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in repetition_clean(df, n=n).collect()
    }
    for r in rows:
        toks = r.text.lower().split()
        ngrams = [tuple(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)]
        covered = set()
        for i, gm in enumerate(ngrams):
            if gm in ngrams[:i]:
                covered.update(range(i, i + n))
        clean = " ".join(t for j, t in enumerate(toks) if j not in covered)
        assert got[r.doc_id] == (len(toks), len(covered), clean), r.doc_id


def test_repetition_clean_is_zero_shuffle(spark):
    """The whole operator is one per-row projection: no Exchange, no Join
    anywhere in the optimized plan.  (Read the parquet directly — the
    registry's load_table adds its own round-robin repartition hint, which
    is the loader's choice, not the operator's.)"""
    from spark_gp_spark.operators.text import repetition_clean

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(repetition_clean(docs, n=3))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_token_budget_fill_rejects_negative_int(spark):
    """A negative budget is invalid on BOTH input paths: the per-group dict
    already raised; the scalar-int path must too (it previously returned
    kept=False for every row instead)."""
    from spark_gp_spark.operators.prep import token_budget_fill

    docs = spark.createDataFrame([Row(doc_id=0, lang="en", text="a b c")])
    with pytest.raises(ValueError, match="budget"):
        token_budget_fill(docs, budgets=-1)


# ------------------------------------------------------------ pack sequences


def test_pack_sequences_covers_corpus_exactly(spark):
    """Python replay of the packing rule: concatenating docs in hash order
    into L-token windows, each doc's (seq_first, seq_last, seq_offset) is
    the floor-division arithmetic of the global prefix sum; window ranges
    tile the corpus with no gaps or overlaps at boundaries."""
    from spark_gp_spark.operators.prep import pack_sequences

    # deterministic subset: an unordered limit() can pick different rows on
    # each action, and this test materializes `docs` twice (operator + replay)
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 200")
    L = 128
    got = {
        r.doc_id: (r.n_tokens, r.cum_before, r.seq_first, r.seq_last, r.seq_offset)
        for r in pack_sequences(docs, seq_len=L, seed=7).collect()
    }
    # brute-force replay
    import hashlib

    def h32py(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2_147_483_647

    rows = [(r.doc_id, len(r.text.lower().split())) for r in docs.collect()]
    rows.sort(key=lambda t: (h32py(f"ps7_{t[0]}"), t[0]))
    cum = 0
    for doc_id, n in rows:
        first = cum if n > 0 else max(cum - 1, 0)
        last = cum + n - 1 if n > 0 else first
        want = (n, cum, first // L, last // L, first % L)
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
        cum += n
    # total coverage: last doc ends exactly at the corpus token count
    assert cum == sum(n for _, n in rows)


def test_pack_sequences_empty_doc_never_claims_phantom_window(spark):
    """A zero-token document landing exactly on the final seq_len boundary
    must attach to the LAST REAL window, not index one past the end; empty
    docs elsewhere attach to the window of the preceding token."""
    from spark_gp_spark.operators.prep import pack_sequences

    # 2 docs of 4 tokens each + 2 empty docs; L = 4 → windows 0 and 1 only
    rows = [
        Row(doc_id=0, text="a b c d"),
        Row(doc_id=1, text="e f g h"),
        Row(doc_id=2, text="   "),
        Row(doc_id=3, text=""),
    ]
    out = {
        r.doc_id: r
        for r in pack_sequences(
            spark.createDataFrame(rows), seq_len=4, seed=7
        ).collect()
    }
    total = sum(len(r.text.split()) for r in rows)
    last_window = (total - 1) // 4
    for r in out.values():
        assert 0 <= r.seq_first <= r.seq_last <= last_window, r
        if r.n_tokens == 0:
            assert r.seq_first == r.seq_last == max(r.cum_before - 1, 0) // 4
            assert r.seq_offset == max(r.cum_before - 1, 0) % 4


def test_pack_sequences_rejects_bad_seq_len(spark):
    from spark_gp_spark.operators.prep import pack_sequences

    docs = spark.createDataFrame([Row(doc_id=0, text="a b")])
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(docs, seq_len=0)
