"""De-vacuated twins staged for the round-11 window (r10 audit item 7b +
this session's redact_pii finding): the natural corpus has zero
byte-identical texts and zero PII-pattern hits, so `exact_dedup`,
`dedup_keep_first`, and `redact_pii` were hash-green over relations where
the verb never fired.  The planted twins make each verb provably fire and
are checked side-by-side against their DuckDB oracles — the exact check
the r11 driver window will run.

Layers: semantics on hand-built frames (expected values computed by hand),
then the sf0.01 oracle parity + non-vacuity assertions."""

import duckdb
import pytest
from pyspark.sql import functions as F


def _oracle_con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
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


def test_redact_pii_semantics_on_handbuilt_frame(spark):
    """The redaction itself, on text where it must fire: counts and
    replacement both checked against hand-computed expectations (the
    registered redact_pii entry never exercises this — zero corpus hits)."""
    from spark_gp_spark.operators.prep import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-1.example.org or x@y.io today"),
            (2, "card 4111222233334444 and pin 123456789 listed"),
            (3, "short 12345678 run stays; so does plain text"),
            (4, "x@y.io 123456789 both classes in one doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_emails, out[1].n_long_numbers) == (2, 0)
    assert out[1].clean_text == "mail me at <EMAIL> or <EMAIL> today"
    assert (out[2].n_emails, out[2].n_long_numbers) == (0, 2)
    assert out[2].clean_text == "card <NUMBER> and pin <NUMBER> listed"
    # 8 digits is below the 9+ threshold: nothing fires
    assert (out[3].n_emails, out[3].n_long_numbers) == (0, 0)
    assert out[3].clean_text == df.collect()[2].text
    assert (out[4].n_emails, out[4].n_long_numbers) == (1, 1)
    assert out[4].clean_text == "<EMAIL> <NUMBER> both classes in one doc"


def test_plant_exact_dups_creates_verbatim_copies(spark):
    """The fixture's contract: doc_id % 19 == 6 docs with a successor carry
    the successor's text VERBATIM; everything else is untouched."""
    from spark_gp_spark.queries import _plant_exact_dups

    rows = [(i, f"text {i}") for i in range(24, 30)]  # 25 % 19 == 6
    out = {
        r.doc_id: r.text
        for r in _plant_exact_dups(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[25] == "text 26"
    for i in (24, 26, 27, 28, 29):
        assert out[i] == f"text {i}"


def test_staged_exact_dedup_planted_matches_duckdb_oracle(spark, sf_dir):
    from spark_gp_spark.queries import _EXACT_DEDUP_PLANTED_SQL, exact_dedup_planted

    got = exact_dedup_planted(spark, sf_dir).toPandas()
    want = _oracle_con(sf_dir).execute(_EXACT_DEDUP_PLANTED_SQL).df()
    _assert_parity(got, want)
    # non-vacuity: the planted copies collapse real groups
    assert (got["dup_count"] > 1).sum() >= 10


def test_staged_dedup_keep_first_planted_matches_duckdb_oracle(spark, sf_dir):
    from spark_gp_spark.queries import (
        _DEDUP_KEEP_FIRST_PLANTED_SQL,
        dedup_keep_first_planted,
    )

    got = dedup_keep_first_planted(spark, sf_dir).toPandas()
    want = _oracle_con(sf_dir).execute(_DEDUP_KEEP_FIRST_PLANTED_SQL).df()
    _assert_parity(got, want)
    # non-vacuity: survivors < input rows (planted copies actually die)
    n_input = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert len(got) < n_input


def test_staged_redact_pii_planted_matches_duckdb_oracle(spark, sf_dir):
    from spark_gp_spark.queries import _REDACT_PLANTED_SQL, redact_pii_planted

    got = redact_pii_planted(spark, sf_dir).toPandas()
    want = _oracle_con(sf_dir).execute(_REDACT_PLANTED_SQL).df()
    _assert_parity(got, want)
    # non-vacuity: both PII classes fire
    assert int(got["n_emails"].sum()) > 0
    assert int(got["n_long_numbers"].sum()) > 0
