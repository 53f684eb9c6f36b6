"""applyInPandasWithState custom stateful sessionization vs a DuckDB batch
replay of the same semantics (gap split, distinct-type counts, strict-<
ms-floored event-time timeout emission)."""

import duckdb
import pandas as pd
import pytest

from spark_gp_spark.queries import QUERIES, ORACLE_SQL


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = pd.to_numeric(df[c])
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def test_stateful_sessions_match_batch_oracle(spark, sf_dir):
    out = QUERIES["streaming_stateful_sessions"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    oracle = con.execute(ORACLE_SQL["streaming_stateful_sessions"]).df()

    assert len(out) == len(oracle) > 0
    a, b = _norm(out), _norm(oracle)
    for c in a.columns:
        assert (a[c].round(9) == b[c].round(9)).all(), f"column {c} diverges"
    # the stateful op must carry >1 distinct type in at least one session —
    # otherwise the exact-distinct machinery is untested
    assert (out["n_types"] > 1).any()


def test_sharded_sessions_equal_per_user_machine(spark, sf_dir):
    """The sharded shard-dict machine (r13, the per-group Arrow-invocation
    amortization) must emit the exact relation the per-user state machine
    does — same fold, same strict-< ms-floored event-time expiry."""
    from spark_gp_spark.streaming.stateful import run_stateful_session_stats

    a = _norm(
        run_stateful_session_stats(
            spark, sf_dir, query_name="gp_shard_tw_a", sharded=True
        ).toPandas()
    )
    b = _norm(
        run_stateful_session_stats(
            spark, sf_dir, query_name="gp_shard_tw_b", sharded=False
        ).toPandas()
    )
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert (a[c].round(9) == b[c].round(9)).all(), f"column {c} diverges"
