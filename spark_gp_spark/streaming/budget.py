"""Streaming token-budget admission: greedy per-group fill over a STREAM.

The batch operator (operators/prep.py:token_budget_fill) fills each group's
budget in seeded-hash order over a complete corpus; an ingest pipeline
instead admits documents AS THEY ARRIVE until the group's budget is spent —
"is there still room in this language's token budget?" answered per
arriving document.  The admission decision needs exactly one number per
group (tokens accumulated so far), so the state machine is an
``applyInPandasWithState`` keyed by the group column carrying a single
bigint — the streaming analogue of the batch operator's prefix sum, with
arrival order standing in for hash order.

With id-ordered staged arrivals (repartitionByRange on doc_id, the same
harness contract as streaming/neardup.py) the emitted relation is a pure
function of the data:

    cum_before(d) = Σ n_tokens(d') over d' of the same group with d' < d
    kept(d)       = cum_before(d) < budget

which the batch oracle states as one window per group ordered by doc_id.
Like the batch operator, the running total accumulates EVERY document's
tokens (admitted or not): once a group's budget is crossed, all later
documents of that group are rejected — the decision is stable under
re-ordering of the already-rejected tail.

Scale shape: the token count is a JVM-side projection on the stream; the
only shuffle is the groupBy(group) into the state operator; state is ONE
long per distinct group (languages/domains — tens, not millions), so state
never grows with the stream.  No watermark or timeout is needed: emission
is on arrival and the state is O(groups) forever.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ..operators.text import token_count
from .events import _drive_append_query, _staged_arrivals, _state_partitions

def _budget_out_schema(id_col: str = "doc_id", group_col: str = "lang") -> str:
    return (
        f"{id_col} bigint, {group_col} string, n_tokens bigint, "
        "cum_before bigint, kept boolean"
    )


BUDGET_OUT_SCHEMA = _budget_out_schema()
BUDGET_STATE_SCHEMA = "cum bigint"


def _make_budget_state_func(budget: int, id_col: str = "doc_id",
                            group_col: str = "lang"):
    """Per-group state machine: walk the micro-batch's rows in id order,
    emit (doc, cum-before-it, admitted?) and carry the group's running token
    total.  Intra-batch order is imposed by the sort here; cross-batch order
    is the harness's id-range arrival contract.  The id/group column names
    are threaded from the operator (ADVICE r8: they were hardcoded, so a
    non-default ``id_col`` raised KeyError and a non-default ``group_col``
    emitted under a mislabeled column)."""

    def func(
        key: Tuple, pdf_iter: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # unreachable under NoTimeout; kept for safety
            state.remove()
            return
        cum = int(state.get[0]) if state.exists else 0
        pdf = pd.concat(list(pdf_iter), ignore_index=True).sort_values(id_col)
        rows = []
        for _, r in pdf.iterrows():
            rows.append((int(r[id_col]), key[0], int(r["n_tokens"]), cum,
                         cum < budget))
            cum += int(r["n_tokens"])
        state.update((int(cum),))
        yield pd.DataFrame(
            rows, columns=[id_col, group_col, "n_tokens", "cum_before", "kept"]
        )

    return func


def streaming_token_budget(
    stream: DataFrame,
    budget: int,
    text_col: str = "text",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """The streaming admission operator over an arriving document stream:
    (id, group, n_tokens, cum_before, kept) emitted per arrival.  A NULL
    text counts as 0 tokens (coalesced in the JVM projection, ADVICE r8 —
    the batch operator propagates NULL through its window; the streaming
    state machine must not crash on it)."""
    toks = stream.select(
        F.col(id_col),
        F.col(group_col),
        F.coalesce(token_count(F.col(text_col)).cast("long"), F.lit(0)).alias(
            "n_tokens"
        ),
    )
    return toks.groupBy(group_col).applyInPandasWithState(
        _make_budget_state_func(budget, id_col, group_col),
        _budget_out_schema(id_col, group_col),
        BUDGET_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_streaming_token_budget(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 2000,
    n_files: int = 2,
    query_name: str = "gp_stream_token_budget",
) -> DataFrame:
    """Drive the documents parquet through the streaming budget operator:
    id-range staged arrivals (arrival order == id order, so the oracle is
    one window per language ordered by doc_id), admission log into a
    parquet sink, read back as the result relation."""
    work = tempfile.mkdtemp(prefix="gp_stream_budget_")
    sink, ckpt = os.path.join(work, "sink"), os.path.join(work, "ckpt")
    src, arrivals, schema = _staged_arrivals(
        spark, sf_dir, work, n_files, sentinel=False,
        table="documents", order_col="doc_id",
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_token_budget(stream, budget)
    with _state_partitions(spark):
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .queryName(query_name)
            .start()
        )
    _drive_append_query(q, src, arrivals)
    return spark.read.schema(BUDGET_OUT_SCHEMA).parquet(sink)
