"""Streaming as-of KG maintenance — the temporal pane's ``kg_asof`` as a
stateful stream: per (subj, pred), maintain the LATEST assertion while
per-occurrence triples arrive in micro-batches. This is the streaming dual
of the batch latest-wins aggregate: the string-encoded MAX (fixed-width
doc_seq + m_idx digits + \\x01 + obj — convo.asof_triples' encoding,
reproduced by ``encode_assertions``) makes the per-key state a SINGLE
string whose max is associative, so any micro-batch arrival order and any
replay converge to the batch answer — pytest drains a replay split so that
later batches OVERTURN earlier winners and asserts the final state equals
``convo.asof_triples`` on the same rows.

State design: one encoded string per live (subj, pred) — the KG itself, so
the live-key set is bounded by the assertion-key vocabulary (KG-sized, not
corpus-sized). NoTimeout is deliberate, the jobs.py lifetime-counter rule:
an as-of table must answer for EVERY key ever asserted, so eviction would
change semantics; a deployment that archives cold keys would spill them to
the warehouse state table (the graph_maintain.py pattern) rather than
dropping them. Emissions are monotone per key (update mode): each batch
emits the key's current winner only when it changed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kgforge.ops.convo import ASOF_PAD, _MIDX_PAD

ASOF_STATE_SCHEMA = "enc string"
ASOF_OUT_SCHEMA = "subj string, pred string, obj string, asof_seq long"


def encode_assertions(rem: DataFrame, n_convs: int) -> DataFrame:
    """Per-occurrence triples → (subj, pred, enc) with the batch op's
    latest-wins encoding (doc_seq digits + m_idx digits + \\x01 + obj)."""
    doc_seq = (
        F.col("turn_idx").cast("bigint") * n_convs
        + F.expr("CAST(substring(conv_id, 2) AS BIGINT)")
    )
    enc = F.concat(
        F.lpad(doc_seq.cast("string"), ASOF_PAD, "0"),
        F.lpad(F.col("m_idx").cast("string"), _MIDX_PAD, "0"),
        F.lit("\x01"),
        F.col("obj"),
    )
    return rem.select("subj", "pred", enc.alias("enc"))


def _decode(enc: str) -> tuple[str, int]:
    return enc[ASOF_PAD + _MIDX_PAD + 1 :], int(enc[:ASOF_PAD])


def _asof_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best = state.get[0] if state.exists else ""
    prev = best
    for pdf in pdfs:
        for enc in pdf["enc"]:
            if enc > best:
                best = enc
    if best != prev:
        state.update((best,))
        obj, seq = _decode(best)
        yield pd.DataFrame(
            {
                "subj": [key[0]],
                "pred": [key[1]],
                "obj": [obj],
                "asof_seq": [seq],
            }
        )
    else:
        yield pd.DataFrame(
            {"subj": [], "pred": [], "obj": [], "asof_seq": []}
        )


def asof_stream(encoded: DataFrame) -> DataFrame:
    """Encoded assertion stream (subj, pred, enc) → streaming as-of table
    (update mode: a key re-emits only when its winner changes)."""
    return encoded.groupBy("subj", "pred").applyInPandasWithState(
        _asof_fn,
        outputStructType=ASOF_OUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
