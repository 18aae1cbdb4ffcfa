"""Structured Streaming surface (SURVEY.md §2.B streaming pane).

The batch pipeline is the source of truth for semantics; these jobs express
the SAME window/dedup expressions over ``readStream`` so that a micro-batch
replay of the events table (file source, ``availableNow`` trigger) reproduces
the batch results — that equivalence is the streaming correctness gate
(tests/test_streaming.py), mirroring how the batch ops are gated on DuckDB.

Pieces:
- file-source replay of the driver `events` parquet (maxFilesPerTrigger
  simulates micro-batches),
- watermarked tumbling-window aggregation,
- streaming dedup via dropDuplicatesWithinWatermark,
- custom stateful sessionization via applyInPandasWithState,
- idempotent foreachBatch MERGE sink reusing the batch Warehouse.

Scale: streaming state is partitioned by the grouping key exactly like a
batch shuffle; watermarks bound state size; the foreachBatch sink inherits
the MERGE idempotence so replayed micro-batches are safe.
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kgforge.io.tableio import Warehouse
from kgforge.ops._util import dsum
from kgforge.streaming import replay
from kgforge.tables import load


def replay_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Materialize the events table as an n-file directory for the file
    stream source (the driver table is a single file; a directory of several
    files gives a real multi-micro-batch replay with maxFilesPerTrigger=1).
    Range-partitioned by ts so micro-batches advance in event time — a
    replay that scatters time across batches would (correctly) get its
    stragglers dropped by the watermark; the gate wants watermark-clean
    equality."""
    return replay.replay_parquet_dir(
        load(spark, sf_dir, "events"), ["ts"], n_files=n_files
    )


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source replay of the events table as a stream."""
    path = replay_dir(spark, sf_dir)
    schema = load(spark, sf_dir, "events").schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    # driver parquet carries TIMESTAMP_NTZ; watermarks require TIMESTAMP_LTZ.
    # Session tz is pinned to UTC (kgforge.session), so the cast is wall-time
    # preserving and collected rows compare equal to the batch mirror.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation — same expression as the batch
    mirror (kgforge/ops/streaming_batch.py::stream_tumble_batch)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "event_type",
            "n",
            "total",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id, state bounded by the watermark."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


SESSION_STATE_SCHEMA = "n long"
SESSION_OUT_SCHEMA = "user_id long, n_events long"


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user event count — custom stateful operator exercising the
    applyInPandasWithState surface; emits the cumulative count each batch."""
    (n,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def stateful_user_counts(stream: DataFrame) -> DataFrame:
    """NoTimeout is deliberate here: the operator IS a lifetime counter, so
    evicting idle users would change its semantics (a returning user would
    restart at 0). State grows with the distinct-user set — acceptable for
    a bounded user universe; an operator keyed on an UNBOUNDED set (e.g.
    conversations) must evict instead, the streaming/sft.py pattern
    (EventTimeTimeout armed at last-event + EVICT_DELAY)."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame, output_mode: str, query_name: str
) -> DataFrame:
    """Drain the stream with trigger(availableNow) into a memory sink and
    return the result as a batch DataFrame."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kgforge_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def merge_sink(
    stream_df: DataFrame, warehouse_root: str, table: str, keys: list[str]
) -> None:
    """foreachBatch MERGE sink: micro-batches land through the same
    idempotent Warehouse.merge as the batch materialize stage, so replayed
    batches (failure/retry) cannot duplicate rows."""
    wh = Warehouse(warehouse_root)

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        wh.merge(bdf.sparkSession, table, bdf, keys=keys)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kgforge_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
