"""Streaming KG ingestion: transcripts arrive as a stream; each micro-batch
runs the SAME extract → link dataflow as the batch pipeline and MERGEs into
the warehouse; canonicalization + triple materialization run on the merged
table (triples are corpus-level — cross-turn adjacency can span micro-
batches, so they finalize after ingestion; at production scale this is the
periodic compaction pass over a continuously-ingested linked table).

Idempotence: mention keys (conv_id, turn_idx, m_idx) are deterministic, so a
replayed micro-batch (failure/retry) merges to a no-op — the streaming
equivalent of the bot's create-or-update writes.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from kgforge import canon, extract, link, metrics, triples
from kgforge.io.tableio import Warehouse
from kgforge.streaming import replay


def transcripts_stream(
    spark: SparkSession,
    transcripts: DataFrame,
    n_files: int = 4,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay a transcript DataFrame as a file-source stream (micro-batches
    split by conversation ranges; ascending mtimes fix source order)."""
    return replay.replay_stream(
        spark,
        transcripts,
        ["conv_id", "turn_idx"],
        n_files=n_files,
        max_files_per_trigger=max_files_per_trigger,
        prefix="kgforge_tr_replay_",
    )


def ingest(
    stream: DataFrame,
    dictionary: DataFrame,
    warehouse_root: str,
) -> None:
    """Drain the transcript stream through extract+link into the warehouse."""
    wh = Warehouse(warehouse_root)

    def process_batch(bdf: DataFrame, batch_id: int) -> None:
        mentions = extract.extract_mentions(
            bdf.select("conv_id", "turn_idx", "text"), dictionary
        )
        linked = metrics.with_lineage_part(link.link_mentions(mentions, dictionary))
        # Partitioned by lineage_part = f(conv_id) with conv_id a merge key,
        # so micro-batches 2..N take the PARTITION-SCOPED merge: only the
        # lineage parts this batch's conversations hash into are anti-joined
        # and rewritten; the rest of the linked table is hard-linked forward
        # (inode-asserted in tests/test_streaming.py). At scale that makes
        # per-micro-batch sink cost proportional to the batch, not the table.
        wh.merge(
            bdf.sparkSession, "linked", linked,
            keys=["conv_id", "turn_idx", "m_idx"],
            partition_by=["lineage_part"], part_determined_by_keys=True,
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kgforge_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def finalize(
    spark: SparkSession,
    dictionary: DataFrame,
    xref_edges: DataFrame,
    warehouse_root: str,
) -> DataFrame:
    """Post-ingestion compaction: triples + canonicalization over the merged
    linked table — identical code path to the batch pipeline's stage 3."""
    wh = Warehouse(warehouse_root)
    linked_all = wh.read(spark, "linked").persist()
    raw = triples.build_raw_triples(linked_all)
    cmap = canon.canonical_map_auto(dictionary.select("entity_id").distinct(), xref_edges)
    final = metrics.with_lineage_part_of(
        triples.dedup_triples(
            canon.remap_triples(raw, cmap),
            # manifest row count decides the dedup shape — no count job
            two_level=wh.rows("linked") >= triples.TWO_LEVEL_MIN_ROWS,
        ),
        ["subj", "pred", "obj"],  # partition = f(merge keys): scoped-merge sound
    )
    wh.merge(spark, "triples", final, keys=["subj", "pred", "obj"],
             partition_by=["lineage_part"], source_unique=True,
             part_determined_by_keys=True)
    return wh.read(spark, "triples")
