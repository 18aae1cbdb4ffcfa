"""Streaming graph maintenance: an edge CDC feed (insert/delete-tagged
rows, the output shape of `Warehouse.changes` / `scan_cdc`) arrives as a
stream; each micro-batch folds its per-node degree delta into a running
`degrees` state table — the streaming mirror of the batch
`graph_triangles_cdc` maintenance idea (kgforge/ops/graph.py), kept to
degrees here because degree state is a per-node scalar the foreachBatch
read-modify-write can maintain exactly.

Scale shape: the per-batch delta aggregation is proportional to the BATCH
(two projections + one hash agg), and the state table is entity-bounded —
the KG's node set, not its edge set — so the per-micro-batch snapshot
rewrite is bounded by a data property, the same argument the batch
pipeline makes for its canonical map. Deletions that drop a node to
degree 0 remove the row (the table holds live nodes only).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.io.tableio import Warehouse
from kgforge.streaming import replay


def undirected_degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) over undirected edges (a, b) — both endpoints count."""
    return (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def edge_changes_stream(
    spark: SparkSession,
    changes: DataFrame,
    n_files: int = 4,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay an edge CDC feed (a, b, change_type) as a file-source stream
    (micro-batches split by edge ranges) — the shared replay harness."""
    return replay.replay_stream(
        spark,
        changes,
        ["a", "b"],
        n_files=n_files,
        max_files_per_trigger=max_files_per_trigger,
        prefix="kgforge_edge_replay_",
    )


def maintain_degrees(stream: DataFrame, warehouse_root: str) -> None:
    """Drain the edge CDC stream, folding each micro-batch's per-node
    degree delta into the warehouse `degrees` table (which must hold the
    old snapshot's degrees before the stream starts). Each batch is one
    bounded read-modify-write: delta agg (batch-sized) + full-outer join
    against the entity-bounded state table + snapshot write.

    Exactly-once under at-least-once foreachBatch: the applied batch_id
    rides the degrees snapshot's manifest and commits in the SAME atomic
    pointer swap as the data, so a replayed batch (failure between the
    snapshot commit and the stream checkpoint, or a full re-run against
    the same ordered feed) sees batch_id <= applied_batch_id and is a
    no-op instead of double-applying its delta."""
    wh = Warehouse(warehouse_root)

    def process_batch(bdf: DataFrame, batch_id: int) -> None:
        sp = bdf.sparkSession
        if batch_id <= wh.snapshot_meta("degrees").get("applied_batch_id", -1):
            return  # at-least-once replay of an already-committed batch
        sign = F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = (
            bdf.select(F.col("a").alias("node"), sign.alias("d"))
            .unionAll(bdf.select(F.col("b").alias("node"), sign.alias("d")))
            .groupBy("node")
            .agg(F.sum("d").alias("d"))
        )
        cur = wh.read(sp, "degrees")
        new = (
            cur.join(delta, "node", "full_outer")
            .select(
                "node",
                (
                    F.coalesce(F.col("deg"), F.lit(0))
                    + F.coalesce(F.col("d"), F.lit(0))
                )
                .cast("long")
                .alias("deg"),
            )
            .where(F.col("deg") > 0)
        )
        wh.write_snapshot("degrees", new, meta={"applied_batch_id": batch_id})

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kgforge_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
