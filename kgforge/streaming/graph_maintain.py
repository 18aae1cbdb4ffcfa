"""Streaming graph maintenance: an edge CDC feed (insert/delete-tagged
rows, the output shape of `Warehouse.changes` / `scan_cdc`) arrives as a
stream; each micro-batch folds its delta into running state tables — the
streaming mirror of the batch `graph_triangles_cdc` maintenance idea
(kgforge/ops/graph.py), at two levels:

- `maintain_degrees`: per-node degree state (a per-node scalar, one hash
  agg per batch).
- `maintain_triangles` (VERDICT r03 #7): per-node triangle counts + the
  live edge set as warehouse state, so the delta path's cost is actually
  delta-shaped END TO END — the old counts are READ from the state table,
  never recomputed (the registered `graph_triangles_cdc` key recomputes
  them in-op only because registered queries are stateless between driver
  calls).

Scale shape: each batch's delta work is |changed edges| × neighbor probes
(the changed side stays broadcast-sized; the edge state is scanned, and in
a production store would be bucket-pruned to the probed key ranges), and
both state writes are PARTITION-SCOPED (`Warehouse.replace_partitions_
scoped`): only hash-partitions containing touched nodes/edges are
rewritten, untouched partitions hard-link into the new snapshot.
Deletions that drop a count to 0 remove the row (tables hold live rows
only).

Exactly-once: each state table carries its own applied_batch_id in the
manifest, committed in the SAME atomic pointer swap as the data. The
triangle delta is computed from the PRE-batch edge state, so the triangles
table commits FIRST and the edge state second — a crash between the two
replays into (triangles done, edges pending), where the edge update still
sees the pre-batch edge state it needs.
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


# ------------------------------------------------------- triangle state
def _hpart(col: str, n_parts: int):
    """Stable hash partition for state tables — a pure function of the key,
    which is exactly the soundness condition the scoped rewrite needs."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_parts)).cast("int")


def _changed_triangle_corners(changed: DataFrame, graph_e: DataFrame) -> DataFrame:
    """Corner nodes (one row per triangle corner) of every triangle in
    ``graph_e`` that contains ≥1 ``changed`` edge, each triangle counted
    EXACTLY once: it is attributed to its lexicographically-smallest
    changed edge — a candidate row survives only if each of the triangle's
    other two edges is either unchanged or later in the order (the batch
    mirror of graph_triangles_cdc's attribution). Inputs are (a, b) with
    a < b; per-batch work is |changed| × neighbor probes + two
    changed-sized membership joins, never a triangle re-enumeration."""
    adj = graph_e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        graph_e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    cand = (
        changed.join(adj, F.col("a") == F.col("u"))
        .select("a", "b", F.col("v").alias("z"))
        .where(F.col("z") != F.col("b"))
    )
    # triangle closes iff edge (b, z) exists
    tri = (
        cand.withColumn("na", F.least("b", "z"))
        .withColumn("nb", F.greatest("b", "z"))
        .join(
            graph_e.select(F.col("a").alias("na"), F.col("b").alias("nb")),
            ["na", "nb"],
            "semi",
        )
        .select("a", "b", "z")
    )
    ch = changed.select(
        F.col("a").alias("na"), F.col("b").alias("nb"), F.lit(True).alias("is_ch")
    )

    def keep_if_min_changed(df: DataFrame, x: str, y: str) -> DataFrame:
        d = (
            df.withColumn("na", F.least(x, y))
            .withColumn("nb", F.greatest(x, y))
            .join(ch, ["na", "nb"], "left")
        )
        unchanged_or_later = F.col("is_ch").isNull() | (
            F.struct(F.col("a"), F.col("b"))
            < F.struct(F.col("na").alias("a"), F.col("nb").alias("b"))
        )
        return d.where(unchanged_or_later).drop("na", "nb", "is_ch")

    tri = keep_if_min_changed(tri, "a", "z")
    tri = keep_if_min_changed(tri, "b", "z")
    return tri.select(F.explode(F.array("a", "b", "z")).alias("node_id"))


def init_triangle_state(
    warehouse_root: str, edges: DataFrame, n_parts: int = 32
) -> None:
    """Seed the state from the old snapshot: the live (a < b) edge set and
    the per-node triangle counts, both hash-partitioned so per-batch
    updates stay partition-scoped. n_parts rides the manifest so
    maintain_triangles always buckets with the init-time modulus."""
    from kgforge.ops.graph import triangle_counts

    wh = Warehouse(warehouse_root)
    meta = {"applied_batch_id": -1, "n_parts": n_parts}
    wh.write_snapshot(
        "tri_edges",
        edges.select("a", "b").withColumn("epart", _hpart("a", n_parts)),
        ["epart"],
        meta=meta,
    )
    wh.write_snapshot(
        "triangles",
        triangle_counts(edges).withColumn("npart", _hpart("node_id", n_parts)),
        ["npart"],
        meta=meta,
    )


def maintain_triangles(stream: DataFrame, warehouse_root: str) -> None:
    """Drain the edge CDC stream, folding each micro-batch into the
    `triangles` AND `tri_edges` state tables (seeded by
    init_triangle_state). Per batch: destroyed triangles are enumerated
    against the PRE-batch edge state from the deleted edges only, created
    triangles against the post-batch edge set from the inserted edges only
    — cost scales with the batch, the old counts come from the state
    table. Both writes are partition-scoped with per-table applied_batch_id
    markers (triangles commits first; see module docstring for the
    crash-replay argument)."""
    wh = Warehouse(warehouse_root)

    def process_batch(bdf: DataFrame, batch_id: int) -> None:
        sp = bdf.sparkSession
        tri_meta = wh.snapshot_meta("triangles")
        n_parts = tri_meta["n_parts"]
        tri_done = batch_id <= tri_meta.get("applied_batch_id", -1)
        edg_done = batch_id <= wh.snapshot_meta("tri_edges").get(
            "applied_batch_id", -1
        )
        if tri_done and edg_done:
            return  # at-least-once replay of a fully-committed batch
        bdf = bdf.persist()
        dels = bdf.where(F.col("change_type") == "delete").select("a", "b")
        ins = bdf.where(F.col("change_type") == "insert").select("a", "b")
        old_e = wh.read(sp, "tri_edges").select("a", "b")

        if not tri_done:
            new_e = old_e.join(dels, ["a", "b"], "left_anti").unionByName(ins)
            delta = (
                _changed_triangle_corners(ins, new_e)
                .withColumn("d", F.lit(1))
                .unionAll(
                    _changed_triangle_corners(dels, old_e).withColumn(
                        "d", F.lit(-1)
                    )
                )
                .groupBy("node_id")
                .agg(F.sum("d").cast("long").alias("dt"))
                .where(F.col("dt") != 0)
                .withColumn("npart", _hpart("node_id", n_parts))
                .persist()
            )
            # ≤ n_parts rows to the driver — bounded by construction
            parts = [r[0] for r in delta.select("npart").distinct().collect()]
            if parts:
                cur = wh.read(sp, "triangles").where(F.col("npart").isin(parts))
                new_aff = (
                    cur.join(delta.select("node_id", "dt"), "node_id", "full_outer")
                    .select(
                        "node_id",
                        (
                            F.coalesce(F.col("triangles"), F.lit(0))
                            + F.coalesce(F.col("dt"), F.lit(0))
                        ).cast("long").alias("triangles"),
                    )
                    .where(F.col("triangles") > 0)
                    .withColumn("npart", _hpart("node_id", n_parts))
                )
                wh.replace_partitions_scoped(
                    sp, "triangles", new_aff, "npart", parts,
                    meta={"applied_batch_id": batch_id, "n_parts": n_parts},
                )
            # empty delta: no commit needed — replaying recomputes the same
            # empty delta, so skipping the marker advance stays idempotent

        if not edg_done:
            changed = dels.unionByName(ins).withColumn(
                "epart", _hpart("a", n_parts)
            )
            eparts = [r[0] for r in changed.select("epart").distinct().collect()]
            if eparts:
                cur_e = wh.read(sp, "tri_edges").where(F.col("epart").isin(eparts))
                new_e_aff = cur_e.join(
                    dels, ["a", "b"], "left_anti"
                ).unionByName(ins.withColumn("epart", _hpart("a", n_parts)))
                wh.replace_partitions_scoped(
                    sp, "tri_edges", new_e_aff, "epart", eparts,
                    meta={"applied_batch_id": batch_id, "n_parts": n_parts},
                )
        bdf.unpersist()

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="kgforge_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
