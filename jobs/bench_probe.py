#!/usr/bin/env python
"""One ceiling-probe run at ONE parallelism level (own process — getOrCreate
would reuse a session with the wrong master).

    python jobs/bench_probe.py --mode cpu|mem --cpus 8

Two probes that bracket the single-box 8→32 scaling question the pipeline
ladder raises (BENCH/BASELINE.md documents 8→32 pair efficiency ~0.23–0.27
and attributes it to the shared memory subsystem — this pair of probes is
the direct evidence for that attribution):

- ``cpu``: whole-stage-codegen integer hashing over ``spark.range`` — the
  rows are GENERATED, never read, so the working set is registers/L1. If
  the box can scale compute 8→32, this probe shows it.
- ``mem``: a STREAM-triad-style pass in mapInPandas — each task allocates a
  fixed numpy buffer far larger than L3 and streams it repeatedly
  (a = b*s + a), so the probe is pure DRAM bandwidth. Task count and bytes
  are FIXED across levels (32 tasks; local[8] runs them in 4 waves,
  local[32] in 1) so total traffic is identical.

Prints ONE JSON line. tools/bench_ceiling.py orchestrates levels/medians and
writes BENCH/CEILING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge.session import get_spark  # noqa: E402

CPU_ROWS = 4_000_000_000  # ~10 s at local[8] on this box
MEM_TASKS = 32            # fixed across levels → identical total traffic
MEM_BUF_MB = 256          # per-task buffer, >> L3 (32 MiB class)
MEM_SWEEPS = 40           # buffer passes per task


def probe_cpu(spark) -> float:
    # Nested xxhash64 keeps ~all cycles in codegen'd integer ops; sum's
    # combine is per-partition, so shuffle traffic is bytes, not gigabytes.
    df = spark.range(0, CPU_ROWS, 1, numPartitions=MEM_TASKS)
    t0 = time.time()
    df.selectExpr(
        # % bounds the addend so the ANSI-mode sum cannot overflow long
        "sum(xxhash64(xxhash64(xxhash64(id))) % 1000003) AS s"
    ).collect()
    return time.time() - t0


def probe_mem(spark) -> float:
    import pandas as pd  # noqa: F401

    buf_mb, sweeps = MEM_BUF_MB, MEM_SWEEPS

    def triad(batches):
        import numpy as np

        n = (buf_mb << 20) // 8
        a = np.zeros(n)
        b = np.ones(n)
        tmp = np.empty(n)
        for _ in range(sweeps):
            # STREAM triad IN PLACE (ADVICE r03): `a = b * k + a` allocates
            # two fresh buffers per sweep, mixing page-fault/zero-fill
            # traffic into the number; with preallocated out= targets each
            # sweep is exactly read-b / read-a+read-tmp / write pressure —
            # 3 × buf_mb of steady-state DRAM traffic, identical at both
            # parallelism levels.
            np.multiply(b, 1.000001, out=tmp)
            np.add(tmp, a, out=a)
        yield __import__("pandas").DataFrame({"s": [float(a[0])]})

    df = spark.range(0, MEM_TASKS, 1, numPartitions=MEM_TASKS)
    t0 = time.time()
    df.mapInPandas(triad, "s double").collect()
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["cpu", "mem"], required=True)
    ap.add_argument("--cpus", type=int, required=True)
    args = ap.parse_args()

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        app_name=f"probe-{args.mode}",
    )
    fn = probe_cpu if args.mode == "cpu" else probe_mem
    fn(spark)  # warm-up (JIT / Python worker fork) — untimed
    wall = fn(spark)
    print(json.dumps({"mode": args.mode, "cpus": args.cpus, "wall_s": round(wall, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
