#!/usr/bin/env python
"""Skew evidence: the contract-mandated salted repartition vs naive
conv_id partitioning on a pathological corpus where ONE conversation holds
half the turns (the shape AQE cannot fix — skew lives at the UDF stage, not
a join).

    python tools/bench_skew.py [--cpus 16]

Generates ~1M turns with a single 500k-turn hot conversation, then times
extraction (the Python-heavy stage) over (a) conv_id-only partitioning —
the hot conversation lands on ONE task — and (b) the salted layout.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kgforge import extract, synth_spark  # noqa: E402
from kgforge.session import get_spark  # noqa: E402
from kgforge.skew import salted_repartition  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--convs", type=int, default=100_000)
    args = ap.parse_args()
    spark = get_spark(master=f"local[{args.cpus}]", app_name="skew-bench",
                      shuffle_partitions=args.cpus * 2)

    tr, d, _ = synth_spark.bench_inputs(
        spark, n_convs=args.convs, n_hot=1, hot_turns=(500_000, 500_000)
    )
    tr = tr.select("conv_id", "turn_idx", "text").persist()
    n = tr.count()
    hot = tr.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    print(f"# turns={n}, hottest conversation={hot['count']} "
          f"({100 * hot['count'] / n:.0f}% of corpus)", file=sys.stderr)

    def run(df) -> float:
        t0 = time.time()
        extract.extract_mentions(df, d).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    naive = run(tr.repartition(args.cpus * 2, "conv_id"))
    salted = run(salted_repartition(tr, args.cpus * 2, target_rows=1000))
    print(json.dumps({
        "turns": n,
        "hot_turns": hot["count"],
        "cpus": args.cpus,
        "naive_conv_partition_s": round(naive, 1),
        "salted_s": round(salted, 1),
        "speedup": round(naive / salted, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
