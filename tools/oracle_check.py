"""Local mirror of the driver's Spark-vs-DuckDB correctness gate.

For each registered op: run the Spark query and (when present) the DuckDB
oracle SQL at a given sf dir, then compare row count, sorted column names,
and an order-insensitive canonical value comparison that is STRICTER than
any reasonable hash (exact repr equality after canonicalization) — if this
passes, the driver's value-hash passes.

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [keys...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from kgforge.registry import all_ops  # noqa: E402
from kgforge.session import get_spark  # noqa: E402
from kgforge.tables import TABLE_NAMES  # noqa: E402


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return _canon_cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    ops = all_ops()
    keys = args.keys or sorted(ops)

    spark = get_spark(master=args.master, app_name="oracle_check")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(args.sf, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    n_pass = n_fail = n_weak = 0
    for key in keys:
        spec = ops[key]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            # Registry lint: the driver harness canonicalizes via pandas
            # sort_values, which cannot hash numpy arrays — registered
            # queries must never emit array/map/struct-typed columns
            # (string-encode sets instead; see graph_nodes round-1 FAIL).
            bad = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad:
                print(f"FAIL {key:24s} complex-typed columns {bad} (driver-unhashable)")
                n_fail += 1
                continue
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key:24s} spark error: {e}")
            n_fail += 1
            continue
        if spec.sql is None:
            print(f"weak {key:24s} rows={len(spdf)}  {time.time()-t0:.1f}s")
            n_weak += 1
            continue
        try:
            opdf = con.execute(spec.sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key:24s} duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(opdf)}")
        sc, oc = sorted(spdf.columns), sorted(opdf.columns)
        if sc != oc:
            problems.append(f"columns spark={sc} duckdb={oc}")
        if not problems:
            a, b = canon_rows(spdf), canon_rows(opdf)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL {key:24s} {'; '.join(problems)[:400]}")
            n_fail += 1
        else:
            print(f"PASS {key:24s} rows={len(spdf)}  {time.time()-t0:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
