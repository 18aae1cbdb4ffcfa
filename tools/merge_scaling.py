#!/usr/bin/env python
"""Merge two BENCH/scaling.json ladders (same corpus, same code) into one
report — used when levels are measured in separate ladder invocations (e.g.
a median-of-3 {2,8,32} ladder plus a {1,4} pair) — then recompute every
N → 4N pair and rewrite BENCH/BASELINE.md.

    python tools/merge_scaling.py base.json extra.json [--runs-note 3]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("extra")
    ap.add_argument("--runs-note", type=int, default=None,
                    help="value for the report's 'median of N' line")
    args = ap.parse_args()

    with open(args.base) as f:
        base = json.load(f)
    with open(args.extra) as f:
        extra = json.load(f)
    if base["convs"] != extra["convs"] or base["turns"] != extra["turns"]:
        raise SystemExit("ladders ran different corpora — refusing to merge")

    levels = {int(k): v for k, v in base["levels"].items()}
    levels.update({int(k): v for k, v in extra["levels"].items()})
    pairs = []
    for lo in sorted(levels):
        hi = lo * 4
        if hi in levels:
            speedup = levels[lo]["wall_s"] / levels[hi]["wall_s"]
            pairs.append({
                "low": lo,
                "high": hi,
                "speedup": round(speedup, 3),
                "efficiency": round(speedup / 4, 3),
                "gate": speedup / 4 >= 0.8,
            })
    report = {
        "convs": base["convs"],
        "turns": base["turns"],
        "runs": args.runs_note or base.get("runs", 1),
        "levels": {str(k): v for k, v in sorted(levels.items())},
        "pairs": pairs,
    }
    out = os.path.join(ROOT, "BENCH", "scaling.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)

    spec = importlib.util.spec_from_file_location(
        "run_scaling",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "run_scaling.py"),
    )
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)
    rs.ROOT = ROOT  # honor a monkeypatched output root (tests)
    rs.write_report(report, report["runs"])
    print(json.dumps(pairs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
