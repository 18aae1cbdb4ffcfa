#!/usr/bin/env python
"""Merge two BENCH/scaling.json ladders (same code) into one report — used
when levels or working sets are measured in separate ladder invocations
(e.g. a median-of-3 {2,8,32} ladder plus a {1,4} pair, or a 400k ladder
plus a 1M ladder) — then recompute every N → 4N pair and rewrite
BENCH/BASELINE.md.

Ladders over the SAME corpus (matching convs/turns) merge their levels;
a ladder over a different corpus is appended as an additional working set.

    python tools/merge_scaling.py base.json extra.json [--runs-note 3]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _as_sets(report: dict) -> list[dict]:
    if "sets" in report:
        return report["sets"]
    return [
        {
            "convs": report["convs"],
            "turns": report["turns"],
            "levels": report["levels"],
            "pairs": report.get("pairs", []),
        }
    ]


def _recompute_pairs(levels: dict[int, dict]) -> list[dict]:
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
    return pairs


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

    sets = _as_sets(base)
    for add in _as_sets(extra):
        match = next((s for s in sets if s["convs"] == add["convs"]), None)
        if match is not None and match["turns"] != add["turns"]:
            raise SystemExit(
                "same convs but different turns — different corpus, refusing"
            )
        if match is None:
            sets.append(add)
        else:
            lv = {int(k): v for k, v in match["levels"].items()}
            lv.update({int(k): v for k, v in add["levels"].items()})
            match["levels"] = {str(k): v for k, v in sorted(lv.items())}
    for s in sets:
        s["pairs"] = _recompute_pairs(
            {int(k): v for k, v in s["levels"].items()}
        )

    report = {
        "runs": args.runs_note or base.get("runs", 1),
        "sets": sorted(sets, key=lambda s: s["convs"]),
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
    rs.write_report(report)
    print(json.dumps([(s["convs"], s["pairs"]) for s in report["sets"]]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
