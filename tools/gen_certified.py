"""(Re)generate kgforge/certified.json — run ONLY right after a driver
CORRECTNESS file lands, on the exact code the driver checked.

For every registered key, finds the newest CORRECTNESS_r*.json with a green
row (hash_match, or the weak rows-only form) and records that round plus the
key's CURRENT source fingerprint (kgforge.certify). The past-window lint in
tests/test_registry.py then fails whenever code a past-window key depends on
drifts from its certified fingerprint — forcing a window rotation instead of
silent staleness (VERDICT r03 #10).

Caveat this tool cannot check: the fingerprint recorded must correspond to
the code the driver actually ran. Run this at round open (on the unmodified
previous round's HEAD) or immediately after reverting, never mid-edit.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kgforge import certify, registry  # noqa: E402


def green(row: dict) -> bool:
    return row.get("hash_match") is True or (
        row.get("err") == "no_oracle" and row.get("spark_rows", 0) >= 0
    )


def main() -> None:
    repo = os.path.join(os.path.dirname(__file__), "..")
    rounds: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"(r\d+)\.json$", path)
        with open(path) as f:
            rounds[m.group(1)] = json.load(f)

    fps = certify.current_fingerprints()
    out: dict[str, dict] = {}
    for key in registry.all_ops():
        newest = None
        for rnd in sorted(rounds, reverse=True):
            row = rounds[rnd].get(key)
            if row is not None and green(row):
                newest = rnd
                break
        if newest is None:
            continue  # never driver-certified: must stay in-window
        out[key] = {"round": newest, "fp": fps[key]}

    with open(certify.CERTIFIED_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {certify.CERTIFIED_PATH}: {len(out)} certified keys")
    uncert = [k for k in registry.all_ops() if k not in out]
    if uncert:
        print(f"never driver-certified (must be in-window): {uncert}")


if __name__ == "__main__":
    main()
