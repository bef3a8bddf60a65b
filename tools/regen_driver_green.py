"""Regenerate the driver-green ledger from the actual CORRECTNESS_r*.json
files (VERDICT r3 ask #3: the green set must be computed, not hand-kept).

A query is "green" iff some round's driver row has hash_match == True
(the full value-level check). The ledger records the LAST round that
confirmed it, so the registry can re-verify the stalest entries first
once all never-green queries are covered.

Run from the repo root after each round:
    python tools/regen_driver_green.py
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "etl_manager_spark", "workloads", "driver_green.json")


def main() -> None:
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                last_green[name] = max(last_green.get(name, 0), rnd)
    with open(OUT, "w") as f:
        json.dump(dict(sorted(last_green.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(last_green)} green queries")


if __name__ == "__main__":
    main()
