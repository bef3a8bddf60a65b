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
OUT_SAMPLED = os.path.join(
    REPO, "etl_manager_spark", "workloads", "driver_sampled.json"
)


def main() -> None:
    last_green: dict[str, int] = {}
    last_sampled: dict[str, int] = {}
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
            if not isinstance(row, dict):
                continue
            last_sampled[name] = max(last_sampled.get(name, 0), rnd)
            if row.get("hash_match") is True:
                last_green[name] = max(last_green.get(name, 0), rnd)
    with open(OUT, "w") as f:
        json.dump(dict(sorted(last_green.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    with open(OUT_SAMPLED, "w") as f:
        json.dump(dict(sorted(last_sampled.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(last_green)} green queries")
    print(f"wrote {OUT_SAMPLED}: {len(last_sampled)} ever-sampled queries")


if __name__ == "__main__":
    main()
