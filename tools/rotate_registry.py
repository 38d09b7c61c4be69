"""Compute the next round's driver-certification order.

The external driver's CORRECTNESS gate checks the FIRST 50 registry
entries per round. This tool reads every CORRECTNESS_r*.json ledger
plus the current `_DRIVER_ORDER` and prints the recommended order
for the NEXT round:

1. queries with NO driver row yet (never certified), in current
   relative order — these fill the front of the 50-slot window;
2. queries whose latest driver row was red (hash/rows/schema
   mismatch or err) — they need re-observation after a fix;
3. everything already driver-green, in current relative order.

Usage:
    python tools/rotate_registry.py            # report only
    python tools/rotate_registry.py --emit     # print the python list

The printed list is meant to replace `_DRIVER_ORDER` in queries.py
at the START of a round (never mid-round: the driver must observe
the same first-50 the round was built against).
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def load_ledger() -> tuple[dict[str, dict], dict[str, str]]:
    """Latest driver verdict per query across all rounds, plus the
    round file each latest verdict came from (for staleness sort)."""
    ledger: dict[str, dict] = {}
    seen_round: dict[str, str] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            ledger[name] = row  # later rounds win
            seen_round[name] = path
    return ledger, seen_round


def classify(row: dict | None) -> str:
    if row is None:
        return "never"
    if row.get("err"):
        return "red"
    if all(row.get(k) for k in ("rows_match", "schema_match", "hash_match")):
        return "green"
    return "red"


def main() -> None:
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    ledger, seen_round = load_ledger()
    order = list(REGISTRY)
    buckets = {"never": [], "red": [], "green": []}
    for name in order:
        buckets[classify(ledger.get(name))].append(name)
    # greens: STALEST certification first (last observed in the
    # oldest round), so the window's spare slots re-observe the
    # rows whose evidence is oldest; registry order breaks ties
    pos = {name: i for i, name in enumerate(order)}
    buckets["green"].sort(
        key=lambda n: (seen_round.get(n, ""), pos[n])
    )
    nxt = buckets["never"] + buckets["red"] + buckets["green"]

    n_window = min(50, len(nxt))
    print(
        f"registry={len(order)}  never-checked={len(buckets['never'])}  "
        f"red={len(buckets['red'])}  green={len(buckets['green'])}"
    )
    print(f"next window ({n_window} slots): {nxt[:n_window]}")
    remaining = len(buckets["never"]) + len(buckets["red"]) - n_window
    print(f"uncertified remaining AFTER next round: {max(0, remaining)}")
    if "--emit" in sys.argv:
        print("_DRIVER_ORDER = [")
        for name in nxt:
            print(f'    "{name}",')
        print("]")


if __name__ == "__main__":
    main()
