"""Registry-rotation helper for the next round.

The driver checks only the first ~50 of `plans.ordered_queries()` per
round, and the project invariant is: every query holds a green driver row
within the last TWO rounds. This tool reads the newest CORRECTNESS_r*.json
and prints, for the NEXT round:

- MUST-PRIORITIZE: registered queries with no row in the newest gate file
  (their green row ages out next round), plus any row that erred or
  mismatched (need a fresh proof);
- SAFE-DEPRIORITIZE: queries green in the newest file (eligible to fall
  past the cap next round), with the minimum count the DEPRIORITY list
  needs (registered - cap).

Edit plans/__init__.py PRIORITY/DEPRIORITY accordingly at round start —
and put any query whose CODE changes during the round back into PRIORITY.

Usage: python tools/suggest_rotation.py [--cap 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=50)
    args = ap.parse_args()

    from fund_data_etl_pipeline_spark import plans

    plans.load_all()
    registered = list(plans.QUERIES)

    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        print("no CORRECTNESS_r*.json found")
        return
    newest = files[-1]
    rows = json.load(open(newest))

    def green(v: dict) -> bool:
        return bool(
            v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match") is not False
            and not v.get("err")
        )

    unchecked = [n for n in registered if n not in rows]
    red = [n for n, v in rows.items() if not green(v)]
    greens = [n for n, v in rows.items() if green(v) and n in registered]

    print(f"newest gate: {newest} ({len(rows)} rows); "
          f"registered: {len(registered)}; cap: {args.cap}")
    print(f"\nMUST-PRIORITIZE ({len(unchecked)} unchecked + {len(red)} red):")
    for n in red:
        print(f"  {n}  [RED in {newest}]")
    for n in unchecked:
        print(f"  {n}")
    need_dep = max(0, len(registered) - args.cap)
    print(f"\nSAFE-DEPRIORITIZE candidates ({len(greens)} green; "
          f"DEPRIORITY needs >= {need_dep}):")
    for n in greens:
        print(f"  {n}")
    overflow = len(unchecked) + len(red) - args.cap
    if overflow > 0:
        print(
            f"\nWARNING: must-check set exceeds the cap by {overflow} — "
            "apply the round-5 exception policy: pick the overflow from "
            "names whose machinery is provably inside PRIORITY peers, "
            "document each with its covering peer in plans/__init__.py, "
            "and re-prove them with tools/check_correctness.py at "
            "sf0.001/0.01/0.1 before the driver sweep."
        )


if __name__ == "__main__":
    main()
