"""Bench freshness + regression canary (VERDICT r11 what's-wrong #3).

Round 11 shipped a 5x plan regression because the last bench_last.json
refresh (06:08) predated the regressing commit (09:37) — the builder
ended the round believing a 3.5 h-stale number. This canary makes that
failure mode a hard error at round-check time:

1. FRESHNESS — bench_last.json must be newer than the last commit that
   touched plan-affecting source (the package, __spark_entry__.py, or
   bench.py). Doc/test-only commits don't invalidate a bench.
2. REGRESSION — every query whose previous-round BENCH_r*.json warm time
   exceeded 1 s must come in under 1.5x that time in bench_last.json.
   (Sub-second queries jitter with JIT/host load; multi-second ones
   don't regress 1.5x without a plan defect.)

Exit 0 = fresh and no regression; exit 1 otherwise, with the offending
queries printed. Run from anywhere; paths resolve relative to the repo.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOURCE_PATHS = ["fund_data_etl_pipeline_spark", "__spark_entry__.py", "bench.py"]
ABS_FLOOR_SEC = 1.0
REGRESSION_RATIO = 1.5


def last_source_commit_epoch() -> int | None:
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", *SOURCE_PATHS],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        return int(out) if out else None
    except (subprocess.CalledProcessError, ValueError, OSError):
        return None


def latest_round_bench() -> tuple[str, dict] | None:
    paths = glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    best: tuple[int, str] | None = None
    for p in paths:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            r = int(m.group(1))
            if best is None or r > best[0]:
                best = (r, p)
    if best is None:
        return None
    with open(best[1]) as fh:
        raw = json.load(fh)
    # driver files wrap the payload under "parsed" in some rounds
    payload = raw.get("parsed", raw) if isinstance(raw, dict) else raw
    if not isinstance(payload, dict) or "queries" not in payload:
        return None
    return best[1], payload


def main() -> int:
    bench_path = os.path.join(REPO, "bench_last.json")
    if not os.path.exists(bench_path):
        print("CANARY FAIL: bench_last.json missing — run bench.py")
        return 1
    bench_mtime = int(os.path.getmtime(bench_path))

    src_epoch = last_source_commit_epoch()
    # uncommitted source edits are newer than any commit — check those too
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", *SOURCE_PATHS],
        cwd=REPO,
        capture_output=True,
        text=True,
    ).stdout.strip()
    stale_reasons = []
    if src_epoch is not None and bench_mtime < src_epoch:
        stale_reasons.append(
            f"bench_last.json (mtime {bench_mtime}) predates the last "
            f"source commit ({src_epoch})"
        )
    if dirty:
        newest_dirty = 0
        for line in dirty.splitlines():
            p = os.path.join(REPO, line[3:].split(" -> ")[-1])
            if os.path.exists(p):
                newest_dirty = max(newest_dirty, int(os.path.getmtime(p)))
        if newest_dirty > bench_mtime:
            stale_reasons.append(
                "uncommitted source edits are newer than bench_last.json"
            )
    if stale_reasons:
        for r in stale_reasons:
            print(f"CANARY FAIL (freshness): {r}")
        return 1

    with open(bench_path) as fh:
        current = json.load(fh)
    cur_q = current.get("queries", {})

    prev = latest_round_bench()
    if prev is None:
        print("CANARY: no prior BENCH_r*.json with queries — freshness OK, "
              "regression check skipped")
        return 0
    prev_path, prev_payload = prev
    prev_q = prev_payload.get("queries", {})

    regressions = []
    for name, prev_t in prev_q.items():
        if not isinstance(prev_t, (int, float)) or prev_t <= ABS_FLOOR_SEC:
            continue
        cur_t = cur_q.get(name)
        if isinstance(cur_t, (int, float)) and cur_t > prev_t * REGRESSION_RATIO:
            regressions.append((name, prev_t, cur_t))
    if regressions:
        print(f"CANARY FAIL (regression vs {os.path.basename(prev_path)}):")
        for name, p, c in sorted(regressions, key=lambda x: -x[2] / x[1]):
            print(f"  {name}: {p:.2f}s -> {c:.2f}s ({c / p:.2f}x)")
        return 1
    print(
        f"CANARY OK: bench fresh, no >1s query regressed >"
        f"{REGRESSION_RATIO}x vs {os.path.basename(prev_path)} "
        f"({len(prev_q)} prior queries)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
