"""Bench freshness + regression canary (VERDICT r11 what's-wrong #3,
extended r13 per VERDICT r12 stretch #8).

Round 11 shipped a 5x plan regression because the last bench_last.json
refresh (06:08) predated the regressing commit (09:37) — the builder
ended the round believing a 3.5 h-stale number. This canary makes that
failure mode a hard error at round-check time:

1. FRESHNESS — bench_last.json must be newer than the last commit that
   touched plan-affecting source (the package, __spark_entry__.py, or
   bench.py). Doc/test-only commits don't invalidate a bench.
2. WARM REGRESSION — every query whose previous-round BENCH_r*.json warm
   time exceeded 1 s must come in under 1.5x that time in
   bench_last.json. (Sub-second queries jitter with JIT/host load;
   multi-second ones don't regress 1.5x without a plan defect.)
3. COLD REGRESSION (r13) — per-query COLD numbers compared against the
   most recent PRIOR bench_history.jsonl entry (bench.py appends the
   full payload there; the slim BENCH_r*.json drops cold_queries). Cold
   passes carry first-touch/JIT noise measured at ~3x on identical code,
   so the gate is deliberately loose: >2 s cold queries failing only
   past 3x. This catches the class "a once-per-corpus index build leaked
   into the steady path" without tripping on host luck.
4. FIRST APPEARANCE (r13) — a query present in bench_last.json with no
   prior-round number is RECORDED (printed as a NOTE), not failed: new
   registrations ship visibly unguarded for exactly one round.

CANARY_EXEMPT lists queries excluded from the regression gates:
dedup_semantic is the labeled O(N^2) exhaustive baseline whose
by-design-quadratic runtime on a noisy shared host produced false
alarms in r11 AND r12 (both adjudicated host noise); its linear
production twin dedup_semantic_lsh IS guarded (VERDICT r12 #6).

5. HOST CALIBRATION (r13) — bench.py times a fixed single-thread CPU
   workload (calib_sec) at suite start+end; when both the current and
   prior bench carry it, the regression gates scale by the clamped
   ratio (see host_factor). A finding excused only by calibration is
   still printed as a NOTE. Rationale: r11/r12/r13 each spent judge and
   builder time adjudicating 2-30x "regressions" on untouched plans
   that were shared-host CPU steal; the calibration makes that
   adjudication mechanical and leaves real plan regressions (which
   inflate ALONE, without the calibration moving) fully guarded.

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
COLD_FLOOR_SEC = 2.0
COLD_RATIO = 3.0
CANARY_EXEMPT = {"dedup_semantic"}


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


def prior_history_entry(current_ts: float | None) -> dict | None:
    """The newest bench_history.jsonl entry strictly OLDER than the
    current bench (by its ts field) — i.e. the previous full payload,
    with cold_queries. None when no prior entry exists."""
    path = os.path.join(REPO, "bench_history.jsonl")
    if not os.path.exists(path):
        return None
    prior = None
    try:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    entry = json.loads(line)
                except ValueError:
                    continue
                ts = entry.get("ts")
                if not isinstance(ts, (int, float)):
                    continue
                if current_ts is not None and ts >= current_ts:
                    continue
                if prior is None or ts > prior.get("ts", 0):
                    prior = entry
    except OSError:
        return None
    return prior


def host_factor(cur_calib, prev_calib) -> float:
    """How much slower the current host is vs the prior bench's host,
    per the fixed single-thread CPU calibration bench.py records as
    calib_sec (r13: three consecutive rounds produced false regression
    alarms — 2-30x on provably untouched plans — that each adjudicated
    as shared-host CPU steal; during the r13 episode the calibration
    workload itself ran 2-4x slow, tracking the query inflation).
    Forgive-only: clamped to [1, 4] — a FASTER current host never
    tightens the gate (that would just re-create the false-alarm class
    in the other direction), and >4x host slowdown stops excusing
    anything (at that point the number is meaningless and a human
    should look). 1.0 when either side lacks calibration."""
    if (
        isinstance(cur_calib, (int, float))
        and isinstance(prev_calib, (int, float))
        and cur_calib > 0
        and prev_calib > 0
    ):
        return min(max(cur_calib / prev_calib, 1.0), 4.0)
    return 1.0


def evaluate(
    cur_warm: dict,
    cur_cold: dict,
    prev_warm: dict,
    prev_cold: dict | None,
    hf: float = 1.0,
) -> tuple[list[str], list[str]]:
    """Pure regression/first-appearance evaluation: returns
    (failures, notes). Separated from I/O so the unit test can drive
    both the new-query and cold-regression cases (VERDICT r12 #8).
    ``hf`` (host_factor) scales the allowed ratio; anything that only
    survives because of it is still surfaced as a NOTE."""
    failures: list[str] = []
    notes: list[str] = []
    for name, prev_t in prev_warm.items():
        if name in CANARY_EXEMPT:
            continue
        if not isinstance(prev_t, (int, float)) or prev_t <= ABS_FLOOR_SEC:
            continue
        cur_t = cur_warm.get(name)
        if not isinstance(cur_t, (int, float)):
            continue
        if cur_t > prev_t * REGRESSION_RATIO * hf:
            failures.append(
                f"warm {name}: {prev_t:.2f}s -> {cur_t:.2f}s "
                f"({cur_t / prev_t:.2f}x, host-adjusted gate "
                f"{REGRESSION_RATIO * hf:.2f}x)"
            )
        elif cur_t > prev_t * REGRESSION_RATIO:
            notes.append(
                f"warm {name} {cur_t / prev_t:.2f}x excused by host "
                f"calibration ({hf:.2f}x slower host)"
            )
    if prev_cold:
        for name, prev_c in prev_cold.items():
            if name in CANARY_EXEMPT:
                continue
            if not isinstance(prev_c, (int, float)) or prev_c <= COLD_FLOOR_SEC:
                continue
            cur_c = cur_cold.get(name)
            if not isinstance(cur_c, (int, float)):
                continue
            if cur_c > prev_c * COLD_RATIO * hf:
                failures.append(
                    f"cold {name}: {prev_c:.2f}s -> {cur_c:.2f}s "
                    f"({cur_c / prev_c:.2f}x, host-adjusted gate "
                    f"{COLD_RATIO * hf:.2f}x)"
                )
            elif cur_c > prev_c * COLD_RATIO:
                notes.append(
                    f"cold {name} {cur_c / prev_c:.2f}x excused by host "
                    f"calibration ({hf:.2f}x slower host)"
                )
    for name in cur_warm:
        if name not in prev_warm:
            cold = cur_cold.get(name)
            cold_s = f" cold={cold:.2f}s" if isinstance(cold, (int, float)) else ""
            notes.append(
                f"new query (unguarded this round): {name} "
                f"warm={cur_warm[name]:.2f}s{cold_s}"
            )
    return failures, notes


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
    cur_warm = current.get("queries", {})
    cur_cold = current.get("cold_queries", {})

    prev = latest_round_bench()
    if prev is None:
        print("CANARY: no prior BENCH_r*.json with queries — freshness OK, "
              "regression check skipped")
        return 0
    prev_path, prev_payload = prev
    hist = prior_history_entry(current.get("ts", bench_mtime))
    prev_cold = hist.get("cold_queries") if hist else None

    hf = host_factor(current.get("calib_sec"), prev_payload.get("calib_sec"))
    if hf > 1.0:
        print(f"CANARY NOTE: host calibration {hf:.2f}x slower than the "
              f"prior bench's host — regression gates scaled accordingly")
    failures, notes = evaluate(
        cur_warm, cur_cold, prev_payload.get("queries", {}), prev_cold, hf=hf
    )
    for n in notes:
        print(f"CANARY NOTE: {n}")
    if failures:
        print(f"CANARY FAIL (regression vs {os.path.basename(prev_path)}"
              f"{' + history' if prev_cold else ''}):")
        for f in failures:
            print(f"  {f}")
        return 1
    print(
        f"CANARY OK: bench fresh, no guarded query regressed "
        f"(warm >{REGRESSION_RATIO}x vs {os.path.basename(prev_path)}, "
        f"cold >{COLD_RATIO}x vs history"
        f"{', ' + str(len(notes)) + ' new' if notes else ''})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
