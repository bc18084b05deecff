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
import tempfile
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_lane(name: str, extra: list) -> dict:
    """Run one pytest lane; counts come from --junitxml (terminal-summary
    regexes proved unreliable — r4 recorded 'GREEN / 0 passed')."""
    t0 = time.time()
    with tempfile.NamedTemporaryFile(suffix=".xml", delete=False) as tf:
        junit = tf.name
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q",
             f"--junitxml={junit}", *extra],
            capture_output=True, text=True, cwd=REPO,
        )
        wall = time.time() - t0
        passed = failures = errors = skipped = None
        try:
            root = ET.parse(junit).getroot()
            suites = root.iter("testsuite")
            failures = errors = skipped = total = 0
            for s in suites:
                total += int(s.get("tests", 0))
                failures += int(s.get("failures", 0))
                errors += int(s.get("errors", 0))
                skipped += int(s.get("skipped", 0))
            passed = total - failures - errors - skipped
        except (ET.ParseError, OSError, ValueError):
            pass
    finally:
        try:
            os.unlink(junit)
        except OSError:
            pass
    out = proc.stdout + "\n" + proc.stderr
    summary = next(
        (ln.strip() for ln in reversed(out.strip().splitlines())
         if re.search(r"\d+ (passed|failed|error|deselected|skipped|warning)", ln)),
        "(no pytest summary line captured)",
    )
    if passed is None:
        # no junit report => we cannot prove anything about this lane
        return dict(name=name, ok=False, passed="UNKNOWN",
                    wall_s=round(wall, 1),
                    summary=f"UNKNOWN (junitxml missing) | {summary}")
    ok = proc.returncode == 0 and failures == 0 and errors == 0 and passed > 0
    return dict(name=name, ok=ok, passed=passed, wall_s=round(wall, 1),
                summary=f"{passed} passed, {skipped} skipped, "
                        f"{failures} failed, {errors} errors | {summary}")


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
