"""Run the test suite and distill the result into one committed JSON.

VERDICT r3 item 6: round-end "N green" was builder-asserted; the judge
could not confirm it without an ~80-minute re-run. This tool runs
pytest with its built-in junitxml output and writes a compact
machine-checkable artifact (pass/fail/error/skip counts, duration,
per-file breakdown, and the full nodeid list of anything non-passing)
so a committed ``TESTS_r{N}.json`` is verifiable evidence.

Usage:
  python tools/test_report.py [--out TESTS_r04.json] [pytest args...]

Defaults to ``tests/ -q``; extra args are passed through to pytest
(e.g. ``-k trainer`` for a scoped run — the artifact records the exact
argv so a scoped run can't masquerade as the full suite).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def summarize_junitxml(path: Path) -> dict:
    root = ET.parse(path).getroot()
    suites = root.iter("testsuite")
    total = failures = errors = skipped = 0
    duration = 0.0
    by_file: dict = {}
    non_passing = []
    failure_details: dict = {}
    for s in suites:
        total += int(s.get("tests", 0))
        failures += int(s.get("failures", 0))
        errors += int(s.get("errors", 0))
        skipped += int(s.get("skipped", 0))
        duration += float(s.get("time", 0.0))
        for case in s.iter("testcase"):
            parts = (case.get("classname", "") or "?").split(".")
            fname = next(
                (p for p in parts if p.startswith("test_")), parts[-1]
            )
            rec = by_file.setdefault(
                fname, {"tests": 0, "failed": 0, "skipped": 0, "time_s": 0.0}
            )
            rec["tests"] += 1
            rec["time_s"] = round(
                rec["time_s"] + float(case.get("time", 0.0)), 2
            )
            nodeid = f"{case.get('classname')}::{case.get('name')}"
            fail_el = case.find("failure")
            if fail_el is None:
                fail_el = case.find("error")
            if fail_el is not None:
                rec["failed"] += 1
                non_passing.append(nodeid)
                # Keep the assertion message + traceback tail so a
                # committed artifact is diagnosable without a re-run
                # (the junitxml itself is a tempfile and gets deleted).
                text = (fail_el.text or fail_el.get("message") or "").strip()
                failure_details[nodeid] = text[-4000:]
            elif case.find("skipped") is not None:
                rec["skipped"] += 1
                non_passing.append(f"SKIP {nodeid}")
    return {
        "tests": total,
        "passed": total - failures - errors - skipped,
        "failed": failures,
        "errors": errors,
        "skipped": skipped,
        "duration_s": round(duration, 1),
        "by_file": dict(sorted(by_file.items())),
        "non_passing": non_passing,
        **({"failure_details": failure_details} if failure_details else {}),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("pytest_args", nargs="*")
    args = ap.parse_args()

    pytest_args = args.pytest_args or ["tests/", "-q"]
    with tempfile.NamedTemporaryFile(suffix=".xml", delete=False) as f:
        xml_path = Path(f.name)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *pytest_args,
         f"--junitxml={xml_path}", "-p", "no:cacheprovider"],
        cwd=REPO,
    )
    report = {
        "argv": pytest_args,
        "returncode": proc.returncode,
        "wall_clock_s": round(time.time() - t0, 1),
        **summarize_junitxml(xml_path),
    }
    xml_path.unlink(missing_ok=True)
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        Path(args.out).write_text(out + "\n")
    return 0 if proc.returncode == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
