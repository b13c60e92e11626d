"""Run the test tiers and record the outcome -> TESTS_rNN.json.

Round-3 verdict item 1: test health must be a recorded artifact per round
(the reference runs its whole matrix in CI —
tooling/provekit-bench/tests/compiler.rs:27-85).  Tiers:

  default   pytest tests/ -q            (pytest.ini deselects `slow`)
  slow      pytest tests/ -q -m slow    (multi-minute proofs, 2^16 tables)

Usage: python scripts/record_tests.py <round> [tier ...]
  e.g. python scripts/record_tests.py 4 default slow
"""

import json
import pathlib
import re
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]


def run_tier(tier: str) -> dict:
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q", "--durations=25"]
    if tier == "slow":
        cmd += ["-m", "slow"]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    dt = time.time() - t0
    tail = "\n".join(proc.stdout.strip().splitlines()[-5:])
    counts = {}
    for k, v in re.findall(
            r"(\d+) (passed|failed|errors?|skipped|deselected)",
            proc.stdout):
        key = "errors" if v.startswith("error") else v
        counts[key] = counts.get(key, 0) + int(k)
    # per-test wall-clock budget hogs (pytest --durations block)
    slowest = [ln.strip() for ln in proc.stdout.splitlines()
               if re.match(r"\s*\d+(\.\d+)?s\s+(call|setup|teardown)\s", ln)]
    return {"tier": tier, "cmd": " ".join(cmd[2:]), "rc": proc.returncode,
            "seconds": round(dt, 1), "counts": counts,
            "slowest": slowest[:25], "tail": tail}


def main():
    rnd = int(sys.argv[1])
    tiers = sys.argv[2:] or ["default", "slow"]
    doc = {"round": rnd, "tiers": [run_tier(t) for t in tiers]}
    # pytest rc 5 = no tests collected for the tier's marker: record it,
    # but an empty tier is not a failure
    doc["green"] = all(t["rc"] in (0, 5) for t in doc["tiers"])
    out = ROOT / f"TESTS_r{rnd:02d}.json"
    out.write_text(json.dumps(doc, indent=1))
    print(json.dumps(doc, indent=1))
    print(f"wrote {out}")
    sys.exit(0 if doc["green"] else 1)


if __name__ == "__main__":
    main()
