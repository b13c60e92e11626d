"""Run bench.py across the full BASELINE workload matrix -> BENCH_MATRIX JSON.

BASELINE.md's measurement protocol names poseidon-rounds, sha256, p256 and
the passport circuits as targets (round-3 verdict item 4: only poseidon
numbers were ever recorded).  Each workload runs in its own subprocess so
XLA executable accumulation cannot poison later runs.

Usage: python scripts/bench_matrix.py [out.json] [workload ...]
"""

import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
DEFAULT = ["poseidon", "sha256", "p256", "passport"]


def run_one(kind: str) -> dict:
    env = dict(os.environ, BENCH_CIRCUIT=kind)
    try:
        proc = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                              env=env, capture_output=True, text=True,
                              timeout=int(os.environ.get(
                                  "BENCH_TIMEOUT", 3600)))
    except subprocess.TimeoutExpired as e:
        return {"workload": kind, "error": "timeout",
                "tail": ((e.stdout or b"").decode("utf-8", "replace")
                         + (e.stderr or b"").decode("utf-8", "replace"))[-500:]}
    if proc.returncode == 0:
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    return {"workload": kind, "error": proc.returncode,
            "tail": (proc.stdout + proc.stderr)[-500:]}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    kinds = sys.argv[2:] or DEFAULT
    rows = []
    for kind in kinds:
        row = run_one(kind)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if out_path:  # flush after every workload: a later hang loses nothing
            pathlib.Path(out_path).write_text(json.dumps(
                {"workloads": rows}, indent=1))
    if out_path:
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
