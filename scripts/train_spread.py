"""Pin the training-bench run-to-run spread (round-2 verdict weak #4):
run the training bench N times as separate processes (the persistent
compile cache makes runs 2..N cheap) and record min/median/max in
`docs/train_spread_r3.json`. docs/PERF.md's headline quotes the median.

Run detached on the TPU:
  nohup python -u scripts/train_spread.py > /tmp/train_spread.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPREAD_RUNS", "5"))


def main():
    vals = []
    for i in range(N):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env={**os.environ, "BENCH_MODE": "train",
                 "BENCH_TRAIN_DTYPE": "bf16", "BENCH_BATCHES": "64"},
            capture_output=True, text=True, cwd=REPO,
        )
        sys.stderr.write(proc.stderr[-1500:])
        lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not lines:
            print(f"run {i}: FAILED rc={proc.returncode}", flush=True)
            continue
        rec = json.loads(lines[-1])
        vals.append(float(rec["value"]))
        print(f"run {i}: {rec['value']} {rec['unit']}", flush=True)
    if not vals:
        sys.exit(1)
    arr = np.asarray(vals)
    out = {
        "config": "training bench, batch 64, bf16, full losses + on-device "
                  "decode, chi3d 150f (BENCH_MODE=train)",
        "runs": vals,
        "min": float(arr.min()),
        "median": float(np.median(arr)),
        "max": float(arr.max()),
        "unit": "samples/s/chip",
    }
    out_path = os.path.join(REPO, "docs", "train_spread_r3.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
