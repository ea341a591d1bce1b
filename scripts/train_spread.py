"""Pin the training-bench run-to-run spread (round-2 verdict weak #4):
run the training bench N times as separate processes (the persistent
compile cache makes runs 2..N cheap) and record min/median/max in
`docs/train_spread_r3.json`. docs/PERF.md's headline quotes the median.

Run detached on the TPU:
  nohup python -u scripts/train_spread.py > /tmp/train_spread.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_driver import run_bench, write_artifact  # noqa: E402

N = int(os.environ.get("SPREAD_RUNS", "5"))


def main():
    vals = []
    for i in range(N):
        rec = run_bench({"BENCH_MODE": "train", "BENCH_TRAIN_DTYPE": "bf16",
                         "BENCH_BATCHES": "64"}, tail_stderr=1500)
        if rec is None:
            print(f"run {i}: FAILED", flush=True)
            continue
        vals.append(float(rec["value"]))
        print(f"run {i}: {rec['value']} {rec['unit']}", flush=True)
    if not vals:
        sys.exit(1)
    arr = np.asarray(vals)
    write_artifact("train_spread_r3.json", {
        "config": "training bench, batch 64, bf16, full losses + on-device "
                  "decode, chi3d 150f (BENCH_MODE=train)",
        "runs": vals,
        "min": float(arr.min()),
        "median": float(np.median(arr)),
        "max": float(arr.max()),
        "unit": "samples/s/chip",
    })


if __name__ == "__main__":
    main()
