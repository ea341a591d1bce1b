"""Sampling-bench lever sweep with a committed artifact (round-2 verdict
weak #5: the sweep table lived only in /tmp/sweep.log). Sweeps the batch
size around the shipping optimum plus the scan-unroll knob and writes
`docs/lever_sweep_r3.json`.

Run detached on the TPU (fresh batch sizes compile ~3-10 min each):
  nohup python -u scripts/lever_sweep.py > /tmp/lever_sweep.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEVERS = [
    ("batch_96", {"BENCH_BATCHES": "96"}),
    ("batch_128_shipping", {"BENCH_BATCHES": "128"}),
    ("batch_160", {"BENCH_BATCHES": "160"}),
    ("unroll_2_batch_128", {"BENCH_BATCHES": "128",
                            "REGENNET_SCAN_UNROLL": "2"}),
]


def main():
    results = {}
    for name, env in LEVERS:
        print(f"=== {name} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env={**os.environ, **env}, capture_output=True, text=True,
            cwd=REPO,
        )
        sys.stderr.write(proc.stderr[-1500:])
        lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not lines:
            print(f"{name}: FAILED rc={proc.returncode}", flush=True)
            results[name] = {"error": proc.returncode}
            continue
        results[name] = json.loads(lines[-1])
        print(f"{name}: {lines[-1]}", flush=True)
    out_path = os.path.join(REPO, "docs", "lever_sweep_r3.json")
    with open(out_path, "w") as f:
        json.dump({
            "config": "flagship sampling bench (1000-step DDPM chi3d 150f "
                      "bf16), one lever varied per row",
            "rows": results,
        }, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
