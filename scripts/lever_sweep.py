"""Sampling-bench lever sweep with a committed artifact (round-2 verdict
weak #5: the sweep table lived only in /tmp/sweep.log). Sweeps the batch
size around the shipping optimum plus the scan-unroll knob and writes
`docs/lever_sweep_r3.json`.

Run detached on the TPU (fresh batch sizes compile ~3-10 min each):
  nohup python -u scripts/lever_sweep.py > /tmp/lever_sweep.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_driver import run_bench, write_artifact  # noqa: E402

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
        rec = run_bench(env, tail_stderr=1500)
        results[name] = rec if rec is not None else {"error": True}
        print(f"{name}: {results[name]}", flush=True)
    write_artifact("lever_sweep_r3.json", {
        "config": "flagship sampling bench (1000-step DDPM chi3d 150f "
                  "bf16), one lever varied per row",
        "rows": results,
    })


if __name__ == "__main__":
    main()
