"""Run every BASELINE.md benchmark config through bench.py and collect the
JSON results — `python scripts/bench_configs.py [out.json]`.

Configs (BASELINE.md "Benchmark configs"):
  1. flagship: unconstrained online CMDM, 1000-step DDPM, Chi3D SMPL-X 150f
  2. classifier-free guidance: NTU 60f, guidance 2.5
  3. fused on-device pose decode inside the sampling program
  4. respaced fast sampling (100/50 steps)
  5. end-to-end training throughput (full losses + on-device decode)

Run detached on the TPU (first run compiles several programs):
  nohup python -u scripts/bench_configs.py > /tmp/bench_configs.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_driver import run_bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("0_serving_latency_b1_ddim5", {"BENCH_BATCHES": "1",
                                    "BENCH_STEPS": "5"}),
    ("1_flagship_ddpm1000", {}),
    ("2_cfg_ntu60_g2.5", {"BENCH_GUIDANCE": "2.5", "BENCH_FRAMES": "60"}),
    ("3_fused_decode_ddpm1000", {"BENCH_DECODE": "1"}),
    ("4_respaced_100", {"BENCH_STEPS": "100"}),
    ("4_respaced_50", {"BENCH_STEPS": "50"}),
    # 5_training = the SHIPPED default train path (--steps_per_call 8,
    # bench default since round 4); 5b pins the single-step variant in the
    # same era for the A/B (docs/PERF.md, docs/spc_ab_inproc_r3.json)
    ("5_training", {"BENCH_MODE": "train", "BENCH_TRAIN_DTYPE": "bf16"}),
    ("5b_training_single_step", {"BENCH_MODE": "train",
                                 "BENCH_TRAIN_DTYPE": "bf16",
                                 "BENCH_STEPS_PER_CALL": "1"}),
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_CONFIGS.json"
    )
    results = {}
    for name, env in CONFIGS:
        print(f"=== {name} ===", flush=True)
        rec = run_bench(env)
        results[name] = rec if rec is not None else {"error": True}
        print(f"{name}: {json.dumps(results[name])}", flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}", flush=True)
    return results


if __name__ == "__main__":
    main()
