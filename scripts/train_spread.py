"""Pin THE training headline for the shipped default CLI path (round-4
verdict weak #4 consolidation): one era, one spread, best-default config.

Interleaves N runs of the DEFAULT train path (--steps_per_call 8, fused
train attention, bf16, swept-optimal batch 64) with N single-step control
runs in the SAME session, so the spc8-vs-spc1 ratio and the spread are
era-consistent (the relay drifts ~29% across multi-hour eras —
docs/train_spread_r3.json recorded both eras; CLAUDE.md). docs/PERF.md's
headline quotes the default path's median.

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
    runs = {"spc8_default": [], "spc1_control": []}
    for i in range(N):
        for tag, spc in (("spc8_default", "8"), ("spc1_control", "1")):
            rec = run_bench(
                {"BENCH_MODE": "train", "BENCH_TRAIN_DTYPE": "bf16",
                 "BENCH_BATCHES": "64", "BENCH_STEPS_PER_CALL": spc},
                tail_stderr=1500,
            )
            if rec is None:
                print(f"run {i} {tag}: FAILED", flush=True)
                continue
            runs[tag].append(float(rec["value"]))
            print(f"run {i} {tag}: {rec['value']} {rec['unit']}", flush=True)
    if not runs["spc8_default"]:
        sys.exit(1)

    def stats(vals):
        arr = np.asarray(vals)
        return {"runs": vals, "min": float(arr.min()),
                "median": float(np.median(arr)), "max": float(arr.max())}

    out = {
        "config": "training bench, batch 64 (swept optimum), bf16, full "
                  "losses + on-device decode, chi3d 150f, fused train "
                  "attention default-on; spc8 = the shipped CLI default "
                  "(--steps_per_call 8), spc1 = single-step control, "
                  "interleaved in ONE era",
        "unit": "samples/s/chip",
        "spc8_default": stats(runs["spc8_default"]),
    }
    if runs["spc1_control"]:
        out["spc1_control"] = stats(runs["spc1_control"])
        out["spc8_over_spc1_median"] = (
            out["spc8_default"]["median"] / out["spc1_control"]["median"]
        )
    write_artifact("train_spread_r5.json", out)


if __name__ == "__main__":
    main()
