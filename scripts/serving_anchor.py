"""Batch-1 serving-latency anchor (round-2 verdict item 9).

The serving row (BENCH_CONFIGS 0: batch-1, 5-step respaced sampling —
the reference's own eval protocol, `--timestep_respacing ddim5`) had no
baseline comparison: the H100 estimate is derived for batched throughput,
not dispatch-bound batch-1 latency.  This script produces a defensible
SAME-HARDWARE anchor on the host CPU:

  - reference side: the executing reference CMDM (flagship shape:
    8L/D512/ff1024/H4, SMPL-X 56x6 rot6d, 150 frames) under the reference
    SpacedDiffusion("ddim5") `p_sample_loop`, eager torch-cpu — exactly the
    eval-protocol sampler (reference: eval/a2m/stgcn_eval.py:38 hardcodes
    p_sample_loop; respacing comes from SpacedDiffusion, respace.py:73-87)
  - our side: the same-shaped Flax CMDM under the scan-fused
    `p_sample_loop` on a 5-step respaced schedule, jitted on the JAX CPU
    backend — same machine, same protocol.

Writes docs/serving_anchor_r3.json with both latencies and the ratio.
Run:  python scripts/serving_anchor.py   (CPU only; safe while the TPU
relay is busy.)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES, J, F = 150, 56, 6
D, FF, H, L = 512, 1024, 4, 8
REPS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_reference() -> float:
    import numpy as np
    import torch

    from tests.reference_harness import (
        import_reference_cmdm,
        load_reference,
        make_reference_diffusion,
    )

    torch.manual_seed(0)
    ref_cmdm = import_reference_cmdm()
    model = ref_cmdm.CMDM(
        modeltype="", njoints=J, nfeats=F, num_actions=8, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=D,
        ff_size=FF, num_layers=L, num_heads=H, dropout=0.1,
        num_frames=FRAMES, arch="online", cm_mode="concat",
        body_model="smplx", cond_mode="action", cond_mask_prob=0.1,
        dataset="chi3d",
    )
    model.eval()
    ns = load_reference()
    diffusion = make_reference_diffusion(ns, "cosine", 1000, "ddim5")

    rng = np.random.default_rng(0)
    y = {
        "cmotion": torch.from_numpy(
            rng.normal(size=(1, J, F, FRAMES)).astype(np.float32) * 0.3),
        "action": torch.zeros((1, 1), dtype=torch.long),
    }

    def once():
        with torch.no_grad():
            return diffusion.p_sample_loop(
                model, (1, J, F, FRAMES), clip_denoised=False,
                model_kwargs={"y": y}, progress=False,
            )

    once()  # warm caches / lazy allocs
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        once()
        times.append(time.perf_counter() - t0)
    log(f"reference torch-cpu: {[f'{t*1e3:.1f}' for t in times]} ms")
    return float(min(times))


def measure_ours() -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench
    import jax.numpy as jnp
    from regennet_tpu.diffusion import DiffusionConfig, make_schedule, sampling

    model_fn, shape, cond = bench.make_flagship(1, FRAMES, jnp.float32)
    sched = make_schedule("cosine", 1000, "ddim5")
    cfg = DiffusionConfig(model_mean_type="start_x")

    @jax.jit
    def run(rng):
        return sampling.p_sample_loop(
            sched, cfg, model_fn, shape, rng, cond, clip_denoised=False
        )

    key = jax.random.PRNGKey(0)
    float(run(key).mean())  # compile
    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(run(jax.random.fold_in(key, i)).mean())
        times.append(time.perf_counter() - t0)
    log(f"ours jax-cpu: {[f'{t*1e3:.1f}' for t in times]} ms")
    return float(min(times))


def main():
    ours = measure_ours()
    ref = measure_reference()
    out = {
        "config": "batch-1 5-step respaced p_sample_loop (the reference's "
                  "ddim5 eval protocol), flagship CMDM shape "
                  f"({L}L/D{D}/ff{FF}, smplx {J}x{F}, {FRAMES} frames), "
                  "SAME host CPU, min of 5 timed reps after warmup",
        "reference_torch_cpu_ms": round(ref * 1e3, 1),
        "ours_jax_cpu_ms": round(ours * 1e3, 1),
        "speedup_same_cpu": round(ref / ours, 2),
        "note": "same-hardware anchor for the serving row; the TPU number "
                "(BENCH_CONFIGS 0_serving_latency_b1_ddim5) is measured "
                "separately on the v5e",
    }
    path = os.path.join(REPO, "docs", "serving_anchor_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
