"""In-process train batch-size sweep with the fused attention kernel ON.

The committed batch sweep (docs/PERF.md "Batch sweep (bf16, real sync,
2026-08-17)": 64 optimum, 128 -> 1923, 256 -> 1735 samples/s) predates the
fused train-attention kernel — its superlinear cost growth past batch 64
was attributed to the [B,4,T,T] attention score tensors, which the kernel
now keeps in VMEM. The sampling path also sustains 138 TF/s at batch 128
vs ~50 TF/s for the batch-64 train forward, so the optimum may have moved.

Methodology (CLAUDE.md): cross-process comparisons are drowned by relay
session spread, so every batch size is traced in THIS one process and the
variants are timed in round-robin blocks (64,96,128,192 | 64,96,... ), and
only within-run relative ordering is interpreted. Run solo, detached.

Writes docs/train_batch_sweep_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCHES = [int(b) for b in os.environ.get("SWEEP_BATCHES", "64,96,128,192").split(",")]
FRAMES = int(os.environ.get("SWEEP_FRAMES", "150"))
BLOCKS = int(os.environ.get("SWEEP_BLOCKS", "5"))
ITERS = int(os.environ.get("SWEEP_ITERS", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_step(batch):
    from bench import build_flagship_train  # the ONE flagship scaffold
    from regennet_tpu.train.training_loop import make_train_step

    env = build_flagship_train(batch, FRAMES, jnp.bfloat16)
    # fresh function object per trace — jit caches by identity
    raw = make_train_step(env["model"], env["sched"], env["cfg"],
                          env["optimizer"], env["rot2xyz"],
                          num_timesteps=1000)
    step = jax.jit(lambda s, b, r: raw(s, b, r))
    return step, env["state"], env["batch_dict"], env["rng"]


def sync(state):
    return float(jax.tree_util.tree_leaves(state["params"])[0].sum())


def main():
    log(f"devices: {jax.devices()}")
    variants = {}
    for batch in BATCHES:
        t0 = time.time()
        step, state, batch_dict, rng = build_step(batch)
        state, _ = step(state, batch_dict, rng)
        sync(state)
        log(f"[b{batch}] compile+first: {time.time() - t0:.1f}s")
        variants[batch] = (step, state, batch_dict, rng)

    times = {batch: [] for batch in BATCHES}
    for blk in range(BLOCKS):
        for batch in BATCHES:
            step, state, batch_dict, rng = variants[batch]
            t0 = time.time()
            for i in range(ITERS):
                state, _ = step(state, batch_dict,
                                jax.random.fold_in(rng, blk * ITERS + i))
            sync(state)
            dt = (time.time() - t0) / ITERS * 1e3
            times[batch].append(dt)
            variants[batch] = (step, state, batch_dict, rng)
            log(f"  block {blk} [b{batch}]: {dt:.2f} ms/step "
                f"({batch / dt * 1e3:.0f} samples/s)")

    import numpy as np

    out = {
        "frames": FRAMES, "blocks": BLOCKS, "iters": ITERS,
        "kernel": "REGENNET_PALLAS_ATTN_TRAIN default (on)",
        "ms_per_step": {str(b): times[b] for b in BATCHES},
        "median_ms": {str(b): float(np.median(times[b])) for b in BATCHES},
        "median_samples_per_sec": {
            str(b): float(b / np.median(times[b]) * 1e3) for b in BATCHES
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "train_batch_sweep_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
