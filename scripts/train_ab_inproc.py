"""In-process A/B of the fused train-attention kernel on the composed step.

Cross-process bench A/Bs of REGENNET_PALLAS_ATTN_TRAIN are drowned by the
relay's session spread (observed 1735-2313 samples/s for the SAME variant
across back-to-back processes). This script kills that variance: it traces
BOTH variants in ONE process (env flag flipped before each trace; fresh
function objects per CLAUDE.md's jit-identity rule), warms both, then times
them in interleaved blocks (ABAB...), so every pair of blocks sees the same
relay conditions. Run solo, detached.

Writes docs/train_ab_inproc_r3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("AB_BATCH", "64"))
FRAMES = int(os.environ.get("AB_FRAMES", "150"))
BLOCKS = int(os.environ.get("AB_BLOCKS", "5"))
ITERS = int(os.environ.get("AB_ITERS", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_step():
    from bench import build_flagship_train  # the ONE flagship scaffold
    from regennet_tpu.train.training_loop import make_train_step

    env = build_flagship_train(BATCH, FRAMES, jnp.bfloat16)
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
    for name, flag in [("kernel_on", "1"), ("kernel_off", "0")]:
        os.environ["REGENNET_PALLAS_ATTN_TRAIN"] = flag
        t0 = time.time()
        step, state, batch_dict, rng = build_step()
        state, _ = step(state, batch_dict, rng)
        sync(state)
        log(f"[{name}] compile+first: {time.time() - t0:.1f}s")
        variants[name] = (step, state, batch_dict, rng)

    times = {"kernel_on": [], "kernel_off": []}
    for b in range(BLOCKS):
        for name in ("kernel_on", "kernel_off"):
            step, state, batch_dict, rng = variants[name]
            t0 = time.time()
            for i in range(ITERS):
                state, _ = step(state, batch_dict,
                                jax.random.fold_in(rng, b * ITERS + i))
            sync(state)
            dt = (time.time() - t0) / ITERS * 1e3
            times[name].append(dt)
            variants[name] = (step, state, batch_dict, rng)
            log(f"  block {b} [{name}]: {dt:.2f} ms/step")

    import numpy as np

    out = {
        "batch": BATCH, "frames": FRAMES, "blocks": BLOCKS, "iters": ITERS,
        "ms_per_step": times,
        "median_ms": {k: float(np.median(v)) for k, v in times.items()},
        "per_block_delta_ms": [
            times["kernel_on"][i] - times["kernel_off"][i]
            for i in range(BLOCKS)
        ],
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "train_ab_inproc_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
