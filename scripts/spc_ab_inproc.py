"""In-process A/B of --steps_per_call fused K-step blocks vs single steps.

Every single-step device call pays the relay's 31-34 ms dispatch floor
(docs/serving_anchor_r3.json) ON TOP of on-device work it can't hide;
`make_multi_train_step` scans K optimizer steps inside ONE call, paying it
once per K. This measures the delivered win with the committed in-process
interleaved methodology (CLAUDE.md): both variants traced in this one
process, timed in alternating blocks so each pair shares relay conditions.
Run solo, detached.

Writes docs/spc_ab_inproc_r3.json.
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
STEPS_PER_BLOCK = int(os.environ.get("AB_STEPS", "16"))  # must be divisible by every K
KS = [int(k) for k in os.environ.get("AB_KS", "1,4,8,16").split(",")]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build(k):
    from bench import build_flagship_train  # the ONE flagship scaffold
    from regennet_tpu.train.training_loop import (
        make_multi_train_step,
        make_train_step,
    )

    env = build_flagship_train(BATCH, FRAMES, jnp.bfloat16)
    raw = make_train_step(env["model"], env["sched"], env["cfg"],
                          env["optimizer"], env["rot2xyz"],
                          num_timesteps=1000)
    batch_dict = env["batch_dict"]
    if k == 1:
        # fresh function object per trace — jit caches by identity
        step = jax.jit(lambda s, b, r: raw(s, b, r))
    else:
        multi = make_multi_train_step(raw)
        step = jax.jit(lambda s, b, r: multi(s, b, r))
        batch_dict = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (k,) + x.shape), batch_dict
        )
    return step, env["state"], batch_dict, env["rng"]


def sync(state):
    return float(jax.tree_util.tree_leaves(state["params"])[0].sum())


def main():
    log(f"devices: {jax.devices()}")
    variants = {}
    for k in KS:
        assert STEPS_PER_BLOCK % k == 0, (k, STEPS_PER_BLOCK)
        t0 = time.time()
        step, state, batch_dict, rng = build(k)
        state, _ = step(state, batch_dict, rng)
        sync(state)
        log(f"[K={k}] compile+first: {time.time() - t0:.1f}s")
        variants[k] = (step, state, batch_dict, rng)

    times = {k: [] for k in KS}
    for b in range(BLOCKS):
        for k in KS:
            step, state, batch_dict, rng = variants[k]
            calls = STEPS_PER_BLOCK // k
            t0 = time.time()
            for i in range(calls):
                state, _ = step(state, batch_dict,
                                jax.random.fold_in(rng, b * calls + i))
            sync(state)
            dt = (time.time() - t0) / STEPS_PER_BLOCK * 1e3
            times[k].append(dt)
            variants[k] = (step, state, batch_dict, rng)
            log(f"  block {b} [K={k}]: {dt:.2f} ms/opt-step "
                f"({BATCH / dt * 1e3:.0f} samples/s)")

    import numpy as np

    out = {
        "batch": BATCH, "frames": FRAMES, "blocks": BLOCKS,
        "steps_per_block": STEPS_PER_BLOCK,
        "ms_per_opt_step": {str(k): v for k, v in times.items()},
        "median_ms": {str(k): float(np.median(v)) for k, v in times.items()},
        "median_samples_per_sec": {
            str(k): float(BATCH / np.median(v) * 1e3) for k, v in times.items()
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "spc_ab_inproc_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
