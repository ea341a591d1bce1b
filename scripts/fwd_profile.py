"""Denoiser-only forward/backward cost isolation on the real TPU.

train_profile_r3.json showed the batch-64 bf16 training step spends
~20 ms in fwd+bwd against an ~8 ms matmul floor. This script times the
CMDM denoiser ALONE (no losses, no decodes, no optimizer) at the
training shape to split that gap into its suspected parts:

  fwd_det_pallas    deterministic fwd, fused [B,T,D] Pallas attention
  fwd_det_xla       deterministic fwd, plain XLA attention
  fwd_train_xla     train-mode fwd (attention dropout + residual dropouts)
  bwd_det_xla       grad(mean(fwd)) deterministic, XLA attention
  bwd_train_xla     grad(mean(fwd)) train mode

(fwd_det_pallas has no grad variant: the kernel has no vjp yet — that is
the point of this measurement.)

Writes docs/fwd_profile_r3.json. Run detached on the TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROFILE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

BATCH = int(os.environ.get("PROFILE_BATCH", "64"))
FRAMES = int(os.environ.get("PROFILE_FRAMES", "150"))
ITERS = int(os.environ.get("PROFILE_ITERS", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_fn(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    log(f"  [{name}] compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.time() - t0) / ITERS
    log(f"  [{name}] {dt * 1e3:.2f} ms/iter")
    return dt * 1e3


def main():
    from bench import build_flagship_train  # the ONE flagship scaffold

    log(f"devices: {jax.devices()}")
    env = build_flagship_train(BATCH, FRAMES, jnp.bfloat16)
    model, params, rng = env["model"], env["params"], env["rng"]
    bd = env["batch_dict"]
    x, t, cond = bd["motion"], bd["t"], bd["cond"]

    def fwd_det(params):
        return model.apply({"params": params}, x, t, cond, train=False)

    def fwd_train(params):
        return model.apply(
            {"params": params}, x, t, cond, train=True,
            rngs={"dropout": jax.random.fold_in(rng, 2),
                  "cond_mask": jax.random.fold_in(rng, 3)},
        )

    results = {"batch": BATCH, "frames": FRAMES, "iters": ITERS,
               "variants_ms": {}}
    R = results["variants_ms"]

    def loss_det(params):
        return jnp.mean(fwd_det(params).astype(jnp.float32))

    def loss_train(params):
        return jnp.mean(fwd_train(params).astype(jnp.float32))

    def fresh(fn):
        # jax.jit caches traces by function identity — re-jitting the
        # same function object after an env-flag flip silently reuses
        # the old trace (measured: a "flag off" variant ran the cached
        # Pallas program). A new lambda per variant forces a retrace.
        return jax.jit(lambda p: fn(p))

    # env flags are read at TRACE time inside the model
    for name, flags, fn in [
        ("fwd_det_pallas", {"REGENNET_PALLAS_ATTN": "1"}, fwd_det),
        ("fwd_det_xla", {"REGENNET_PALLAS_ATTN": "0"}, fwd_det),
        ("fwd_train_xla", {"REGENNET_PALLAS_ATTN": "0"}, fwd_train),
        ("bwd_det_xla", {"REGENNET_PALLAS_ATTN": "0"},
         jax.grad(loss_det)),
        ("bwd_train_xla", {"REGENNET_PALLAS_ATTN": "0"},
         jax.grad(loss_train)),
        # the fused training kernel (in-kernel dropout + recompute bwd)
        ("fwd_train_pallas",
         {"REGENNET_PALLAS_ATTN": "1", "REGENNET_PALLAS_ATTN_TRAIN": "1"},
         fwd_train),
        ("bwd_train_pallas",
         {"REGENNET_PALLAS_ATTN": "1", "REGENNET_PALLAS_ATTN_TRAIN": "1"},
         jax.grad(loss_train)),
    ]:
        os.environ.update(flags)
        try:
            R[name] = time_fn(name, fresh(fn), params)
        except Exception as e:  # keep measuring the other variants
            log(f"  [{name}] FAILED: {type(e).__name__}: {str(e)[:300]}")
            R[name] = None
    for k in ("REGENNET_PALLAS_ATTN", "REGENNET_PALLAS_ATTN_TRAIN"):
        os.environ.pop(k, None)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "fwd_profile_r3.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
