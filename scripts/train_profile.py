"""Training-step cost decomposition on the real TPU.

The flagship training step (BENCH_CONFIGS 5: batch 64 bf16, full losses,
on-device LBS decodes) runs ~27 ms/step while its fwd+bwd matmul floor at
the measured deliverable MXU rate is ~8 ms — this script measures where
the rest goes by timing ablated variants of the SAME jitted step:

  full        exact bench config (3 LBS decodes: target/output/cmotion)
  no_decode   lambda_body=0 -> need_xyz False, zero LBS decodes
  mse_only    all geometric lambdas 0 (pure masked rot-MSE)
  no_dropout  dropout=0, cond_mask_prob=0 (same losses as full)
  fwd_only    jitted loss_fn alone (no grad/opt) at the full config
  fwd_grad    value_and_grad only (no AdamW/EMA/metrics)
  opt_only    AdamW update + EMA + global norms on frozen grads

Derived splits (ms): decode = full - no_decode; backward = fwd_grad -
fwd_only; optimizer = opt_only (cross-check: full - fwd_grad).

Writes docs/train_profile_r3.json. Run detached (TPU compiles are
minutes each through the relay): nohup python -u scripts/train_profile.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROFILE_CPU") == "1":
    # JAX_PLATFORMS env is ignored here (axon sitecustomize) — see CLAUDE.md
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

BATCH = int(os.environ.get("PROFILE_BATCH", "64"))
FRAMES = int(os.environ.get("PROFILE_FRAMES", "150"))
DTYPE = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
    os.environ.get("PROFILE_DTYPE", "bf16")
]
ITERS = int(os.environ.get("PROFILE_ITERS", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build(**overrides):
    from bench import build_flagship_train  # the ONE flagship scaffold

    env = build_flagship_train(BATCH, FRAMES, DTYPE, **overrides)
    return (env["model"], env["sched"], env["cfg"], env["rot2xyz"],
            env["optimizer"], env["params"], env["batch_dict"], env["rng"])


def sync(tree):
    return float(jax.tree_util.tree_leaves(tree)[0].sum())


def time_fn(name, fn, *args):
    """Compile + warm, then median-free simple mean over ITERS (the train
    step is long enough that relay dispatch is <1% noise here)."""
    t0 = time.time()
    out = fn(*args)
    sync(out)
    log(f"  [{name}] compile+first: {time.time() - t0:.1f}s")
    t0 = time.time()
    for i in range(ITERS):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / ITERS
    log(f"  [{name}] {dt * 1e3:.2f} ms/iter")
    return dt


def full_step_variant(name, **kw):
    from regennet_tpu.train.training_loop import make_train_step

    model, sched, cfg, rot2xyz, optimizer, params, batch_dict, rng = build(**kw)
    state = dict(
        params=params, opt_state=optimizer.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(
        make_train_step(model, sched, cfg, optimizer, rot2xyz,
                        num_timesteps=1000),
    )

    def run(state, batch_dict, rng):
        s, _ = step(state, batch_dict, rng)
        return s["params"]

    return time_fn(name, run, state, batch_dict, rng)


def main():
    devs = jax.devices()
    log(f"devices: {devs}")
    results = {
        "batch": BATCH, "frames": FRAMES,
        "dtype": os.environ.get("PROFILE_DTYPE", "bf16"),
        "iters": ITERS, "variants_ms": {},
    }
    R = results["variants_ms"]

    R["full"] = full_step_variant("full") * 1e3
    R["no_decode"] = full_step_variant("no_decode", lambda_body=0.0) * 1e3
    R["mse_only"] = full_step_variant(
        "mse_only", lambda_vel=0.0, lambda_orient=0.0, lambda_body=0.0,
        lambda_transl=0.0,
    ) * 1e3
    R["no_dropout"] = full_step_variant(
        "no_dropout", dropout=0.0, cond_mask_prob=0.0
    ) * 1e3

    # forward-only and forward+grad at the full config
    from regennet_tpu.diffusion import losses as dl

    model, sched, cfg, rot2xyz, optimizer, params, batch_dict, rng = build()

    def loss_fn(params, batch, rng):
        drng, crng, nrng = jax.random.split(rng, 3)

        def model_fn(x, t, cond):
            return model.apply(
                {"params": params}, x, t, cond, train=True,
                rngs={"dropout": drng, "cond_mask": crng},
            )

        terms = dl.training_losses(
            sched, cfg, model_fn, batch["motion"], batch["t"], batch["cond"],
            nrng, rot2xyz_fn=rot2xyz,
        )
        return jnp.mean(terms["loss"] * batch["weights"])

    fwd = jax.jit(loss_fn)
    R["fwd_only"] = time_fn(
        "fwd_only", lambda p, b, r: fwd(p, b, r).reshape(1),
        params, batch_dict, rng,
    ) * 1e3

    grad_fn = jax.jit(jax.grad(loss_fn))
    R["fwd_grad"] = time_fn(
        "fwd_grad", grad_fn, params, batch_dict, rng
    ) * 1e3

    # optimizer-only: AdamW + EMA + the two global norms on frozen grads
    import optax

    opt_state = optimizer.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    def opt_only(params, opt_state, ema, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * 0.9999 + p * 1e-4, ema, params
        )
        gn = optax.global_norm(grads)
        pn = optax.global_norm(params)
        return params, opt_state, ema, gn + pn

    ema = jax.tree_util.tree_map(jnp.array, params)
    opt_jit = jax.jit(opt_only)
    R["opt_only"] = time_fn(
        "opt_only", lambda *a: opt_jit(*a)[0], params, opt_state, ema, grads
    ) * 1e3

    results["derived_ms"] = {
        "lbs_decodes_3x": R["full"] - R["no_decode"],
        "geometric_losses_total": R["full"] - R["mse_only"],
        "dropout_total": R["full"] - R["no_dropout"],
        "backward": R["fwd_grad"] - R["fwd_only"],
        "optimizer_ema_norms": R["opt_only"],
        "step_minus_fwd_grad": R["full"] - R["fwd_grad"],
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "train_profile_r3.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
