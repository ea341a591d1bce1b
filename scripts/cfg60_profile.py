"""Config-2 (CFG, NTU 60 frames) MFU-gap profile — round-4 verdict #3.

BENCH_CONFIGS round-3: config 2 ran at 60.2-60.4% MFU, 10 points below the
flagship's 70.3%, unexplained. This script decomposes the gap IN ONE
PROCESS (interleaved timings; fresh function objects per variant — the
relay's cross-process spread makes separate-process A/Bs uninterpretable
under ~15%, CLAUDE.md):

  flagship_fwd        B=128, T=150 plain forward           (the 70.3% anchor)
  t60_fwd             B=256, T=60 plain forward            (pure shape effect;
                      B=256 = the CFG fold's effective batch)
  t64_fwd             B=256, T=64 plain forward            (sublane-pad probe:
                      bf16 tiles are 16 rows — T=60 pads to 64 in the kernel)
  t60_fwd_xla         same, REGENNET_PALLAS_ATTN=0         (kernel engagement)
  t60_cfg             make_cfg_model_fn at B=128           (fold overhead:
                      concat/uncond-mask/combine on top of the 2B forward)
  t60_fwd_bb16        block_batch=16 override              (program-count probe)

Per-variant achieved TF/s from the analytic matmul FLOP count (validated
against XLA cost_analysis to 0.6% at the flagship shape,
scripts/flops_handcount.py) — MFU = TF/s / 197.

Writes docs/cfg60_profile_r4.json. Run detached on the TPU, solo.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROFILE_CPU") == "1":  # plumbing smoke-test mode
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_regennet")
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ITERS = int(os.environ.get("PROFILE_ITERS", "30"))
PEAK = 197e12


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build(batch, frames):
    from regennet_tpu.models.cmdm import CMDM

    model = CMDM(
        njoints=56, nfeats=6, num_actions=8, num_frames=frames,
        latent_dim=512, ff_size=1024, num_layers=8, num_heads=4,
        arch="online", cm_mode="concat", cond_mode="action",
        cond_mask_prob=0.1, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    shape = (batch, 56, 6, frames)
    x = (jax.random.normal(rng, shape) * 0.3).astype(jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32) + 500
    cond = {
        "cmotion": x * 0.5,
        "action": jnp.zeros((batch, 1), jnp.int32),
        "mask": jnp.ones((batch, 1, 1, frames), bool),
    }
    params = model.init(jax.random.PRNGKey(1), x, t, cond)["params"]
    return model, params, x, t, cond


def fwd_flops(batch, frames, D=512, H=4, FF=1024, L=8, J=56, F=6):
    """Analytic matmul FLOPs of one denoiser forward — the same hand
    count scripts/flops_handcount.py validated against XLA cost_analysis
    to 0.6% at the flagship shape (docs/PERF.md round-3 reconciliation).
    Analytic because client-side cost_analysis is unreliable on the axon
    backend (CLAUDE.md); matmul-only slightly UNDERcounts, so the MFU
    figures here are conservative and mutually comparable."""
    rows = batch * frames
    hd = D // H

    def mm(m, k, n):
        return 2 * m * k * n

    per_layer = (
        3 * mm(rows, D, D)                 # qkv
        + 4 * batch * H * frames * frames * hd  # QK^T + AV
        + mm(rows, D, D)                   # out proj
        + 2 * mm(batch, D, D)              # 1-token cross fast path
        + mm(rows, D, FF) + mm(rows, FF, D)
    )
    return (
        mm(rows, J * F, D) + 2 * mm(batch, D, D)
        + L * per_layer + mm(rows, D, J * F)
    )


def time_fn(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    log(f"  [{name}] compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    log(f"  [{name}] {dt * 1e3:.3f} ms")
    return dt


def main():
    log(f"devices: {jax.devices()}")
    results = {"iters": ITERS, "variants": {}}

    def record(name, dt, flops):
        tfs = flops / dt / 1e12
        results["variants"][name] = {
            "ms": dt * 1e3, "gflop": flops / 1e9,
            "tflops_per_s": tfs, "mfu_pct": 100 * tfs * 1e12 / PEAK,
        }
        log(f"  [{name}] {tfs:.1f} TF/s = {100 * tfs * 1e12 / PEAK:.1f}% MFU")

    from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn

    # every variant is timed the way the sampler pays it: ModelFn.prepare
    # (the loop-invariant conditioning hoist) runs ONCE outside the timed
    # region, the per-step model_fn inside it

    # --- flagship anchor: B=128, T=150 plain forward ---------------------
    model, params, x, t, cond = build(128, 150)
    mf = make_model_fn(model, params)
    condp = mf.prepare(cond)
    fwd = jax.jit(mf)
    dt = time_fn("flagship_fwd", fwd, x, t, condp)
    record("flagship_fwd", dt, fwd_flops(128, 150))

    # --- T=60 family (B=256 = CFG's folded batch) -------------------------
    for frames, tag in ((60, "t60_fwd"), (64, "t64_fwd")):
        model60, params60, x60, t60, cond60 = build(256, frames)
        mf60 = make_model_fn(model60, params60)
        cond60p = mf60.prepare(cond60)
        f = jax.jit(mf60)
        dt = time_fn(tag, f, x60, t60, cond60p)
        record(tag, dt, fwd_flops(256, frames))
        if frames == 60:
            keep = (model60, params60, x60, t60, cond60, cond60p)

    model60, params60, x60, t60, cond60, cond60p = keep

    # XLA-attention control (fresh function object per flag state: jit
    # caches by identity — a flipped env var does NOT invalidate a trace)
    os.environ["REGENNET_PALLAS_ATTN"] = "0"
    mf_xla = make_model_fn(model60, params60)
    f_xla = jax.jit(mf_xla)
    dt = time_fn("t60_fwd_xla", f_xla, x60, t60, cond60p)
    record("t60_fwd_xla", dt, fwd_flops(256, 60))
    os.environ.pop("REGENNET_PALLAS_ATTN", None)

    # block-batch override probe (bb=16: half the program count)
    os.environ["REGENNET_PALLAS_ATTN_BB"] = "16"
    mf_bb = make_model_fn(model60, params60)
    f_bb16 = jax.jit(mf_bb)
    dt = time_fn("t60_fwd_bb16", f_bb16, x60, t60, cond60p)
    record("t60_fwd_bb16", dt, fwd_flops(256, 60))
    os.environ.pop("REGENNET_PALLAS_ATTN_BB", None)

    # --- the CFG fold at B=128 (internally 2B=256) ------------------------
    xb, tb = x60[:128], t60[:128]
    condb = {k: (v[:128] if hasattr(v, "shape") and v.shape
                 and v.shape[0] == 256 else v) for k, v in cond60.items()}
    cfg_fn = make_cfg_model_fn(model60, params60, 2.5)
    condbp = cfg_fn.prepare(condb)
    f_cfg = jax.jit(cfg_fn)
    dt = time_fn("t60_cfg", f_cfg, xb, tb, condbp)
    record("t60_cfg", dt, fwd_flops(256, 60))  # folded 2B forward

    # --- analysis ---------------------------------------------------------
    v = results["variants"]
    results["analysis"] = {
        "shape_effect_pts": v["flagship_fwd"]["mfu_pct"] - v["t60_fwd"]["mfu_pct"],
        "sublane_pad_pts": v["t64_fwd"]["mfu_pct"] - v["t60_fwd"]["mfu_pct"],
        "kernel_vs_xla_pts": v["t60_fwd"]["mfu_pct"] - v["t60_fwd_xla"]["mfu_pct"],
        "bb16_vs_auto_pts": v["t60_fwd_bb16"]["mfu_pct"] - v["t60_fwd"]["mfu_pct"],
        "cfg_fold_pts": v["t60_fwd"]["mfu_pct"] - v["t60_cfg"]["mfu_pct"],
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "cfg60_profile_r4.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["analysis"], indent=1))
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
