"""Hand-count of the flagship denoiser-forward matmul FLOPs vs the XLA
`cost_analysis()` figure bench.py uses — `python scripts/flops_handcount.py`
(CPU, no TPU needed).

Round-2 verdict flagged an internal contradiction in docs/PERF.md: the
width-sweep probe claimed the flagship forward "blends to ~94 TF/s" while
the MFU claim had the same program sustaining 138.5 TF/s. This script
settles which number is trustworthy by counting the matmul FLOPs of the
in-loop forward analytically from the architecture (no tracing), then
lowering the real forward on the CPU backend and comparing with
`Lowered.cost_analysis()['flops']` — the number bench.py multiplies by
step count to report MFU.

Flagship config (bench.py make_flagship): B=128, T=150 frames, SMPL-X
56 joints x 6 rot6d feats, 8 online decoder layers, D=512, ff=1024, H=4,
cm_mode=concat (input fuse folded at prepare time), single-token
cross-attention fast path (out_proj(v_proj(memory)) — no q/k/score work;
models/transformer.py:105-116).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T = 128, 150
J, F = 56, 6          # SMPL-X joints (incl. translation row) x rot6d
D, FF, H, L = 512, 1024, 4, 8
HD = D // H


def mm(m, k, n):
    """FLOPs of an [m,k]x[k,n] matmul, counting multiply+add separately
    (XLA HloCostAnalysis counts a dot as 2*m*k*n)."""
    return 2 * m * k * n


def hand_count() -> dict:
    rows = B * T  # token count per forward
    c = {}
    # Input process: cm_mode=concat folds the x-half embed and the fuse
    # matmul into one [J*F, D] matmul at prepare time; the cmotion half is
    # loop-invariant and hoisted out of the sampling scan entirely
    # (models/cmdm.py prepare_cond; docs/PERF.md "input_process fold").
    c["input_fuse_x_half"] = mm(rows, J * F, D)
    # Timestep embedder: sinusoidal PE -> Dense(D) -> silu -> Dense(D), per
    # batch element per step (B rows, not B*T).
    c["timestep_mlp"] = mm(B, D, D) * 2
    per_layer = {
        "self_qkv": 3 * mm(rows, D, D),
        "self_scores": 2 * B * H * T * T * HD,  # QK^T
        "self_av": 2 * B * H * T * T * HD,      # weights @ V
        "self_out": mm(rows, D, D),
        # single-token cross-attention fast path: v_proj + out_proj on the
        # 1-token memory only (B rows); q/k projections are dead code
        # eliminated by XLA (transformer.py:112-113)
        "cross_fast_path": 2 * mm(B, D, D),
        "ff": mm(rows, D, FF) + mm(rows, FF, D),
    }
    c["per_layer_total"] = sum(per_layer.values())
    c["all_layers"] = L * c["per_layer_total"]
    c["output_process"] = mm(rows, D, J * F)
    c["total_matmul"] = (
        c["input_fuse_x_half"] + c["timestep_mlp"] + c["all_layers"]
        + c["output_process"]
    )
    c["per_layer_detail"] = per_layer
    return c


def xla_count() -> float:
    """Lower the real flagship forward on CPU and read cost_analysis flops
    (exactly what bench.py's _flops_probe does)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    model_fn, shape, cond = bench.make_flagship(
        B, T, jnp.bfloat16, 1.0, init_batch=1
    )
    prep = model_fn.prepare(cond)
    x_s = jax.ShapeDtypeStruct(shape, jnp.float32)
    t_s = jax.ShapeDtypeStruct((B,), jnp.int32)
    low = jax.jit(lambda x, t: model_fn(x, t, prep)).lower(x_s, t_s)
    return float((low.cost_analysis() or {}).get("flops", 0.0))


def main():
    c = hand_count()
    print("hand count (matmul-only, GFLOP):", file=sys.stderr)
    for k, v in c["per_layer_detail"].items():
        print(f"  per-layer {k:16s}: {v / 1e9:8.3f}", file=sys.stderr)
    for k in ("input_fuse_x_half", "timestep_mlp", "per_layer_total",
              "all_layers", "output_process", "total_matmul"):
        print(f"  {k:20s}: {c[k] / 1e9:8.3f}", file=sys.stderr)
    xla = xla_count()
    ratio = xla / c["total_matmul"]
    print(f"XLA cost_analysis (incl. elementwise): {xla / 1e9:.3f} GFLOP",
          file=sys.stderr)
    print(f"ratio xla/hand = {ratio:.4f} "
          f"(>1 expected: cost_analysis also counts elementwise flops)",
          file=sys.stderr)
    print(json.dumps({
        "hand_matmul_gflop": c["total_matmul"] / 1e9,
        "xla_cost_analysis_gflop": xla / 1e9,
        "ratio": ratio,
    }))


if __name__ == "__main__":
    main()
