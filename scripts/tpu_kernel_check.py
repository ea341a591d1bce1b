"""On-TPU numerics validation of the fused attention kernels.

The pytest suite validates the kernels in CPU interpret mode, where the
dropout bits are substituted as a tensor input (the TPU per-core PRNG has
no CPU lowering). This script closes the remaining evidence gap by
checking the REAL Mosaic-compiled kernels on the TPU:

1. rate-0 exactness: train kernel == inference kernel == plain-XLA
   attention (same f32 numerics, tolerance covers TPU matmul rounding);
2. rate-0 gradients: custom_vjp recompute backward vs XLA autodiff of
   the reference attention;
3. seed determinism: same seed -> bit-identical output; different
   seed -> different output (the in-kernel PRNG stream is live);
4. keep-fraction statistics: with uniform attention (q=k=0) and
   one-hot-sum v probes, the measured keep fraction of the in-kernel
   Bernoulli mask matches 1-rate to binomial noise;
5. forward/backward adjoint consistency at rate>0: attention output is
   LINEAR in v with matrix Wd (the dropped weights), so
   <do, f(v+dv)-f(v)> must equal <dv, grad_v> up to default-precision
   matmul rounding (a wrong mask at rate .5 would diverge by ~50%);
6. EXACT fwd/bwd mask identity: with q=k=0 (uniform pre-dropout weight
   1/T, T a power of two, rate .5) every surviving weight is exactly
   1/T * 2 in f32, so one-hot probes of v (forward) and of the output
   cotangent (backward) extract the full dropout mask from each kernel
   with NO rounding — asserted bit-equal. This pins that the backward
   regenerates the identical in-kernel PRNG stream from (seed,
   program_id) that the forward drew.

Tolerances on 1/2/5 reflect that TPU matmuls run at DEFAULT (bf16-input)
precision in both the kernels and the XLA reference — deltas ~1e-2 on
O(1) values are matmul rounding, not mask defects (check 6 is the exact
one). The train-vs-inference kernel comparison IS exact (same program
structure): asserted at 0.

Writes docs/tpu_kernel_check_r3.json. Exits nonzero on any failure.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.ops.pallas_attention import (
    attention_reference,
    fused_attention_btd,
    fused_attention_btd_train,
)

# lane-aligned shape (TPU Mosaic: D and head_dim multiples of 128)
B, T, D, H = 4, 32, 256, 2
SEED = jnp.array([3, 9], jnp.int32)


def _ref_btd(q, k, v, causal=True):
    hd = D // H

    def to_bhtd(x):
        return x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    out = attention_reference(to_bhtd(q), to_bhtd(k), to_bhtd(v), causal)
    return out.transpose(0, 2, 1, 3).reshape(B, T, D)


def main():
    results = {"device": str(jax.devices()[0]), "shape": [B, T, D, H]}
    ok = True
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = [jax.random.normal(kk, (B, T, D), jnp.float32)
               for kk in keys[:3]]
    do = jax.random.normal(keys[3], (B, T, D), jnp.float32)

    # 1. rate-0 exactness (f32 softmax so all three paths share numerics)
    train0 = fused_attention_btd_train(
        q, k, v, num_heads=H, dropout_rate=0.0, seed=SEED, causal=True,
        softmax_f32=True,
    )
    inf = fused_attention_btd(q, k, v, num_heads=H, causal=True,
                              softmax_f32=True)
    ref = _ref_btd(q, k, v)
    d_ti = float(jnp.abs(train0 - inf).max())
    d_tr = float(jnp.abs(train0 - ref).max())
    results["rate0_fwd"] = {"train_vs_inference": d_ti, "tol_exact": 0.0,
                            "train_vs_xla_ref": d_tr, "tol_default_prec": 0.05}
    ok &= d_ti == 0.0 and d_tr <= 0.05

    # 2. rate-0 gradients vs XLA autodiff
    def loss_k(q, k, v):
        out = fused_attention_btd_train(
            q, k, v, num_heads=H, dropout_rate=0.0, seed=SEED, causal=True,
            softmax_f32=True,
        )
        return jnp.sum(out * do)

    def loss_r(q, k, v):
        return jnp.sum(_ref_btd(q, k, v) * do)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    gd = [float(jnp.abs(a - b).max()) for a, b in zip(gk, gr)]
    results["rate0_grads"] = {"max_abs_delta_qkv": gd,
                              "tol_default_prec": 0.05}
    ok &= all(d <= 0.05 for d in gd)

    # 3. seed determinism at rate 0.5
    def fwd(seed):
        return fused_attention_btd_train(
            q, k, v, num_heads=H, dropout_rate=0.5, seed=seed, causal=False,
            softmax_f32=True,
        )

    o1, o2 = fwd(SEED), fwd(SEED)
    o3 = fwd(jnp.array([4, 9], jnp.int32))
    same = float(jnp.abs(o1 - o2).max())
    diff = float(jnp.abs(o1 - o3).max())
    results["determinism"] = {"same_seed_max_delta": same,
                              "other_seed_max_delta": diff}
    ok &= same == 0.0 and diff > 1e-3

    # 4. keep fraction: uniform attention (q=k=0, non-causal) makes every
    # pre-dropout weight 1/T; v = all-ones so out[b,t,d] =
    # (#kept in row) * (1/T) * (1/(1-rate)). Mean over everything -> keep
    # fraction estimate on B*H*T*T Bernoulli draws per head-column block.
    rate = 0.25
    zq = jnp.zeros((B, T, D), jnp.float32)
    ones_v = jnp.ones((B, T, D), jnp.float32)
    out = fused_attention_btd_train(
        zq, zq, ones_v, num_heads=H, dropout_rate=rate, seed=SEED,
        causal=False, softmax_f32=True,
    )
    keep_frac = float(out.mean()) * (1.0 - rate)
    # per-(b,t,head) rows are T-draw binomials; the global mean averages
    # B*T*H*T draws -> sigma = sqrt(p(1-p)/(B*H*T*T)) ~ 0.0027; allow 5 sigma
    sigma = float(np.sqrt(rate * (1 - rate) / (B * H * T * T)))
    results["keep_fraction"] = {"measured": keep_frac, "expected": 1 - rate,
                                "tol_5sigma": 5 * sigma}
    ok &= abs(keep_frac - (1 - rate)) <= 5 * sigma

    # 5. adjoint consistency at rate 0.5: out is linear in v (fixed q,k,
    # seed), so <do, f(v+dv)-f(v)> == <dv, grad_v loss> iff the backward
    # reproduces the forward's mask exactly.
    dv = jax.random.normal(jax.random.fold_in(keys[3], 1), (B, T, D),
                           jnp.float32)

    def loss_v(vv):
        out = fused_attention_btd_train(
            q, k, vv, num_heads=H, dropout_rate=0.5, seed=SEED, causal=True,
            softmax_f32=True,
        )
        return jnp.sum(out * do)

    lin = float(loss_v(v + dv) - loss_v(v))
    adj = float(jnp.sum(dv * jax.grad(loss_v)(v)))
    rel = abs(lin - adj) / max(abs(lin), 1e-9)
    # default-precision rounding; a mismatched mask at rate .5 would put
    # ~half the Wd entries on one side only -> rel_err O(0.5)
    results["adjoint_consistency"] = {"directional_delta": lin,
                                      "vjp_inner_product": adj,
                                      "rel_err": rel,
                                      "tol_default_prec": 0.02}
    ok &= rel <= 0.02

    # 6. EXACT fwd/bwd mask identity. q=k=0, non-causal, T=32, rate .5:
    # surviving weights are exactly (1/32)*2 = 0.0625 in f32 (softmax of
    # zeros over a power-of-two length, exact keep-rescale by 2.0), and
    # one-hot matmul probes move them around with no rounding.
    rate2 = 0.5
    eye_T = jnp.eye(T, dtype=jnp.float32)

    def fwd_probe(j):
        # v rows are e_j -> out[b, t, d] = Wd[b, head(d), t, j]
        vv = jnp.broadcast_to(eye_T[j][None, :, None], (B, T, D))
        return fused_attention_btd_train(
            zq, zq, vv, num_heads=H, dropout_rate=rate2, seed=SEED,
            causal=False, softmax_f32=True,
        )

    def bwd_probe(i):
        # do rows are e_i -> dv[b, k, d] = Wd[b, head(d), i, k]
        dd = jnp.broadcast_to(eye_T[i][None, :, None], (B, T, D))

        def loss(vv):
            out = fused_attention_btd_train(
                zq, zq, vv, num_heads=H, dropout_rate=rate2, seed=SEED,
                causal=False, softmax_f32=True,
            )
            return jnp.sum(out * dd)

        return jax.grad(loss)(jnp.zeros((B, T, D), jnp.float32))

    # both probes reconstruct Wd[b, head(d), t, k] laid out as [B, t, k, D]
    w_fwd = np.stack([np.asarray(fwd_probe(j)) for j in range(T)], axis=1)
    w_fwd = np.swapaxes(w_fwd, 1, 2)          # [B, j, t, D] -> [B, t, j, D]
    w_bwd = np.stack([np.asarray(bwd_probe(i)) for i in range(T)], axis=0)
    w_bwd = np.moveaxis(w_bwd, 1, 0)          # [i, B, k, D] -> [B, i, k, D]
    exact_equal = bool((w_fwd == w_bwd).all())
    vals = np.unique(w_fwd)
    vals_exact = bool(np.isin(vals, [0.0, np.float32(0.0625)]).all())
    results["mask_identity"] = {
        "fwd_bwd_bit_equal": exact_equal,
        "weight_values_exact": vals_exact,
        "unique_values": [float(x) for x in vals[:4]],
        "kept_fraction": float((w_fwd != 0).mean()),
    }
    ok &= exact_equal and vals_exact

    # 7. flagship-train-shape adjoint consistency (B=64, T=150, D=512,
    # H=4, bf16 inputs, bf16 softmax — the shipped training config). This
    # is the shape where independently-resolved block batches would grid
    # the forward (bb=8) and backward (bb=4) differently and the
    # program_id-seeded PRNG would give them DIFFERENT dropout masks
    # (rel_err ~0.5); the fix resolves bb once for the pair. bf16 matmul
    # rounding bounds an honest pass at ~1e-2.
    from regennet_tpu.ops.pallas_attention import _train_block_batch

    Bf, Tf, Df, Hf = 64, 150, 512, 4
    fkeys = jax.random.split(jax.random.PRNGKey(2), 5)
    qf, kf, vf, dof, dvf = [
        jax.random.normal(kk, (Bf, Tf, Df), jnp.float32).astype(jnp.bfloat16)
        for kk in fkeys
    ]

    def loss_f(vv):
        out = fused_attention_btd_train(
            qf, kf, vv, num_heads=Hf, dropout_rate=0.5, seed=SEED,
            causal=True, softmax_f32=False,
        )
        return jnp.sum(out.astype(jnp.float32) * dof.astype(jnp.float32))

    lin_f = float(loss_f(vf + dvf) - loss_f(vf))
    adj_f = float(jnp.sum(dvf.astype(jnp.float32)
                          * jax.grad(loss_f)(vf).astype(jnp.float32)))
    rel_f = abs(lin_f - adj_f) / max(abs(lin_f), 1e-9)
    results["flagship_adjoint"] = {
        "shape": [Bf, Tf, Df, Hf], "dtype": "bfloat16",
        "bb_fwd_if_resolved_alone": _train_block_batch(Bf, Tf, Df, 2, 2, 2, 4),
        "bb_bwd_if_resolved_alone": _train_block_batch(Bf, Tf, Df, 2, 2, 2, 7),
        "bb_shared": _train_block_batch(Bf, Tf, Df, 2, 2, 2, 7),
        "directional_delta": lin_f, "vjp_inner_product": adj_f,
        "rel_err": rel_f, "tol_bf16": 0.05,
    }
    ok &= rel_f <= 0.05

    results["ok"] = bool(ok)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "tpu_kernel_check_r3.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1), file=sys.stderr)
    print(f"wrote {out_path}; ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
