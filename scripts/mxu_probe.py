"""Deliverable-MXU-rate probe — `python scripts/mxu_probe.py` (on the TPU).
Writes `docs/mxu_probe_r3.json` and a table to stderr.

Round-3 rewrite. The round-1 version chained square [M,K]x[K,K] matmuls and
measured 49 TF/s at K=512, then "blended" that into a ~94 TF/s forward-pass
ceiling — contradicting the end-to-end measurement (710 GFLOP/step at
5.13 ms/step = 138 TF/s, hand-verified in scripts/flops_handcount.py).
The blend was wrong in two ways:

1. A square K=512 chain is NOT the model's workload. The model's dense
   matmuls are wider on N (qkv three [512->512] that XLA can schedule
   together, FF [512->1024] and [1024->512]) and are interleaved with
   elementwise work XLA fuses into them, which hides HBM latency.
2. The square-chain number is a lower bound set by HBM streaming of the
   dependent activation (39.7 MB traffic per 10 GFLOP matmul), not an MXU
   rate ceiling.

This probe therefore measures (a) the square chains (continuity with the
old table, now annotated with their roofline bounds) and (b) a
*model-shaped* layer chain — qkv/out/FF matmuls with gelu and residual
adds, the exact per-layer matmul diet of the flagship CMDM at B=128
T=150 — whose sustained TF/s is directly comparable to the end-to-end
138 TF/s figure.

v5e (TPU v5 lite) peaks used for roofline annotation: 197 TF/s bf16,
819 GB/s HBM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK_TF = 197.0
HBM_GBPS = 819.0

RESULTS = []


def _measure(fn, args, flops, label, iters=20):
    out = fn(*args)
    float(out.mean())  # warm + real sync (relay-safe scalar fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out.mean())
    dt = (time.perf_counter() - t0) / iters
    tf = flops / dt / 1e12
    return dt, tf


def square_chain(m, k, depth, iters=20):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16) * 0.02
    bs = [
        jax.random.normal(jax.random.fold_in(key, i), (k, k), jnp.bfloat16)
        * 0.02
        for i in range(depth)
    ]

    @jax.jit
    def chain(a, bs):
        x = a
        for b in bs:
            x = x @ b
        return x

    flops = depth * 2 * m * k * k
    # per-matmul HBM traffic if nothing fuses: act in + weight + act out
    bytes_ = depth * 2 * (m * k + k * k + m * k)
    dt, tf = _measure(chain, (a, bs), flops, f"square{k}", iters)
    roof_tf = min(PEAK_TF, flops / (bytes_ / (HBM_GBPS * 1e9)) / 1e12)
    row = {
        "probe": f"[{m}x{k}]x[{k}x{k}] chain depth {depth}",
        "ms": dt * 1e3, "tf_s": tf, "roofline_tf_s": roof_tf,
    }
    RESULTS.append(row)
    print(f"{row['probe']}: {dt*1e3:.2f} ms -> {tf:.1f} TF/s "
          f"(roofline bound {roof_tf:.0f})", file=sys.stderr, flush=True)
    return tf


def model_shaped_chain(b=128, t=150, d=512, ff=1024, layers=8, iters=20):
    """The flagship layer's dense-matmul diet (qkv, out, FF pair) with the
    gelu + residual elementwise XLA fuses in practice. Attention score/AV
    einsums and softmax are OMITTED (they are 7% of layer FLOPs and run in
    the Pallas kernel); the sustained rate here bounds what the dense 93%
    can deliver."""
    m = b * t
    key = jax.random.PRNGKey(1)

    def w(i, ki, ni):
        return jax.random.normal(
            jax.random.fold_in(key, i), (ki, ni), jnp.bfloat16
        ) * (1.0 / ki) ** 0.5

    ws = []
    for i in range(layers):
        ws.append({
            "qkv": w(4 * i, d, 3 * d),
            "out": w(4 * i + 1, d, d),
            "ff1": w(4 * i + 2, d, ff),
            "ff2": w(4 * i + 3, ff, d),
        })
    x0 = jax.random.normal(key, (m, d), jnp.bfloat16)

    @jax.jit
    def chain(x, ws):
        for lw in ws:
            qkv = x @ lw["qkv"]
            # stand-in for attention output: average the q/k/v thirds (keeps
            # the dependency real without the T x T einsums)
            attn = (qkv[:, :d] + qkv[:, d:2 * d] + qkv[:, 2 * d:]) / 3
            x = x + attn @ lw["out"]
            h = jax.nn.gelu(x @ lw["ff1"], approximate=True)
            x = x + h @ lw["ff2"]
        return x

    flops = layers * 2 * m * (d * 3 * d + d * d + d * ff + ff * d)
    dt, tf = _measure(chain, (x0, ws), flops, "model-shaped", iters)
    row = {
        "probe": f"model-shaped layer chain x{layers} "
                 f"(qkv+out+FF at B{b} T{t} D{d} ff{ff})",
        "ms": dt * 1e3, "tf_s": tf, "roofline_tf_s": PEAK_TF,
        "gflop": flops / 1e9,
    }
    RESULTS.append(row)
    print(f"{row['probe']}: {dt*1e3:.2f} ms -> {tf:.1f} TF/s",
          file=sys.stderr, flush=True)
    return tf


def ff_pair_chain(m=19200, d=512, ff=1024, depth=16, iters=20):
    key = jax.random.PRNGKey(2)
    w1s = [jax.random.normal(jax.random.fold_in(key, 2 * i), (d, ff),
                             jnp.bfloat16) * 0.04 for i in range(depth)]
    w2s = [jax.random.normal(jax.random.fold_in(key, 2 * i + 1), (ff, d),
                             jnp.bfloat16) * 0.03 for i in range(depth)]
    x0 = jax.random.normal(key, (m, d), jnp.bfloat16)

    @jax.jit
    def chain(x, w1s, w2s):
        for w1, w2 in zip(w1s, w2s):
            x = jax.nn.gelu(x @ w1, approximate=True) @ w2
        return x

    flops = depth * 2 * m * (d * ff + ff * d)
    dt, tf = _measure(chain, (x0, w1s, w2s), flops, "ff-pair", iters)
    row = {"probe": f"gelu-FF pair [{m}] {d}->{ff}->{d} chain depth {depth}",
           "ms": dt * 1e3, "tf_s": tf, "roofline_tf_s": PEAK_TF}
    RESULTS.append(row)
    print(f"{row['probe']}: {dt*1e3:.2f} ms -> {tf:.1f} TF/s",
          file=sys.stderr, flush=True)
    return tf


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model_shaped_chain()
    ff_pair_chain()
    square_chain(19200, 512, depth=32)
    square_chain(19200, 1024, depth=16)
    square_chain(19200, 2048, depth=8)
    square_chain(8192, 8192, depth=8)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "mxu_probe_r3.json",
    )
    with open(out_path, "w") as f:
        json.dump({"peak_tf_bf16": PEAK_TF, "hbm_gbps": HBM_GBPS,
                   "rows": RESULTS}, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)
    print(json.dumps(RESULTS))
