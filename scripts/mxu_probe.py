"""Deliverable-MXU-rate probe: chained matmuls at several widths —
`python scripts/mxu_probe.py` (on the TPU).

Methodology (docs/PERF.md "Deliverable MXU rate context"): a single
dispatched matmul under-reports the sustained rate (dispatch-bound via the
remote relay); chaining 8-32 matmuls inside one jitted program and syncing
with a device-reduced scalar measures what the MXU actually sustains.
Width matters: K=512 chains cap near 49 TF/s on v5e while K=8192 reaches
~164 TF/s — the flagship model's width is the binding constraint.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_probe(m, k, n, depth=16, iters=10):
    a = jnp.ones((m, k), jnp.bfloat16)
    bs = [jnp.ones((k, n), jnp.bfloat16) for _ in range(depth)]

    @jax.jit
    def chain(a, bs):
        x = a
        for b in bs:
            x = x @ b
        return x

    out = chain(a, bs)
    float(out.mean())  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(a, bs)
    float(out.mean())
    dt = (time.perf_counter() - t0) / iters
    tf = depth * 2 * m * k * n / dt / 1e12
    print(f"[{m}x{k}x{n}]x{depth}: {dt * 1e3:.2f} ms -> {tf:.1f} TF/s",
          flush=True)
    return tf


if __name__ == "__main__":
    chain_probe(19200, 512, 512, depth=32)    # flagship width
    chain_probe(19200, 1024, 1024, depth=16)
    chain_probe(19200, 2048, 2048, depth=8)
    chain_probe(8192, 8192, 8192, depth=8)    # wide-K ceiling
