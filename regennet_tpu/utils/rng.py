"""PRNG selection for sampling noise.

JAX's default threefry2x32 generator costs 0.39 ms per sampler step at the
flagship shape (split + normal of [128,56,6,150]); the hardware-friendly
'rbg' implementation (threefry splits, XLA RngBitGenerator bits) costs
0.14 ms — ~4% of the whole DDPM step for an identically-distributed
i.i.d. N(0,1) stream. Sampling AND training entry points therefore build
their keys here: default impl 'rbg', override with REGENNET_PRNG_IMPL
(e.g. =threefry2x32 for the portable JAX default stream).

Training uses it for the dropout/cond-mask/noise streams — measured
~38 ms/step of the flagship training step was threefry dropout-mask
bits (8 layers x 4 dropouts incl. the [B,H,T,T] attention weights);
the masks are identically-distributed Bernoulli either way.
"""

from __future__ import annotations

import os

import jax


def sampling_key(seed: int) -> jax.Array:
    impl = os.environ.get("REGENNET_PRNG_IMPL", "rbg")
    if impl in ("default", "threefry", "threefry2x32"):
        return jax.random.PRNGKey(int(seed))
    return jax.random.key(int(seed), impl=impl)


# same selection; named for the call site
training_key = sampling_key
