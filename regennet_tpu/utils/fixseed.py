"""Seed fixing for reproducibility (reference: utils/fixseed.py:6-10).

JAX randomness is explicit-key based, so this seeds only the host-side RNGs
(frame sampling, shuffling, eval protocol) and returns a root jax key for the
caller to thread.
"""

import random

import numpy as np


def fixseed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
